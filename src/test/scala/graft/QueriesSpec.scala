package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

/** Smoke + shape checks for every SparkEntry query at sf0.001. Value
  * correctness is driven by the DuckDB oracle (tools/check.py mirrors
  * the driver's gate); these specs catch compile/runtime/plan breakage
  * fast.
  */
class QueriesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has rows and a distinct, stable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
      assert(df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names")
    }
  }

  test("every oracle key exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  test("the four OracleSql parts are pairwise disjoint (no silent shadowing)") {
    val parts = Seq("A" -> OracleSqlA.sql, "B" -> OracleSqlB.sql,
      "C" -> OracleSqlC.sql, "D" -> OracleSqlD.sql)
    for (Seq((na, a), (nb, b)) <- parts.combinations(2)) {
      val overlap = a.keySet intersect b.keySet
      assert(overlap.isEmpty, s"oracle keys in both $na and $nb: $overlap")
    }
    assert(SparkEntry.oracleSql.size == parts.map(_._2.size).sum,
      "concatenated oracle map lost entries")
  }

  test("dashboard_detail: 15 rows, spend ordered desc") {
    val rows = ReferenceQueries_dashboard()
    assert(rows.length == 15)
    val spends = rows.map(_.getAs[Double]("total_spend"))
    assert(spends.zip(spends.tail).forall { case (a, b) => a >= b })
  }

  private def ReferenceQueries_dashboard() =
    graft.queries.ReferenceQueries.dashboardDetail(spark, sfDir).collect()

  test("join_quality reports zero orphans") {
    val n = graft.queries.ReferenceQueries.joinQuality(spark, sfDir)
      .collect()(0).getLong(0)
    assert(n == 0L)
  }

  test("upsert keepLatest leaves one row per key") {
    import org.apache.spark.sql.functions._
    val df = graft.queries.ReferenceQueries.upsertKeepLatest(spark, sfDir)
    val dup = df.groupBy(col("user_id"), col("event_type"))
      .count().filter(col("count") > 1).count()
    assert(dup == 0L)
  }

  test("corpus diff: statuses partition both snapshots, counts reconcile") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.ExtendedQueries.corpusDiff(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val byStatus = rows.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    assert(Set("added", "removed", "changed", "unchanged")
      .subsetOf(byStatus.keySet), s"got ${byStatus.keySet}")
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val oldIds = docs.filter(_ % 11 != 3).toSet
    val newIds = docs.filter(_ % 13 != 5).toSet
    assert(byStatus("added") == (newIds -- oldIds).size)
    assert(byStatus("removed") == (oldIds -- newIds).size)
    val common = oldIds intersect newIds
    assert(byStatus("changed") == common.count(_ % 5 == 0))
    assert(byStatus("unchanged") == common.count(_ % 5 != 0))
  }
}
