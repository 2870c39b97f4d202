package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Bucketed-table co-location (SURVEY §4): persisting both sides
  * bucketed on the join key lets Spark plan the join with ZERO
  * exchanges — the pre-shuffle that makes repeated fact-fact joins
  * affordable at 100 TB.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("IVF-partitioned lake: search prunes to the probed lists' files, same results") {
    import org.apache.spark.sql.functions.col
    val c = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    // 2 queries at nprobe=1 probe at most 2 of the 8 lists — few enough
    // that pruning is observable on this small corpus
    val q = graft.sources.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cent = graft.operators.IvfIndex.train(c, "vec", "id", k = 8, dim = 64)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_lake")
      .toFile.getAbsolutePath + "/emb"
    graft.operators.IvfIndex.writePartitioned(c, cent, path)

    val got = graft.operators.IvfIndex
      .searchPartitioned(spark, path, q, 10, cent, nprobe = 1)
    val want = graft.operators.IvfIndex.search(q, c, 10, cent, nprobe = 1)
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      == want.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet)

    // directory-level pruning: the lake scan node carries a partition
    // filter on cid restricted to the probed lists (Spark applies
    // partition filters at file listing — unprobed lists' directories
    // are never opened). AQE nests stages, so match on the tree string.
    val plan = got.queryExecution.executedPlan.toString
    val scanLine = plan.split("\n").find(l =>
      l.contains("graft_ivf_lake") && l.contains("FileScan"))
    assert(scanLine.isDefined, s"no lake scan in plan:\n$plan")
    assert(scanLine.get.contains("PartitionFilters: [cid"),
      s"lake scan has no cid partition filter:\n${scanLine.get}")
    // 2 queries at nprobe=1 → at most 2 of the 8 lists in the IN-list
    val inList = "cid#\\d+ IN \\(([^)]*)\\)".r
      .findFirstMatchIn(scanLine.get).map(_.group(1))
    assert(inList.isDefined, s"no IN-list partition filter:\n${scanLine.get}")
    assert(inList.get.split(",").length < 8,
      s"expected a pruned list subset, got IN (${inList.get})")
  }

  test("IVF append: incremental batches land in frozen-codebook lists; search equals the union corpus") {
    import org.apache.spark.sql.functions.col
    val all = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val base = all.filter(col("id") % 3 =!= 0)
    val batch = all.filter(col("id") % 3 === 0)
    val q = all.filter(col("id") < 3)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    // codebook trains ONCE on the base corpus and stays frozen
    val cent = graft.operators.IvfIndex.train(base, "vec", "id", k = 8, dim = 64)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_append")
      .toFile.getAbsolutePath + "/emb"
    graft.operators.IvfIndex.writePartitioned(base, cent, path)
    graft.operators.IvfIndex.appendPartitioned(batch, cent, path)
    // the grown lake answers exactly like a search over the union
    // corpus with the same centroids — assignment is pure per-row
    val got = graft.operators.IvfIndex
      .searchPartitioned(spark, path, q, 10, cent, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val want = graft.operators.IvfIndex
      .search(q, all, 10, cent, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == want, "append must be invisible to search semantics")
    // appended rows really live in their assigned lists: every cid
    // directory holding a batch row existed in the assignment, and no
    // resident file was rewritten (append-only: base file count grows)
    val asg = graft.operators.IvfIndex.assign(batch, "vec", cent)
      .select(col("cid")).distinct()
      .collect().map(_.getInt(0)).toSet
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid="))
      .map(_.getName.stripPrefix("cid=").toInt).toSet
    assert(asg.subsetOf(dirs), s"batch cids $asg missing from lake dirs $dirs")
  }

  test("IVF codebook round-trips through the lake and reproduces searches") {
    val c = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = graft.sources.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val trained = graft.operators.IvfIndex.train(c, "vec", "id", k = 8, dim = 64)
    val path = java.nio.file.Files.createTempDirectory("graft_codebook")
      .toFile.getAbsolutePath + "/cb"

    graft.operators.IvfIndex.saveCodebook(spark, trained, path)
    val loaded = graft.operators.IvfIndex.loadCodebook(spark, path)
    assert(loaded.length == trained.length &&
      loaded.zip(trained).forall { case (a, b) => a.sameElements(b) },
      "codebook floats must round-trip bit-exactly through parquet")

    // restart-safe face: the artifact exists, so trainOrLoad must NOT
    // retrain — it returns the stored centroids even though we hand it
    // a corpus that would train differently
    val fromLake = graft.operators.IvfIndex.trainOrLoad(
      spark, path, c.limit(10), "vec", "id", k = 8, dim = 64)
    assert(fromLake.zip(trained).forall { case (a, b) => a.sameElements(b) },
      "trainOrLoad must load the stored codebook, not retrain")

    val want = graft.operators.IvfIndex.search(q, c, 5, trained, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    val got = graft.operators.IvfIndex.search(q, c, 5, loaded, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    assert(want.nonEmpty && got == want,
      "a loaded codebook must reproduce the training session's searches")
  }

  test("join of co-bucketed tables plans without any Exchange") {
    // warehouse dir is a static conf — tables land in ./spark-warehouse
    // (gitignored); managed-table DROP removes the data in finally
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt")
    spark.sql("USE graft_bkt")
    try {
      Tables.orders(spark, sfDir)
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_bkt")
      Tables.lineitem(spark, sfDir)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("lineitem_bkt")

      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"), Seq("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 0,
        s"co-bucketed join should shuffle nothing, found $exchanges exchanges:\n$p")

      // same join on raw parquet DOES shuffle — the bucketing is what
      // removed it, not plan size
      val raw = Tables.lineitem(spark, sfDir)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(Tables.orders(spark, sfDir), Seq("o_orderkey"))
        .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")))
      raw.collect()
      val rawPlan = raw.queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange hashpartitioning")
        || rawPlan.contains("BroadcastExchange"),
        s"control join unexpectedly shuffle-free:\n$rawPlan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("USE default")
    }
  }
}
