package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Hot-band skew behavior, pinned with a planted-skew corpus (VERDICT
  * r3 item 2). Boilerplate text — the classic web-crawl pathology —
  * makes every copy collide in the same LSH band bucket, so the band
  * self-join's shuffle gets one partition far larger than the rest.
  * SURVEY §4 claims two defenses; both are asserted here on real runs:
  *
  *  - D2/D3 band joins: AQE's skew-join optimization splits the hot
  *    bucket's partition across tasks (plan shows the skew markers);
  *  - D17 inverted index: the posting cap drops shingles hotter than
  *    `maxPostingLen` before any pair is formed, bounding candidate
  *    volume at Σ min(freq, cap)² instead of the boilerplate's freq².
  */
class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  private def withConfs[A](kv: (String, String)*)(f: => A): A = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally olds.foreach { case (k, o) =>
      o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: children.flatMap(flatten)
  }

  private def executedPlanString(df: DataFrame): String =
    flatten(df.queryExecution.executedPlan).map(_.toString.linesIterator
      .next()).mkString("\n")

  /** `nUnique` docs of 30 globally-unique tokens each, plus `nBoiler`
    * verbatim copies of one boilerplate page — every copy lands in the
    * same band bucket of every band (identical signature): a planted
    * 100×-hot key. */
  private def corpus(nUnique: Int, nBoiler: Int): DataFrame = {
    val unique = spark.range(nUnique).select(col("id"),
      array_join(transform(sequence(lit(1), lit(30)),
        i => concat(lit("w"), col("id") * 100 + i)), " ").as("text"))
    val boiler = spark.range(nUnique, nUnique.toLong + nBoiler).select(
      col("id"),
      lit("common boilerplate disclaimer text that every scraped page " +
        "carries verbatim across the whole crawl the copies are byte " +
        "identical and collide in every single minhash band").as("text"))
    unique.unionAll(boiler)
  }

  test("AQE splits the hot band bucket in the minhash-LSH self-join") {
    // thresholds lowered so local-scale data triggers the same skew
    // machinery a 100 TB run relies on; broadcast disabled so the band
    // join is the shuffled join AQE's skew optimizer targets
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256") {
      val df = Dedup.minhashLsh(corpus(1000, 400), "text", "id")
      val pairs = df.collect().length // materialize THIS plan (AQE finalizes)
      // the boilerplate clique is fully found (jaccard 1.0 pairs)…
      assert(pairs >= 400L * 399 / 2, s"clique pairs missing: $pairs")
      // …and the plan shows AQE actually split a skewed partition
      val p = executedPlanString(df)
      assert(p.contains("skew=true")
          || p.linesIterator.exists(l =>
            l.contains("AQEShuffleRead") && l.contains("skewed")),
        s"no skew-split marker in the executed plan:\n$p")
    }
  }

  test("skew_salted_join face equals its unsalted twin row-for-row") {
    import graft.functions.Num.dec2
    val dir = "/root/testdata/sf0.001"
    val face = graft.queries.WarehouseQueries.skewSaltedJoin(spark, dir)
      .collect()
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), dec2(col("value")).as("__v"))
    val dim = ev.groupBy(col("event_type"))
      .agg(sum(col("__v")).as("__tot"), count(lit(1)).as("__n"))
    val twin = ev.join(dim, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__v") * col("__n") > col("__tot"), 1L).otherwise(0L))
          .as("n_above"))
      .select(col("event_type"), col("n_events"), col("n_above"),
        round(col("n_above").cast("double") / col("n_events").cast("double"), 6)
          .as("frac_above"))
      .orderBy(col("event_type"))
      .collect()
    assert(face.toSeq == twin.toSeq)
    assert(face.nonEmpty)
  }

  test("posting cap bounds the inverted-index candidate volume on boilerplate") {
    // 12 true near-dup pairs (unique 30-token docs, one token edited)
    // hidden among 200 verbatim boilerplate copies
    val truePairs = 12
    val base = spark.range(truePairs).select(col("id"),
      array_join(transform(sequence(lit(1), lit(30)),
        i => concat(lit("u"), col("id") * 100 + i)), " ").as("text"))
    val edited = base.select((col("id") + 100000).as("id"),
      concat(expr("substring(text, 1, length(text) - 1)"), lit("X")).as("text"))
    val boiler = spark.range(200000, 200200).select(col("id"),
      lit("verbatim boilerplate page shared by two hundred crawled " +
        "copies of the same template with no unique content").as("text"))
    val docs = base.unionAll(edited).unionAll(boiler)

    val capped = Dedup.similarityJoinEdges(docs, "text", "id",
      maxPostingLen = 50).collect()
    // every true pair survives (their shingles have frequency 2 ≤ cap)
    assert(capped.length == truePairs,
      s"expected exactly the $truePairs planted pairs, got ${capped.length}")
    assert(capped.forall(r => r.getLong(1) == r.getLong(0) + 100000))

    // without the cap the boilerplate posting explodes into the full
    // clique: C(200,2) extra candidate pairs — the volume the cap
    // exists to refuse
    val uncapped = Dedup.similarityJoinEdges(docs, "text", "id",
      maxPostingLen = 1000000).count()
    assert(uncapped == truePairs + 200L * 199 / 2,
      s"uncapped run should surface the boilerplate clique: $uncapped")
  }
}
