package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.FplPipeline

/** Drives the full reference DAG twice (initial load + incremental
  * re-run with changed rows) and checks upsert convergence + quality
  * probes — the reference's test_includes.py semantics.
  */
class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  private def payload(form: Double): String =
    s"""{"elements":[
       |  {"id":1,"first_name":"Mo","second_name":"Salah","form":$form,"total_points":200,"now_cost":12.9,"team":3,"element_type":3},
       |  {"id":2,"first_name":"Al","second_name":"B","form":3.0,"total_points":50,"now_cost":4.4,"team":3,"element_type":1}],
       | "teams":[{"id":3,"name":"Reds","short_name":"RED","strength_attack_home":5,"strength_defence_home":4,"strength_attack_away":5,"strength_defence_away":3,"code":14}],
       | "events":[{"id":1,"name":"GW1","average_entry_score":57,"finished":true,"data_checked":true}]}"""
      .stripMargin.replace("\n", "")

  test("pipeline run is idempotent and re-runs upsert changed rows") {
    val root = Files.createTempDirectory("graft_pipe").toFile.getAbsolutePath
    val lake = FplPipeline.LakePaths(s"$root/lake")
    val in1 = s"$root/in1"; val in2 = s"$root/in2"
    Files.createDirectories(java.nio.file.Path.of(in1))
    Files.createDirectories(java.nio.file.Path.of(in2))
    Files.writeString(java.nio.file.Path.of(in1, "p.json"), payload(7.5))
    Files.writeString(java.nio.file.Path.of(in2, "p.json"), payload(9.9))

    val first = FplPipeline.run(spark, in1, lake)
    assert(first("entity_dim").count() == 2)

    // re-run with updated form: same row count, new value wins
    val second = FplPipeline.run(spark, in2, lake)
    val salah = second("entity_dim")
      .filter(org.apache.spark.sql.functions.col("surname") === "Salah")
      .collect()
    assert(salah.length == 1, "upsert must not duplicate on re-run")
    assert(salah(0).getAs[Double]("form") == 9.9)

    // reference data tests: point lookup + referential integrity
    val checks = FplPipeline.qualityChecks(second("entity_dim"), second("parent_dim"))
    assert(checks("entity_rows") == 2)
    assert(checks("entities_without_parent") == 0)
  }

  private def singlePayload: String =
    s"""{"elements":[
       |  {"id":1,"first_name":"Mo","second_name":"Salah","form":9.9,"total_points":201,"now_cost":12.9,"team":3,"element_type":3}],
       | "teams":[],"events":[]}"""
      .stripMargin.replace("\n", "")

  test("merge rewrites only the partitions containing batch keys") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft_pipe_part").toFile.getAbsolutePath
    val lake = FplPipeline.LakePaths(s"$root/lake")
    val in1 = s"$root/in1"; val in2 = s"$root/in2"
    Files.createDirectories(java.nio.file.Path.of(in1))
    Files.createDirectories(java.nio.file.Path.of(in2))
    Files.writeString(java.nio.file.Path.of(in1, "p.json"), payload(7.5))
    Files.writeString(java.nio.file.Path.of(in2, "p.json"), singlePayload)

    FplPipeline.run(spark, in1, lake)

    def partFiles(): Map[String, Long] = {
      val base = java.nio.file.Path.of(lake.entityDim)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> p.toFile.lastModified()).toMap
    }
    val before = partFiles()

    // a batch touching only key id=1
    FplPipeline.run(spark, in2, lake, insertParents = false, insertPeriods = false)
    val after = partFiles()

    // which hash partition each key lives in
    val pOf = spark.range(1, 3)
      .select(col("id"), pmod(hash(col("id")), lit(FplPipeline.NumPartitions)).as("p"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(pOf(1L) != pOf(2L),
      "test requires ids 1 and 2 to hash to different partitions")

    val untouched = s"__p=${pOf(2L)}/"
    assert(before.keys.exists(_.contains(untouched)), "id=2 partition must exist")
    assert(before.filter(_._1.contains(untouched)) == after.filter(_._1.contains(untouched)),
      "partition without batch keys must keep its exact files (no rewrite)")
    val touched = s"__p=${pOf(1L)}/"
    assert(before.keys.filter(_.contains(touched)) != after.keys.filter(_.contains(touched)),
      "partition with the batch key must have been rewritten")

    // and the merge semantics held: still 2 rows, id=1 updated
    val dim = spark.read.parquet(lake.entityDim)
    assert(dim.count() == 2)
    assert(dim.filter(col("id") === 1).head.getAs[Double]("form") == 9.9)
    assert(dim.filter(col("id") === 2).count() == 1)
  }

  test("corpus pipeline: composed invariants hold end-to-end") {
    val out = graft.queries.TextQueries.corpusPipeline(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.nonEmpty, "pipeline must admit a non-trivial corpus")
    val ids = out.map(_._1).toSet
    assert(out.forall { case (_, _, s) => s >= 0 && s <= 2 })
    assert(ids.forall(_ % 10 != 0), "eval docs never enter the corpus")

    // deterministic end to end
    val again = graft.queries.TextQueries.corpusPipeline(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(again.toSeq == out.toSeq)

    // driver-side reference shingle/gram sets for the corpus + bench
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String, n: Int): Set[String] = {
      val toks = t.trim.split("\\s+")
      toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    }
    // no exact duplicates survive
    assert(ids.toSeq.map(texts).distinct.size == ids.size,
      "exact duplicates survived the pipeline")
    // no surviving near-dup pair at the 0.8 bar
    val sh = ids.map(i => i -> grams(texts(i), 3)).toMap
    for (a <- ids; b <- ids if a < b) {
      val u = (sh(a) union sh(b)).size
      val j = if (u == 0) 0.0 else (sh(a) intersect sh(b)).size.toDouble / u
      assert(j < 0.8, s"near-dup pair ($a, $b) j=$j survived")
    }
    // no eval 8-gram leaks into the corpus
    val benchGrams = texts.keys.filter(_ % 10 == 0)
      .flatMap(b => grams(texts(b), 8)).toSet
    ids.foreach { i =>
      assert((grams(texts(i), 8) intersect benchGrams).isEmpty,
        s"doc $i shares an 8-gram with the eval set")
    }
  }

  test("corpus pipeline: optional span-removal and quota stages compose") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val bench = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val out = graft.pipeline.CorpusPipeline.run(corpus, bench, "text", "doc_id",
      graft.pipeline.CorpusPipeline.Config(
        stripSpans = Some((4, 2L)), quotaPerStratum = Some(("source", 3))))
    val rows = out.select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.nonEmpty, "composed pipeline must still admit docs")
    // quota honored per source
    rows.groupBy(_._2).foreach { case (src, ds) =>
      assert(ds.length <= 3, s"source $src exceeds its quota: ${ds.length}")
    }
    // survivors' texts are exactly the span-stripped rewrites of the
    // originals (stripping ran BEFORE every later stage) — checked
    // against a driver-side reference of the removal semantics
    val orig = corpus.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    val counts = orig.values
      .flatMap(_.sliding(4).filter(_.length == 4).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size).toMap
    val hot = counts.collect { case (g, c) if c >= 2 => g }.toSet
    val outText = out.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    outText.foreach { case (id, t) =>
      val tk = orig(id)
      val covered = tk.sliding(4).zipWithIndex
        .collect { case (w, i) if w.length == 4 && hot(w.mkString(" ")) =>
          i until i + 4 }
        .flatten.toSet
      val want = tk.zipWithIndex.collect { case (x, i) if !covered(i) => x }
        .mkString(" ")
      assert(t == want, s"doc $id text is not the span-stripped rewrite")
    }
  }
}
