package graft

import java.nio.file.Files
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
}
