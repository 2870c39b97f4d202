package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CsvIngest, JsonIngest, LakeWriter, Tables}

/** End-to-end ingest specs against synthesized reference-shaped
  * payloads (the FPL bootstrap-static JSON and scraped-stats CSV of
  * fpl-data-pipeline includes.py).
  */
class IngestSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmpDir(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("json payload normalizes into entity/parent/period dims with code mapping") {
    val dir = tmpDir("graft_json")
    val payload =
      """{"elements":[
        |  {"id":1,"first_name":"Mo","second_name":"S","form":7.5,"total_points":200,"now_cost":12.9,"team":3,"element_type":3},
        |  {"id":2,"first_name":"Al","second_name":"B","form":3.0,"total_points":50,"now_cost":4.4,"team":1,"element_type":1}],
        | "teams":[{"id":3,"name":"Reds","short_name":"RED","strength_attack_home":5,"strength_defence_home":4,"strength_attack_away":5,"strength_defence_away":3,"code":14}],
        | "events":[{"id":1,"name":"GW1","average_entry_score":57,"finished":true,"data_checked":true},
        |           {"id":2,"name":"GW2","average_entry_score":61,"finished":false,"data_checked":false}]}"""
        .stripMargin.replace("\n", "")
    Files.writeString(java.nio.file.Path.of(dir, "payload.json"), payload)

    val p = JsonIngest.readPayload(spark, dir)
    val players = JsonIngest.entityDim(p).collect().sortBy(_.getLong(0))
    assert(players.length == 2)
    assert(players(0).getString(7) == "mid") // element_type 3 → mid
    assert(players(1).getString(7) == "gk")
    assert(JsonIngest.parentDim(p).head().getString(2) == "RED")
    assert(JsonIngest.periodDim(p).count() == 2)
  }

  test("csv ingest parses valid rows and quarantines malformed ones") {
    val dir = tmpDir("graft_csv")
    Files.writeString(java.nio.file.Path.of(dir, "stats.csv"),
      """row_idx,id,full_name,min_played,key_passes,assists,shots,xg,xa,match_id
        |0,101,A Player,90,3,1,4,0.61,0.33,18001
        |1,102,B Player,45,0,0,1,0.05,0.01,18001
        |2,bad,C Player,not_an_int,0,0,1,0.05,x,18002
        |""".stripMargin)
    // Spark refuses plans referencing ONLY the corrupt column (count()
    // prunes everything) — always project data columns alongside it.
    val all = CsvIngest.readStats(spark, dir)
      .select(col("row_idx"), col("id"), col("shots"), col("_corrupt"))
      .collect()
    assert(all.length == 3)
    assert(all.count(_.isNullAt(3)) == 2, "two clean rows")
    assert(all.count(r => !r.isNullAt(3)) == 1, "one quarantined row")
    val ok = CsvIngest.validStats(spark, dir)
    assert(ok.agg(sum(col("shots"))).head().getLong(0) == 5)
  }

  test("lake writer partitions by period and readers prune to one partition") {
    val out = tmpDir("graft_lake") + "/orders"
    LakeWriter.writeByPeriod(
      Tables.orders(spark, sfDir), "o_orderdate", out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("period=")).map(_.getName).sorted
    assert(dirs.length > 1, s"expected multiple period partitions, got ${dirs.toSeq}")
    // partition-pruned read matches a filtered full read
    val pruned = spark.read.parquet(out).filter(col("period") === dirs.head.stripPrefix("period="))
    val expect = Tables.orders(spark, sfDir)
      .filter(date_format(col("o_orderdate"), "yyyy-MM") === dirs.head.stripPrefix("period="))
    assert(pruned.count() == expect.count())
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(!planStr.toLowerCase.contains("filter") ||
      pruned.queryExecution.optimizedPlan.toString.contains("period"),
      "expected partition pruning on period")
  }

  test("ORC lake: round-trip fidelity, partition pruning, and predicate pushdown") {
    val out = tmpDir("graft_orc_spec") + "/docs"
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    graft.sources.OrcLake.write(docs, "lang", out)
    // fidelity: every row survives the ORC round-trip exactly
    val back = graft.sources.OrcLake.read(spark, out)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val want = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(back == want, "ORC round-trip must be lossless")
    // lang=… dirs exist and a lang filter prunes at the partition level
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
    assert(dirs.length > 1, s"expected lang partitions, got ${dirs.toSeq}")
    val pruned = graft.sources.OrcLake.read(spark, out)
      .filter(col("lang") === "en").select(col("doc_id"), col("n_chars"))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"lang filter must prune ORC partitions:\n$scan")
    // predicate pushdown reaches the ORC scan for data columns
    val pushed = graft.sources.OrcLake.read(spark, out)
      .filter(col("n_chars") > 100).select(col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]")
        || pushed.contains("GreaterThan(n_chars,100)"),
      s"n_chars predicate must push into the ORC scan:\n$pushed")
  }

  test("z-order clustering prunes files on BOTH dimensions, not just the sort prefix") {
    import graft.sources.ZOrder
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val zPath = tmpDir("graft_zorder") + "/z"
    val linPath = tmpDir("graft_zorder") + "/linear"
    ZOrder.writeClustered(ev, Seq("user_id", "value"), zPath, numFiles = 16)
    // the single-dimension baseline: range-sorted on user_id only
    ev.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(linPath)

    def filesTouched(path: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(cond)
        .select(input_file_name()).distinct().count()
    val zTotal = spark.read.parquet(zPath)
      .select(input_file_name()).distinct().count()
    assert(zTotal > 4, s"need enough files for pruning to be observable, got $zTotal")

    // clustering must be a pure reordering
    assert(spark.read.parquet(zPath).count() == ev.count())

    val byUser  = col("user_id") <= 3      // narrow range on dim 1
    val byValue = col("value") >= 250.0    // narrow range on dim 2
    val zU = filesTouched(zPath, byUser)
    val zV = filesTouched(zPath, byValue)
    assert(zU < zTotal, s"z-layout should prune on user_id: $zU/$zTotal files")
    assert(zV < zTotal, s"z-layout should prune on value: $zV/$zTotal files")
    // the linear layout concentrates user_id but scatters value; the
    // z layout must be at least as concentrated on the NON-sorted dim
    val lV = filesTouched(linPath, byValue)
    assert(zV <= lV,
      s"z-layout must cluster the second dimension at least as well ($zV vs $lV files)")
  }

  test("upsertWrite: batch rows win on key collision, others survive") {
    val base = tmpDir("graft_upsert") + "/base"
    val out = tmpDir("graft_upsert") + "/out"
    import spark.implicits._
    Seq((1L, "old"), (2L, "keep")).toDF("id", "v").write.parquet(base)
    LakeWriter.upsertWrite(base, Seq((1L, "new"), (3L, "add")).toDF("id", "v"),
      Seq("id"), out)
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "new", 2L -> "keep", 3L -> "add"))
  }

  test("snapshot lake: copy-on-write overwrites, time travel, rollback, vacuum") {
    import spark.implicits._
    import graft.sources.SnapshotLake
    val path = tmpDir("graft_snap") + "/t"
    def table(rows: (Long, String, String)*) =
      rows.toDF("id", "payload", "part")
    def slurp(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String)] =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"),
        r.getAs[String]("part"))).toSet

    // v1: three partitions
    val v1 = SnapshotLake.overwritePartitions(
      table((1L, "a1", "a"), (2L, "b1", "b"), (3L, "c1", "c")), path, "part")
    assert(v1 == 1)
    // v2: replace partition b only
    val v2 = SnapshotLake.overwritePartitions(
      table((20L, "b2", "b")), path, "part")
    assert(v2 == 2 && SnapshotLake.currentVersion(spark, path) == 2)

    // latest = new b + untouched a, c
    assert(slurp(SnapshotLake.read(spark, path)) ==
      Set((1L, "a1", "a"), (20L, "b2", "b"), (3L, "c1", "c")))
    // time travel: v1 intact
    assert(slurp(SnapshotLake.read(spark, path, Some(1))) ==
      Set((1L, "a1", "a"), (2L, "b1", "b"), (3L, "c1", "c")))

    // snapshot isolation: a plan built against v1 BEFORE further
    // commits still reads v1's files after them (copy-on-write)
    val planned = SnapshotLake.read(spark, path, Some(1))
    val v3 = SnapshotLake.overwritePartitions(
      table((30L, "c3", "c")), path, "part")
    assert(v3 == 3)
    assert(slurp(planned) ==
      Set((1L, "a1", "a"), (2L, "b1", "b"), (3L, "c1", "c")))

    // rollback: v1's content becomes the newest version, history kept
    val v4 = SnapshotLake.rollback(spark, path, 1)
    assert(v4 == 4)
    assert(slurp(SnapshotLake.read(spark, path)) ==
      slurp(SnapshotLake.read(spark, path, Some(1))))
    assert(slurp(SnapshotLake.read(spark, path, Some(3))) ==
      Set((1L, "a1", "a"), (20L, "b2", "b"), (30L, "c3", "c")))

    // vacuum keeping the last 2 versions (v3 content + v4=v1 content):
    // every commit dir is still referenced (c1 by v4, c2 by v3's b,
    // c3 by v3's c) — nothing breaks; then roll forward past c2/c3
    // and vacuum to 1: their dirs must go, latest must still read
    SnapshotLake.vacuum(spark, path, keepVersions = 2)
    assert(slurp(SnapshotLake.read(spark, path, Some(3))) ==
      Set((1L, "a1", "a"), (20L, "b2", "b"), (30L, "c3", "c")))
    SnapshotLake.vacuum(spark, path, keepVersions = 1)
    assert(slurp(SnapshotLake.read(spark, path)) ==
      Set((1L, "a1", "a"), (2L, "b1", "b"), (3L, "c1", "c")))
    val dirs = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(!dirs.exists(_.startsWith("c00002")) &&
        !dirs.exists(_.startsWith("c00003")),
      s"vacuum must drop unreferenced commit dirs: $dirs")
    assert(dirs.exists(_.startsWith("c00001")),
      "still-referenced dir must survive")
  }

  test("write-audit-publish: failed audit leaves history untouched, staged files gone") {
    import spark.implicits._
    import graft.sources.SnapshotLake
    import graft.operators.Expectations
    val path = tmpDir("graft_wap") + "/t"
    def table(rows: (Long, Option[String], String)*) =
      rows.toDF("id", "payload", "part")
    val rules = Seq(Expectations.notNull("payload"))

    // clean commit publishes
    val (r1, v1) = SnapshotLake.writeAuditPublish(
      table((1L, Some("a1"), "a"), (2L, Some("b1"), "b")), path, "part",
      rowRules = rules, uniqueCols = Seq("id"))
    assert(v1.contains(1))
    assert(r1.collect().forall(_.getBoolean(2)), "all rules pass")
    assert(SnapshotLake.read(spark, path).count() == 2)

    // dirty commit (null payload + duplicate id) is rejected:
    // no new version, no staged dir, latest read unchanged
    val (r2, v2) = SnapshotLake.writeAuditPublish(
      table((3L, None, "a"), (3L, Some("x"), "a")), path, "part",
      rowRules = rules, uniqueCols = Seq("id"))
    assert(v2.isEmpty, "audit must reject")
    val rep = r2.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(rep("not_null(payload)") == ((1L, false)))
    assert(rep("unique(id)") == ((1L, false)))
    assert(SnapshotLake.currentVersion(spark, path) == 1)
    assert(SnapshotLake.read(spark, path).count() == 2,
      "visible history untouched")
    val dirs = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(!dirs.exists(_.startsWith("c00002")),
      s"staged dir must be removed: $dirs")
    val stagingLeft = Option(new java.io.File(s"$path/_staging").listFiles())
      .map(_.length).getOrElse(0)
    assert(stagingLeft == 0, "rejected staging must be deleted")

    // and a later clean commit takes the next version as if the
    // rejected one never happened
    val (_, v3) = SnapshotLake.writeAuditPublish(
      table((4L, Some("c1"), "c")), path, "part", rowRules = rules)
    assert(v3.contains(2))
    assert(SnapshotLake.read(spark, path).count() == 3)

    // crash-orphan resilience: a staged dir whose writer died before
    // publish, and a renamed-but-unpublished commit dir, must block
    // NOTHING — the next commit publishes the next version cleanly
    new java.io.File(s"$path/_staging/sdeadbeef").mkdirs()
    new java.io.File(s"$path/c00003_sorphan").mkdirs()
    val (_, v4) = SnapshotLake.writeAuditPublish(
      table((5L, Some("d1"), "d")), path, "part", rowRules = rules)
    assert(v4.contains(3), s"orphans must not block publishing: $v4")
    assert(SnapshotLake.read(spark, path).count() == 4)
    // and cleanStaging reclaims the orphaned staging space
    SnapshotLake.cleanStaging(spark, path)
    assert(!new java.io.File(s"$path/_staging").exists())
  }

  test("interchange round-trip: CSV and JSON preserve hostile values") {
    import spark.implicits._
    // commas, quotes, leading/trailing spaces, nulls, µs timestamps,
    // and a double needing full precision — the A16/A17 fidelity
    // contract on values the orders table doesn't happen to contain.
    // (Embedded newlines additionally need the multiLine dial, which
    // trades away intra-file split parallelism — documented, not
    // default.)
    val ts = java.sql.Timestamp.valueOf("2024-02-29 23:59:59.123456")
    val rows = Seq(
      (1L, Some("""a,b "quoted" c"""), Some(0.1 + 0.2), Some(ts)),
      (2L, Some("  padded  "), Some(1.0 / 3.0), None),
      (3L, None, None, Some(ts)))
    val df = rows.toDF("id", "s", "d", "t")
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val base = Files.createTempDirectory("graft_interchange").toFile
    // ignore*WhiteSpace default TRUE on write — without these the
    // writer trims "  padded  " (the A16 face sets them the same way)
    df.write.option("header", "true").option("timestampFormat", fmt)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(s"$base/c")
    val backC = spark.read.schema(df.schema)
      .option("header", "true").option("timestampFormat", fmt)
      .csv(s"$base/c").orderBy("id").collect().toSeq
    df.write.option("timestampFormat", fmt).json(s"$base/j")
    val backJ = spark.read.schema(df.schema)
      .option("timestampFormat", fmt)
      .json(s"$base/j").orderBy("id").collect().toSeq
    val want = df.orderBy("id").collect().toSeq
    assert(backC == want, s"CSV mangled values: $backC")
    assert(backJ == want, s"JSON mangled values: $backJ")
  }
}
