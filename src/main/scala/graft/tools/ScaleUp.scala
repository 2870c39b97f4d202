package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only harness (NOT part of the library): amplifies a testdata
  * scale-factor directory ×F into an on-disk lake with the same
  * schema and single-file-per-table layout, so the DuckDB-oracle gate
  * and the bench can run at sf1 (= sf0.1 × 10) on REAL parquet — the
  * §6 scaling-ratio measurement the in-memory ScaleProbe legs can't
  * provide.
  *
  * Replication discipline (deterministic, FK-consistent):
  * - `region`/`nation` copy verbatim (fixed dims, like TPC-H).
  * - Every scaled table gets F replicas; replica r offsets its OWN
  *   primary key and every FK into another scaled table by r·10⁷ —
  *   so each replica references its own replica's rows (the trade
  *   graph becomes F disjoint copies, the honest ×F for the graph
  *   family). `*_nationkey` FKs stay (the dim is unscaled). The
  *   offset is EVEN, so the `user_id % 2` arm convention survives
  *   per replica.
  * - Calendar columns stay: ×F means more traffic over the SAME
  *   window, which is how real growth hits the day-cell monitors.
  * - `documents.text` of replica r>0 gets a marker token spliced in
  *   every 4 words: every 5-gram shingle breaks, so replicas are NOT
  *   near-dups of their originals and the corpus dup DENSITY stays
  *   constant — scaling ratios measure volume, not a manufactured
  *   dup explosion. Within a replica the sf0.1 dup structure is
  *   preserved verbatim.
  * - `embeddings.embedding` of replica r>0 gets a deterministic
  *   ±0.05 per-component hash dither: no exact vector clones, the
  *   coarse cluster structure (labels) survives.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor>
  */
object ScaleUp {
  private val OFF = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(src, dst, fStr) = args.take(3)
    val f = fStr.toInt
    require(f >= 2 && f <= 100, s"factor in [2,100], got $f")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(dst).mkdirs()

    def writeOne(df: DataFrame, name: String): Unit = {
      val tmp = s"$dst/__tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val out = new java.io.File(s"$dst/$name.parquet")
      if (out.exists()) out.delete()
      java.nio.file.Files.move(part.toPath, out.toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      println(s"[scaleup] $name: ${spark.read.parquet(out.getPath).count()} rows")
    }

    def reps(df: DataFrame): DataFrame = {
      // The r·10⁷ offset scheme is only FK-disjoint while every offset
      // key is below OFF — on a bigger source, replica r's keys would
      // silently collide with replica r+1's (r15 ADVICE). Fail loudly.
      val keyCols = df.columns.filter(c =>
        (c.endsWith("key") || c.endsWith("_id")) && !c.endsWith("nationkey"))
      if (keyCols.nonEmpty) {
        val maxes = df.agg(max(col(keyCols.head).cast("long")),
          keyCols.tail.map(c => max(col(c).cast("long"))): _*).head
        keyCols.zipWithIndex.foreach { case (c, i) =>
          // null max = empty table or non-castable key values; either way
          // the offset precondition cannot be certified — fail with the
          // intended diagnostic, not getLong's opaque NPE (r16 ADVICE).
          require(!maxes.isNullAt(i),
            s"ScaleUp offset precondition violated: max(cast($c as long)) " +
              "is NULL (empty source table or non-numeric key values)")
          val mx = maxes.getLong(i)
          require(mx < OFF,
            s"ScaleUp offset precondition violated: max($c)=$mx >= $OFF — " +
              "replica keys would collide; raise OFF or shrink the source")
        }
      }
      df.withColumn("__r", explode(sequence(lit(0L), lit(f - 1L))))
    }
    def off(c: String): Column = (col(c) + col("__r") * OFF).as(c)

    // fixed dims: verbatim copy
    Seq("region", "nation").foreach { t =>
      writeOne(spark.read.parquet(s"$src/$t.parquet"), t)
    }

    val customer = spark.read.parquet(s"$src/customer.parquet")
    writeOne(reps(customer).select(off("c_custkey"), col("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer")

    val supplier = spark.read.parquet(s"$src/supplier.parquet")
    writeOne(reps(supplier).select(off("s_suppkey"), col("s_name"),
      col("s_nationkey"), col("s_acctbal")), "supplier")

    val part = spark.read.parquet(s"$src/part.parquet")
    writeOne(reps(part).select(off("p_partkey"), col("p_name"),
      col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice")), "part")

    val orders = spark.read.parquet(s"$src/orders.parquet")
    writeOne(reps(orders).select(off("o_orderkey"), off("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders")

    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    writeOne(reps(lineitem).select(off("l_orderkey"), off("l_partkey"),
      off("l_suppkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")),
      "lineitem")

    // events: load via Tables (sniffs the ns-vs-µs ts encoding)
    val events = graft.sources.Tables.events(spark, src)
    writeOne(reps(events).select(off("event_id"), col("ts"),
      off("user_id"), col("event_type"), col("value"), col("props")),
      "events")

    val documents = spark.read.parquet(s"$src/documents.parquet")
    val txt = when(col("__r") === 0L, col("text")).otherwise(
      regexp_replace(col("text"), lit("((\\S+ ){4})"),
        concat(lit("$1zq"), col("__r").cast("string"), lit("x "))))
    writeOne(reps(documents).select(off("doc_id"), txt.as("text"),
      col("lang"), col("source"), length(txt).cast("long").as("n_chars")),
      "documents")

    val embeddings = spark.read.parquet(s"$src/embeddings.parquet")
    val pert = when(col("__r") === 0L, col("embedding")).otherwise(
      transform(col("embedding"), (v, j) =>
        (v + ((pmod(xxhash64(col("vec_id"), col("__r"), j), lit(1000L))
          - lit(500L)).cast("float") * lit(1e-4f))).cast("float")))
    writeOne(reps(embeddings).select(off("vec_id"),
      pert.as("embedding"), col("label")), "embeddings")

    spark.stop()
  }
}
