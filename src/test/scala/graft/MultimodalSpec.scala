package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Multimodal, Tables}

/** Multimodal plumbing: schema, batching, determinism (decode itself
  * is a documented stub — SURVEY §2.D12).
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("withFakeMedia produces binary payload + typed metadata") {
    val df = Multimodal.withFakeMedia(Tables.documents(spark, sfDir))
    val schema = df.schema
    assert(schema("media").dataType.typeName == "binary")
    // compare names+types (nullability differs for literal-backed fields)
    val metaFields = schema("media_meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields == Multimodal.mediaMetaType.fields
      .map(f => (f.name, f.dataType)).toSeq)
    val row = df.select(col("media"), col("media_meta.n_bytes"),
      col("media_meta.width"), col("media_meta.height")).head()
    assert(row.getAs[Array[Byte]](0).length == row.getLong(1))
    assert(row.getInt(2) >= 1 && row.getInt(2) <= 1920)
    assert(row.getInt(3) >= 1 && row.getInt(3) <= 1080)
  }

  test("sampleFrames: columnar fan-out with exact frame count, width, and content") {
    val media = Multimodal.withFakeMedia(Tables.documents(spark, sfDir))
    val frames = Multimodal.sampleFrames(media, frameBytes = 8, stride = 2)
    // expected rows per doc: ceil((len / frameBytes) / stride)
    val one = media.select(col("doc_id"), col("media")).head()
    val payloadLen = one.getAs[Array[Byte]](1).length
    val expectRows = ((payloadLen / 8) + 1) / 2
    val perDoc = frames.groupBy(col("doc_id")).count().collect()
    assert(perDoc.nonEmpty)
    assert(perDoc.forall(_.getLong(1) == expectRows),
      s"expected $expectRows sampled frames per doc, got ${perDoc.take(3).toSeq}")
    // every frame is exactly frameBytes wide and matches a driver slice
    val expect = one.getAs[Array[Byte]](1).grouped(8).toSeq
    val got = frames.filter(col("doc_id") === one.getLong(0))
      .orderBy(col("frame_idx")).collect()
      .map(r => (r.getLong(1), r.getAs[Array[Byte]](2)))
    assert(got.map(_._1).toSeq == (0L until (payloadLen / 8).toLong by 2L).toSeq)
    got.foreach { case (idx, bytes) =>
      assert(bytes.toSeq == expect(idx.toInt).toSeq, s"frame $idx content diverges")
    }
    // stays columnar: no ScalaUDF / RDD scan in the plan
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("ExistingRDD"),
      s"frame sampling should be pure column ops:\n$plan")
  }

  test("sampleFrames: partial trailing blocks dropped, short/empty media yield no rows") {
    import spark.implicits._
    val media = Seq(
      (1L, Array.tabulate(13)(_.toByte)),  // 1 full frame, 5-byte tail
      (2L, Array.tabulate(5)(_.toByte)),   // shorter than a frame
      (3L, Array.empty[Byte]),             // empty payload
      (4L, Array.tabulate(16)(_.toByte)))  // exactly 2 frames
      .toDF("doc_id", "media")
    val frames = Multimodal.sampleFrames(media, frameBytes = 8, stride = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Array[Byte]](2)))
    val byDoc = frames.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc(1L).map(_._2).toSeq == Seq(0L), "13 bytes → one full frame only")
    assert(byDoc(1L).head._3.toSeq == (0 until 8).map(_.toByte).toSeq,
      "trailing partial block must not leak into the frame")
    assert(!byDoc.contains(2L), "media shorter than a frame yields no rows")
    assert(!byDoc.contains(3L), "empty media yields no rows")
    assert(byDoc(4L).map(_._2).toSeq == Seq(0L, 1L))
    assert(byDoc(4L)(1)._3.toSeq == (8 until 16).map(_.toByte).toSeq)
  }

  test("extractFeatures is deterministic, total, and batch-size independent") {
    val media = Multimodal.withFakeMedia(Tables.documents(spark, sfDir))
    val f1 = Multimodal.extractFeatures(media, batchSize = 64)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7), batchSize = 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(f1.size == media.count())
    assert(f1 == f2, "features must not depend on partitioning or batch size")
  }

  test("a custom BatchDecoder binds without plan surgery") {
    val media = Multimodal.withFakeMedia(Tables.documents(spark, sfDir))
    val custom = new Multimodal.BatchDecoder {
      def decode(ids: Array[Long], payloads: Array[Array[Byte]]): Array[Array[Float]] =
        ids.zip(payloads).map { case (id, p) => Array(id.toFloat, p.length.toFloat) }
    }
    val out = Multimodal.extractFeatures(media, batchSize = 16, decoder = custom)
    val got = out.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(got.nonEmpty && got.forall { case (id, f) => f.head == id.toFloat })
    // the swap is plan-free: still ONE Dataset plan — a typed
    // MapPartitions above the scan, not an RDD round-trip that would
    // sever pushdown below and AQE above
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan ExistingRDD"),
      "extractFeatures must not drop to .rdd + createDataFrame")
  }

  test("fingerprint custom expression matches a scala reference and survives codegen") {
    val ref = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        var h = 0L
        r.getString(1).getBytes("UTF-8").foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
        (r.getLong(0), h)
      }.toMap
    val got = graft.queries.TextQueries.textFingerprint(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == ref)
    // SQL registration path
    graft.functions.Fingerprint.register(spark)
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs_fp")
    val viaSql = spark.sql(
      "SELECT doc_id, rolling_fingerprint(text) AS fp FROM docs_fp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaSql == ref)
  }
}
