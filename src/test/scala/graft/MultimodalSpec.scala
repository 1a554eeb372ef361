package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  "withPayloads" should "produce the binary + typed-metadata schema" in {
    val df = Multimodal.withPayloads(Tables.documents(spark, sfDir))
    df.schema("payload").dataType shouldBe BinaryType
    val meta = df.schema("meta").dataType.asInstanceOf[StructType]
    meta("format").dataType shouldBe StringType
    meta("width").dataType shouldBe IntegerType
    meta("n_bytes").dataType shouldBe LongType
    df.filter($"payload".isNull).count() shouldBe 0L
  }

  "decodeFeatures" should "emit one deterministic feature row per payload regardless of batch size" in {
    val docs = Tables.documents(spark, sfDir)
    val p = Multimodal.withPayloads(docs)
    val f1 = Multimodal.decodeFeatures(spark, p, batchSize = 7).orderBy("doc_id").collect()
    val f2 = Multimodal.decodeFeatures(spark, p, batchSize = 256).orderBy("doc_id").collect()
    f1.length shouldBe docs.count()
    f1 shouldBe f2 // batch shape must not affect results
  }

  "resize" should "emit resized payloads keeping the composable (payload, meta) shape" in {
    val p = Multimodal.withPayloads(Tables.documents(spark, sfDir))
    val r = Multimodal.resize(spark, p, outW = 8, outH = 8)
    r.count() shouldBe p.count()
    r.filter($"meta.n_bytes" > 64).count() shouldBe 0L
    r.select($"meta.width").distinct().as[Int].collect().toList shouldBe List(8)
    // composes with the other payload operators
    Multimodal.decodeFeatures(spark, r).count() shouldBe p.count()
    // deterministic: same input -> same resized bytes
    val a = r.orderBy("doc_id").select("payload").as[Array[Byte]].first()
    val b = Multimodal.resize(spark, p, 8, 8).orderBy("doc_id").select("payload").as[Array[Byte]].first()
    a.toSeq shouldBe b.toSeq
  }

  "sampleFrames" should "emit no rows for payloads without one complete frame" in {
    val df = Seq((1L, Array.tabulate(5)(_.toByte)), (2L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
    Multimodal.sampleFrames(df, frameBytes = 10, everyK = 1).count() shouldBe 0L
  }

  "sampleFrames" should "keep every k-th fixed-size frame as its own row" in {
    val payload = (0 until 100).map(_.toByte).toArray // 10 frames of 10 bytes
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    val frames = Multimodal
      .sampleFrames(df, frameBytes = 10, everyK = 3)
      .orderBy("frame_no")
      .collect()
    frames.map(_.getAs[Long]("frame_no")).toList shouldBe List(0L, 3L, 6L, 9L)
    frames.foreach(_.getAs[Long]("frame_bytes") shouldBe 10L)
    // frame 3 starts at byte 30
    frames(1).getAs[Array[Byte]]("frame")(0) shouldBe 30.toByte
  }

  it should "match the stub kernel run directly on the payload bytes" in {
    val payload = "hello multimodal".getBytes("UTF-8")
    val (checksum, mean, std) = Multimodal.decodeStub(payload)
    val row = Multimodal
      .decodeFeatures(spark, Seq((1L, payload, "png", 16, 12)).toDF("doc_id", "payload", "format", "width", "height")
        .select($"doc_id", $"payload", struct($"format", $"width", $"height", lit(16L).as("n_bytes")).as("meta")))
      .head()
    row.getAs[Long]("checksum") shouldBe checksum
    row.getAs[Double]("byte_mean") shouldBe mean +- 1e-12
    row.getAs[Double]("byte_std") shouldBe std +- 1e-12
  }

  "mmFrames" should "decode exactly the sampled frames with per-frame stub features" in {
    val frames = Multimodal
      .sampleFrames(Multimodal.withPayloads(Tables.documents(spark, sfDir)), frameBytes = 64, everyK = 4)
      .as[(Long, Long, Array[Byte], Long)]
      .collect()
    frames.length should be > 0
    val got = Multimodal.mmFrames(spark, sfDir).collect()
    got.length shouldBe frames.length
    // every output row's checksum is the stub kernel on that frame slice
    val expected = frames.map { case (id, no, frame, _) => (id, no) -> Multimodal.decodeStub(frame)._1 }.toMap
    got.foreach { r =>
      r.getAs[Long]("checksum") shouldBe expected((r.getAs[Long]("doc_id"), r.getAs[Long]("frame_no")))
    }
  }
}
