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
}
