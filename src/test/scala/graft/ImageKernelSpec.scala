package graft

import graft.operators.Multimodal
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._

/** The pluggable decode kernel's contract: the stub stays the driver /
  * oracle path, a REAL decoder (javax.imageio) slots into the same
  * batched mapPartitions stage with no plan change, and the output
  * schema surfaces which kernel produced the features.
  */
class ImageKernelSpec extends SparkSpec {
  import spark.implicits._

  /** A real encoded PNG: deterministic 16×12 gray gradient. */
  private def pngBytes(seed: Int): Array[Byte] = {
    val img = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16) {
      val v = (seed + 13 * x + 29 * y) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def payloadDf(n: Int) =
    (0 until n).map(i => (i.toLong, pngBytes(i * 37))).toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          lit("png").as("format"),
          lit(16).as("width"),
          lit(12).as("height"),
          org.apache.spark.sql.functions.length(col("payload")).cast("long").as("n_bytes")
        ).as("meta")
      )

  "ImageIoKernel" should "decode a real PNG to the same feature triple the stub computes on the luma plane" in {
    val png = pngBytes(7)
    val (chk, mean, std) = Multimodal.ImageIoKernel.decode(png)
    // gray gradient: the decoded plane is exactly the v values we wrote
    val plane = (0 until 12).flatMap(y => (0 until 16).map(x => ((7 + 13 * x + 29 * y) % 256).toByte)).toArray
    val (echk, emean, estd) = Multimodal.decodeStub(plane)
    (chk, mean, std) shouldBe ((echk, emean, estd))
    // and the triple differs from running the stub on the ENCODED bytes
    Multimodal.decodeStub(png) should not be ((chk, mean, std))
  }

  it should "resize through a real redraw to exactly outW×outH luma bytes" in {
    val out = Multimodal.ImageIoKernel.resize(pngBytes(3), 8, 8)
    out.length shouldBe 64
    // a gradient image's area-sampled thumbnail is not constant
    out.distinct.length should be > 1
  }

  it should "reject a non-image payload instead of fabricating features" in {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.ImageIoKernel.decode("not an image".getBytes("UTF-8"))
  }

  "decodeFeatures" should "run the real kernel through the identical plan shape as the stub" in {
    val df = payloadDf(5)
    val stub = Multimodal.decodeFeatures(spark, df, kernel = Multimodal.StubKernel)
    val real = Multimodal.decodeFeatures(spark, df, kernel = Multimodal.ImageIoKernel)
    // identical physical operator sequence — the kernel swap is invisible
    // to the planner (same typed mapPartitions stage)
    def shape(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan.collect { case n => n.getClass.getSimpleName }
    shape(real) shouldBe shape(stub)
    // schema identical including the provenance column; values differ
    real.schema shouldBe stub.schema
    val s = stub.orderBy("doc_id").collect()
    val r = real.orderBy("doc_id").collect()
    s.map(_.getAs[String]("kernel")).distinct.toSeq shouldBe Seq("stub")
    r.map(_.getAs[String]("kernel")).distinct.toSeq shouldBe Seq("imageio")
    // every payload here is a real PNG, so both kernels decode them all
    (s ++ r).map(_.getAs[Boolean]("decode_ok")).distinct.toSeq shouldBe Seq(true)
    // both computed one row per payload with the same keys/meta
    r.map(x => (x.getLong(0), x.getString(1), x.getInt(2), x.getInt(3), x.getLong(4))).toSeq shouldBe
      s.map(x => (x.getLong(0), x.getString(1), x.getInt(2), x.getInt(3), x.getLong(4))).toSeq
    // feature values genuinely come from the decoded plane, not the bytes
    r.map(_.getLong(5)).toSeq should not be s.map(_.getLong(5)).toSeq
  }

  it should "compose resize→decode under the real kernel exactly like the stub chain" in {
    val df = payloadDf(3)
    val realChain = Multimodal.decodeFeatures(
      spark,
      // imageio resize emits a raw luma plane, not an encoded image, so
      // the composed decode must run the stub over the decoded plane —
      // exactly the contract the mmResize stub chain uses
      Multimodal.resize(spark, df, 8, 8, kernel = Multimodal.ImageIoKernel),
      kernel = Multimodal.StubKernel
    )
    val rows = realChain.orderBy("doc_id").collect()
    rows.length shouldBe 3
    all(rows.map(_.getLong(4))) shouldBe 64L // n_bytes = 8×8 luma plane
  }

  it should "survive one poison payload in a batch, flagging it instead of killing the task" in {
    // 64 payloads, one corrupt in the middle of a single 64-batch: the
    // per-payload try/catch must emit NULL features + decode_ok=false
    // for the bad row and leave the other 63 untouched — task retry
    // re-reads the same blob, so a thrown decode is a JOB killer at
    // 100 TB, not a transient
    val rows = (0 until 64).map { i =>
      val payload = if (i == 31) "definitely not an image".getBytes("UTF-8") else pngBytes(i * 37)
      (i.toLong, payload)
    }
    val df = rows.toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          lit("png").as("format"),
          lit(16).as("width"),
          lit(12).as("height"),
          org.apache.spark.sql.functions.length(col("payload")).cast("long").as("n_bytes")
        ).as("meta")
      )
    val out = Multimodal.decodeFeatures(spark, df, batchSize = 64, kernel = Multimodal.ImageIoKernel)
      .orderBy("doc_id").collect()
    out.length shouldBe 64
    val (bad, good) = out.partition(_.getAs[Long]("doc_id") == 31L)
    bad.length shouldBe 1
    bad.head.getAs[Boolean]("decode_ok") shouldBe false
    bad.head.isNullAt(bad.head.fieldIndex("checksum")) shouldBe true
    bad.head.isNullAt(bad.head.fieldIndex("byte_mean")) shouldBe true
    good.length shouldBe 63
    all(good.map(_.getAs[Boolean]("decode_ok"))) shouldBe true
    all(good.map(r => r.isNullAt(r.fieldIndex("checksum")))) shouldBe false
    // the stub keeps its never-throws contract: decode_ok uniformly true
    val stubOut = Multimodal.decodeFeatures(spark, df, batchSize = 64).collect()
    all(stubOut.map(_.getAs[Boolean]("decode_ok"))) shouldBe true
  }

  "mmResize under the imageio kernel" should "complete end-to-end, composing resize tolerance with decode flags" in {
    // driver testdata payloads are UTF-8 text — undecodable by imageio.
    // The composed chain must now COMPLETE (resize → null payload →
    // decode_ok=false) instead of throwing, with provenance naming the
    // kernel that ran the decode stage.
    spark.conf.set("spark.graft.mm.kernel", "imageio")
    try {
      val out = Multimodal.mmResize(spark, sfDir).collect()
      out.length.toLong shouldBe Tables.documents(spark, sfDir).count()
      all(out.map(_.getAs[Boolean]("decode_ok"))) shouldBe false
      out.map(_.getAs[String]("kernel")).distinct.toSeq shouldBe Seq("imageio")
    } finally spark.conf.unset("spark.graft.mm.kernel")
  }

  "kernelFor" should "select by session conf and default to the stub" in {
    Multimodal.kernelFor(spark) shouldBe Multimodal.StubKernel
    spark.conf.set("spark.graft.mm.kernel", "imageio")
    try Multimodal.kernelFor(spark) shouldBe Multimodal.ImageIoKernel
    finally spark.conf.unset("spark.graft.mm.kernel")
  }
}
