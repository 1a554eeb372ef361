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
    s.map(_.getString(8)).distinct.toSeq shouldBe Seq("stub")
    r.map(_.getString(8)).distinct.toSeq shouldBe Seq("imageio")
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

  "kernelFor" should "select by session conf and default to the stub" in {
    Multimodal.kernelFor(spark) shouldBe Multimodal.StubKernel
    spark.conf.set("spark.graft.mm.kernel", "imageio")
    try Multimodal.kernelFor(spark) shouldBe Multimodal.ImageIoKernel
    finally spark.conf.unset("spark.graft.mm.kernel")
  }
}
