package graft

import graft.operators.Multimodal
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._

/** The pluggable FRAME kernel's contract — the video twin of
  * ImageKernelSpec: the stub stays the driver/oracle path (fixed-size
  * byte slices), a REAL multi-frame decoder (javax.imageio sequence
  * reader over animated GIF) slots into the same batched mapPartitions
  * stage with no plan change, and poison payloads prune instead of
  * killing the task.
  */
class FrameKernelSpec extends SparkSpec {
  import spark.implicits._

  /** A real animated GIF: `n` frames of an 8×8 gradient shifted per
    * frame, written through the JDK's own GIF sequence writer.
    */
  private def gifBytes(n: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until n).foreach { f =>
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) {
        val v = (f * 40 + 16 * x + 2 * y) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  private def payloadDf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          lit("gif").as("format"),
          lit(8).as("width"),
          lit(8).as("height"),
          org.apache.spark.sql.functions.length(col("payload")).cast("long").as("n_bytes")
        ).as("meta")
      )

  "StubFrameKernel" should "slice exactly the expression semantics: every k-th complete frame" in {
    val payload = (0 until 100).map(_.toByte).toArray // 10 frames of 10 bytes
    val fs = Multimodal.StubFrameKernel.frames(payload, 10, 3).toList
    fs.map(_._1) shouldBe List(0L, 3L, 6L, 9L)
    fs.foreach { case (no, frame) =>
      frame.length shouldBe 10
      frame(0) shouldBe (no * 10).toByte
    }
    // short / null payloads emit zero frames
    Multimodal.StubFrameKernel.frames(Array.tabulate(5)(_.toByte), 10, 1) shouldBe empty
    Multimodal.StubFrameKernel.frames(null, 10, 1) shouldBe empty
  }

  "ImageIoFrameKernel" should "decode every k-th frame of a real animated GIF to a luma plane" in {
    val fs = Multimodal.ImageIoFrameKernel.frames(gifBytes(6), frameBytes = 0, everyK = 2).toList
    fs.map(_._1) shouldBe List(0L, 2L, 4L)
    fs.foreach { case (_, plane) => plane.length shouldBe 64 } // 8×8 luma
    // frames genuinely differ (the gradient shifts per frame)
    fs.map(_._2.toSeq).distinct.size shouldBe 3
    // and the plane holds the written luminance, not encoded GIF bytes
    val (no0, plane0) = fs.head
    no0 shouldBe 0L
    (plane0(0) & 0xff) shouldBe 16 * 0 + 2 * 0 // f=0, x=0, y=0 → 0
  }

  it should "reject a non-sequence payload at kernel level" in {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.ImageIoFrameKernel.frames("not a gif".getBytes("UTF-8"), 0, 1)
  }

  "sampleFrames" should "run the real kernel through the identical plan shape as the stub" in {
    val df = payloadDf((0L until 4L).map(i => (i, gifBytes(4))))
    val stub = Multimodal.sampleFrames(df, frameBytes = 64, everyK = 2)
    val real = Multimodal.sampleFrames(df, frameBytes = 64, everyK = 2, kernel = Multimodal.ImageIoFrameKernel)
    def shape(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan.collect { case n => n.getClass.getSimpleName }
    shape(real) shouldBe shape(stub)
    real.schema shouldBe stub.schema
    // the real kernel sees GIF frame structure (2 of 4 frames per doc);
    // the stub slices encoded bytes obliviously — different row grain,
    // same plan
    real.count() shouldBe 8L
    real.select("frame_bytes").distinct().as[Long].collect().toList shouldBe List(64L)
  }

  it should "prune poison payloads to zero frames while the rest of the batch survives" in {
    val rows = (0L until 8L).map { i =>
      (i, if (i == 3L) "corrupt".getBytes("UTF-8") else gifBytes(3))
    }
    val out = Multimodal
      .sampleFrames(payloadDf(rows), frameBytes = 64, everyK = 1, kernel = Multimodal.ImageIoFrameKernel)
      .groupBy("doc_id").count().orderBy("doc_id").as[(Long, Long)].collect().toList
    out shouldBe (0L until 8L).filterNot(_ == 3L).map(_ -> 3L).toList
  }

  "mmFrames" should "surface the active frame kernel as provenance and swap by session conf" in {
    val stubRows = Multimodal.mmFrames(spark, sfDir)
    stubRows.columns should contain("kernel")
    stubRows.select("kernel").distinct().as[String].collect().toList shouldBe List("stub")
    spark.conf.set("spark.graft.mm.frame.kernel", "imageio")
    try {
      // driver testdata payloads are UTF-8 text: not a decodable image
      // sequence, so the poison-pruning contract yields zero frames —
      // the pipeline COMPLETES instead of throwing
      Multimodal.mmFrames(spark, sfDir).count() shouldBe 0L
      Multimodal.frameKernelFor(spark) shouldBe Multimodal.ImageIoFrameKernel
    } finally spark.conf.unset("spark.graft.mm.frame.kernel")
  }
}
