package graft

import graft.functions.Butterworth
import graft.operators.{Filtering, Timeseries}
import graft.sources.{SegmentProto, SegmentSink}
import graft.streaming.RealtimeServe
import graft.streaming.RealtimeServe.{Frame, Sample}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end equality for the composed streaming serve chain: frames
  * emitted by the live pipeline must decode byte-equal to the batch
  * hot path's output on the consumed prefix.
  */
class RealtimeServeSpec extends SparkSpec {
  import spark.implicits._

  private val bucketUs = 1000L
  private val pixelUs = 4000L // 4 grid steps per pixel -> resampled branch
  private val pad = 16
  private val cascade = Filtering.FixedCascade
  private val pairs = Seq(("click", "view"))

  private def vClick(i: Long): Double = ((i * 2654435761L) % 1009L) / 1009.0 - 0.5
  private def vView(i: Long): Double = ((i * 40503L) % 997L) / 997.0 - 0.5

  /** 600 buckets of 4 samples per channel, with a montage gap (view
    * silent for buckets 300-315 = 4 whole pixels) and 6 spaced trailer
    * buckets that progressively close the tail so every main-region
    * frame emits.
    */
  private val trailerT0 = 10000L * bucketUs
  private val mainRows: Seq[Sample] = (0L until 600L).flatMap { b =>
    (0 until 4).flatMap { k =>
      val t = b * bucketUs + k * 250L
      val i = b * 4 + k
      Seq(Sample("click", t, vClick(i))) ++
        (if (b >= 300L && b <= 315L) Seq.empty else Seq(Sample("view", t, vView(i))))
    }
  }
  private val trailerRows: Seq[Sample] = (0L until 6L).flatMap { j =>
    val t = trailerT0 + j * 4L * bucketUs
    Seq(Sample("click", t, 0.25), Sample("view", t, -0.25))
  }
  private val allRows = mainRows ++ trailerRows

  /** The batch chain with a configurable island cap — exactly
    * hotPathWire's stages (montage grid → cascade → downsample →
    * fillGaps/toSegments → wire).
    */
  private def batchFrames(cap: Int): Map[(String, Long), (Int, Array[Byte])] = {
    val df = allRows.map(s => (s.channel, s.t, s.v)).toDF("channel", "t", "v")
    val virt = Timeseries.montageAlignedGrid(spark, df, pairs, bucketUs)
    val filtered = Filtering
      .applyCascade(spark, virt, cascade, pad, gapUs = bucketUs)
      .select($"channel", $"t", org.apache.spark.sql.functions.round($"fv", 6).as("v"))
    val down = Timeseries.downsample(filtered, pixelUs)
    SegmentSink
      .toSegments(spark, down, pixelUs, maxPointsPerSegment = cap, fillContinuity = true)
      .collect()
      .map(s =>
        (s.source, s.startTs) -> (s.nrPoints, SegmentProto.encodeTimeSeriesMessage(s))
      )
      .toMap
  }

  private def streamFrames(cap: Int, carve: Seq[Int]): Seq[Frame] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sample]
    val out = RealtimeServe.serve(mem.toDS(), pairs, bucketUs, pixelUs, cascade, pad, cap)
    val name = s"serve_out_$cap"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      var off = 0
      for (sz <- carve) {
        mem.addData(allRows.slice(off, off + sz): _*)
        off += sz
        q.processAllAvailable()
      }
      mem.addData(allRows.drop(off): _*)
      q.processAllAvailable()
      spark.table(name).as[Frame].collect().toSeq
    } finally q.stop()
  }

  "RealtimeServe.serve" should "emit frames byte-equal to the batch hot path on the consumed prefix" in {
    val batch = batchFrames(cap = 1000)
    val streamed = streamFrames(cap = 1000, carve = Seq(800, 1500, 1300))
    val mains = streamed.filter(_.startTs < trailerT0)
    // the main region holds two islands (split by the montage gap);
    // both must have emitted
    mains.map(_.startTs).distinct.size shouldBe 2
    mains.foreach { f =>
      val (nr, bytes) = batch((f.channel, f.startTs))
      f.nrPoints shouldBe nr
      f.wire shouldBe bytes
    }
    // and the streamed set covers every batch main-region frame
    val batchMains = batch.keys.filter(_._2 < trailerT0).toSet
    mains.map(f => (f.channel, f.startTs)).toSet shouldBe batchMains
  }

  it should "honor the island cap grammar and stay carving-invariant" in {
    val batch = batchFrames(cap = 16)
    val a = streamFrames(cap = 16, carve = Seq(100, 3000, 40, 1000))
    val b = streamFrames(cap = 16, carve = Seq(2500))
    for (streamed <- Seq(a, b)) {
      val mains = streamed.filter(_.startTs < trailerT0)
      // islands of 75 and 71 pixels under cap 16: 5 + 5 chunks
      mains.size shouldBe 10
      mains.foreach { f =>
        val (nr, bytes) = batch((f.channel, f.startTs))
        f.nrPoints shouldBe nr
        f.wire shouldBe bytes
      }
    }
  }

  it should "emit frames a reference websocket consumer can decode" in {
    val streamed = streamFrames(cap = 1000, carve = Seq(3000))
    val f = streamed.filter(_.startTs < trailerT0).minBy(_.startTs)
    val m = SegmentProto.decodeTimeSeriesMessage(f.wire)
    val s = m.segment.get
    s.source shouldBe "click<->view"
    s.isMinMax shouldBe true
    s.samplePeriod shouldBe pixelUs.toDouble
    s.data.length shouldBe s.nrPoints * 2
  }
}
