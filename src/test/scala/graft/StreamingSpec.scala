package graft

import java.sql.Timestamp

import graft.streaming.RealtimeDownsample
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  "RealtimeDownsample.downsample" should "emit finalized windowed min/max segments" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val out = RealtimeDownsample.downsample(
      mem.toDF().toDF("channel", "ts", "v"),
      windowDuration = "10 seconds",
      watermarkDelay = "5 seconds"
    )
    val q = out.writeStream.format("memory").queryName("seg_out").outputMode("append").start()
    try {
      // two full windows for channel a, then advance watermark far enough
      mem.addData(("a", ts(1), 1.0), ("a", ts(5), 9.0), ("a", ts(12), -3.0))
      q.processAllAvailable()
      mem.addData(("a", ts(60), 0.0)) // watermark jumps; earlier windows finalize
      q.processAllAvailable()

      val rows = spark
        .table("seg_out")
        .orderBy("window_start")
        .select($"channel", $"vmin", $"vmax", $"n")
        .as[(String, Double, Double, Long)]
        .collect()
        .toList
      rows shouldBe List(("a", 1.0, 9.0, 2L), ("a", -3.0, -3.0, 1L))
    } finally q.stop()
  }

  "RealtimeResample" should "keep the resampled stream gap-free across segments (reference IngestSegmentSpec property)" in {
    import graft.streaming.RealtimeResample
    import RealtimeResample.IngestSegment
    // a contiguous run of ingest segments at samplePeriod 100 resampled
    // to pixel duration 500 must produce contiguous min/max chunks
    val samplePeriod = 100.0
    val perPacket = 50
    val packets = (0 until 100).map { i =>
      IngestSegment("ch", (i.toLong * perPacket * samplePeriod.toLong), samplePeriod,
        (0 until perPacket).map(j => math.sin((i * perPacket + j) / 10.0)))
    }
    val segs = packets.map(RealtimeResample.resampleMessage(_, 500))
    segs.foreach { s =>
      s.isMinMax shouldBe true
      s.nrPoints shouldBe 10 // 50 samples * 100 µs / 500 µs
      s.data.length shouldBe 20
    }
    // reconstruct chunk times: startTs + k * samplePeriod; consecutive
    // segments must abut exactly (no gaps, no overlap)
    val chunkTimes = segs.flatMap(s => (0 until s.nrPoints).map(k => s.startTs + k * s.samplePeriod))
    chunkTimes.sliding(2).foreach { case Seq(a, b) => (b - a) shouldBe 500.0 +- 1e-9 }
  }

  it should "cut into balanced chunks and pass through slow segments unchanged" in {
    import graft.streaming.RealtimeResample
    import RealtimeResample.IngestSegment
    // reference `cut`: boundaries at round(x*m/n) — 10 items into 3 ->
    // sizes 3,4,3
    RealtimeResample.cut((1 to 10).toVector, 3).map(_.length) shouldBe Vector(3, 4, 3)
    RealtimeResample.resample(Vector(5.0, 1.0, 9.0, 2.0), 2) shouldBe Seq((1.0, 5.0), (2.0, 9.0))
    // samplePeriod >= pixelDuration -> passthrough
    val slow = RealtimeResample.resampleMessage(IngestSegment("c", 0L, 1000.0, Seq(1.0, 2.0)), 500)
    slow.isMinMax shouldBe false
    slow.data shouldBe Seq(1.0, 2.0)
  }

  it should "apply as a typed map over a streaming Dataset" in {
    import graft.streaming.RealtimeResample
    import RealtimeResample.IngestSegment
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[IngestSegment]
    val mem = MemoryStream[IngestSegment]
    val out = RealtimeResample.stream(mem.toDS(), 500)
    val q = out.writeStream.format("memory").queryName("rs_out").outputMode("append").start()
    try {
      mem.addData(IngestSegment("ch", 0L, 100.0, (1 to 50).map(_.toDouble)))
      q.processAllAvailable()
      val rows = spark.table("rs_out").collect()
      rows.length shouldBe 1
      rows(0).getAs[Int]("nrPoints") shouldBe 10
      rows(0).getAs[Boolean]("isMinMax") shouldBe true
    } finally q.stop()
  }

  "RealtimeDownsample.sessionSpans" should "split sessions at the gap threshold" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val out = RealtimeDownsample.sessionSpans(
      mem.toDF().toDF("channel", "ts", "v"),
      gapSeconds = 5,
      watermarkDelay = "2 seconds"
    )
    val q = out.writeStream.format("memory").queryName("span_out").outputMode("append").start()
    try {
      mem.addData(("a", ts(1), 0.0), ("a", ts(3), 0.0), ("a", ts(20), 0.0))
      q.processAllAvailable()
      mem.addData(("a", ts(100), 0.0))
      q.processAllAvailable()

      val rows = spark
        .table("span_out")
        .orderBy("span_start")
        .select($"channel", $"n")
        .as[(String, Long)]
        .collect()
        .toList
      rows shouldBe List(("a", 2L), ("a", 1L))
    } finally q.stop()
  }
}
