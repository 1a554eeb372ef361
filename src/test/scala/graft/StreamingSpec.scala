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
