package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online hourly error-rate monitor with the 95% Wilson interval — the
  * streaming twin of the batch
  * [[graft.operators.Timeseries.errorRate]], and deliberately NOT a
  * custom-state operator: a windowed conditional count is exactly what
  * Structured Streaming's watermarked window aggregation already does,
  * so the twin is the canonical `withWatermark → groupBy(window)`
  * plan with the SHARED Wilson projection on top
  * ([[graft.operators.Timeseries.wilsonColumns]] — one definition,
  * both engines' pinned literals). Closed windows are BIT-IDENTICAL
  * to the batch rows because the aggregation is the same conditional
  * count and the projection is the same Column expressions.
  *
  * Scale shape: the stream shuffles once on the window key; state per
  * open window is the two counters the aggregation carries —
  * watermark-evicted, never per-event.
  *
  * Input: streaming (channel string, t long µs). Append-mode output
  * emits each window once, when the watermark passes its end.
  */
object StreamingErrorRate {

  def monitor(
    input: DataFrame,
    bucketUs: Long,
    watermarkDelay: String = "1 minute",
    errorChannel: String = "error"
  ): DataFrame = {
    require(bucketUs % 1000000L == 0L, s"bucketUs must be whole seconds, got $bucketUs")
    input
      .withColumn("__ets", timestamp_micros(col("t").cast("long")))
      .withWatermark("__ets", watermarkDelay)
      .groupBy(window(col("__ets"), s"${bucketUs / 1000000L} seconds").as("__w"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("channel") === errorChannel, lit(1))).as("errors")
      )
      .select(
        Seq(
          unix_micros(col("__w.start")).as("t"),
          col("n"),
          col("errors")
        ) ++ graft.operators.Timeseries.wilsonColumns: _*
      )
  }
}
