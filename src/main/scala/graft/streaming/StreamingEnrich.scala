package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — live samples enriched with the
  * annotation span covering them, both sides unbounded (the streaming
  * analog of the batch annotation-window queries; the reference pushes
  * annotation layers to live viewers the same way its batch API serves
  * them).
  *
  * This is Structured Streaming's two-sided stateful join: each side
  * buffers rows in the state store until the OTHER side's watermark
  * proves no future match can arrive. That proof needs the join
  * condition to bound each side's event time in terms of the other's —
  * an open-ended `sample.ts >= span.start` alone would force both
  * sides to buffer forever, so spans carry an explicit maximum length
  * `maxSpanSeconds`: `ts ∈ [s_start, s_start + maxSpan]` bounds sample
  * time both ways relative to span time, and the engine derives state
  * eviction for both stores from the two watermarks.
  *
  * Scale shape: the join keys on channel (hash-partitioned state), the
  * interval predicate evaluates within the key's buffered rows, and
  * state is bounded by watermark delay + maxSpan per channel — an
  * always-on deployment's state is (arrival rate × horizon), not
  * stream length. Inner join: a sample emits once per covering span.
  */
object StreamingEnrich {

  def annotate(
    samples: DataFrame, // (channel string, ts timestamp, v double)
    spans: DataFrame, // (s_channel string, s_start timestamp, label string)
    maxSpanSeconds: Int = 60,
    watermarkDelay: String = "10 seconds"
  ): DataFrame = {
    val s = samples.withWatermark("ts", watermarkDelay)
    val a = spans.withWatermark("s_start", watermarkDelay)
    s.join(
      a,
      expr(
        s"""channel = s_channel AND
           |ts >= s_start AND
           |ts <= s_start + interval $maxSpanSeconds seconds""".stripMargin
      )
    ).select(
      col("channel"),
      col("ts"),
      col("v"),
      col("label"),
      col("s_start")
    )
  }
}
