package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming analog of the reference's realtime resample
  * path: ingest segments arrive continuously per channel and the
  * service emits min/max-downsampled Segments for live display
  * (reference: query/TimeSeriesQueryUtils.scala:243-285 resample of
  * ingest segments, exercised by IngestSegmentSpec).
  *
  * Spark-native shape: readStream → watermark on event time → windowed
  * min/max/count/avg per (channel, window). The watermark bounds state:
  * windows older than the allowed lateness are finalized and evicted,
  * so state size is O(channels × windows-in-flight) regardless of
  * stream length — the property that matters at production rates.
  * Output mode `append` emits each window exactly once when it
  * finalizes (the streaming Segment); `update` would emit refinements.
  */
object RealtimeDownsample {

  /** input: streaming (channel string, ts timestamp, v double). */
  def downsample(input: DataFrame, windowDuration: String, watermarkDelay: String): DataFrame =
    input
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("channel"), window(col("ts"), windowDuration).as("w"))
      .agg(
        min(col("v")).as("vmin"),
        max(col("v")).as("vmax"),
        count(lit(1)).as("n"),
        avg(col("v")).as("vavg")
      )
      .select(
        col("channel"),
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("vmin"),
        col("vmax"),
        col("n"),
        col("vavg")
      )

  /** Streaming exact dedup: drop repeated documents within the
    * watermark horizon, keyed by content hash — the streaming front-door
    * of the batch dedup pipeline (state is bounded by the watermark;
    * exact-forever dedup needs the batch job downstream).
    * Input: streaming (doc_hash string/long, ts timestamp, ...).
    */
  def dedupStream(input: DataFrame, watermarkDelay: String): DataFrame =
    input
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("doc_hash")

  /** Streaming gap detector: flags samples that arrive more than
    * `gapSeconds` after the previous sample on the same channel —
    * the realtime analog of contiguous-span splitting, implemented
    * with per-group state via session windows.
    */
  def sessionSpans(input: DataFrame, gapSeconds: Int, watermarkDelay: String): DataFrame =
    input
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("channel"), session_window(col("ts"), s"$gapSeconds seconds").as("s"))
      .agg(min(col("ts")).as("span_start"), max(col("ts")).as("span_end"), count(lit(1)).as("n"))
      .select(col("channel"), col("span_start"), col("span_end"), col("n"))
}
