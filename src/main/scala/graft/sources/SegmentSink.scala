package graft.sources

import graft.streaming.RealtimeResample.Segment
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thin sink adapter: the batch downsample output re-expressed in the
  * reference's Segment vocabulary, completing the migration story for
  * consumers of the reference's streamed segments (server/
  * TimeSeriesFlow.scala emits protobuf Segments; streaming/
  * RealtimeResample.scala:29-38 already mirrors the field set for the
  * realtime path — this adapter feeds the SAME case class from the
  * batch path, so one downstream codec serves both).
  *
  * Shape: one Segment per (channel, contiguous bucket run), runs
  * capped at `maxPointsPerSegment` buckets; data = [min, max, min,
  * max, …] in bucket order with isMinMax = true and samplePeriod =
  * the pixel width — the reference's resampled-continuous-stream
  * contract.
  *
  * Scale note: input rows here are PIXELS (downsample output), whose
  * cardinality is bounded by the requested display width × channels —
  * orders of magnitude below sample-scale — so the per-channel window
  * that detects contiguous runs operates on summary-scale data by
  * construction (the same argument that licenses asofJoin's
  * per-bucket carry window), and collect_list is bounded by
  * maxPointsPerSegment.
  */
object SegmentSink {

  /** Adapt `Timeseries.downsample(ts, pixelUs)` output — rows of
    * (channel, bucket, bucket_start, vmin, vmax, …) — into Segments.
    *
    * `fillContinuity = true` applies the reference's fillGaps render
    * pass ([[graft.operators.Timeseries.fillGaps]]) to the bucket
    * relation first, so emitted min/max bands meet their successors —
    * what the reference does to every resampled vector before it hits
    * the wire.
    */
  def toSegments(
    spark: SparkSession,
    down: DataFrame,
    pixelUs: Long,
    maxPointsPerSegment: Int = 1000,
    fillContinuity: Boolean = false
  ): Dataset[Segment] = {
    import spark.implicits._
    val byCh = Window.partitionBy(col("channel")).orderBy(col("bucket"))
    val filled = if (fillContinuity) graft.operators.Timeseries.fillGaps(down) else down
    val indexed = filled
      .select(col("channel"), col("bucket"), col("vmin"), col("vmax"))
      // island id: bucket − dense index is constant exactly within a
      // run of consecutive buckets
      .withColumn("__idx", row_number().over(byCh).cast("long"))
      .withColumn("__island", col("bucket") - col("__idx"))
      .withColumn(
        "__seg",
        expr(s"(row_number() over (partition by channel, bucket - __idx order by bucket) - 1) div $maxPointsPerSegment")
      )
    indexed
      .groupBy(col("channel"), col("__island"), col("__seg"))
      .agg(
        min(col("bucket")).as("__b0"),
        count(lit(1)).cast("int").as("nrPoints"),
        flatten(
          transform(
            array_sort(collect_list(struct(col("bucket"), col("vmin"), col("vmax")))),
            x => array(x.getField("vmin"), x.getField("vmax"))
          )
        ).as("data")
      )
      .select(
        col("channel").as("source"),
        (col("__b0") * pixelUs).as("startTs"),
        lit(pixelUs.toDouble).as("samplePeriod"),
        lit(pixelUs).as("requestedSamplePeriod"),
        lit(true).as("isMinMax"),
        lit("continuous").as("segmentType"),
        col("nrPoints"),
        col("data")
      )
      .as[Segment]
  }
}
