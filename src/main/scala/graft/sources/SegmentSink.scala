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

  /** The unit-channel twin of [[toSegments]]: one
    * `TimeSeriesMessage{event}` wire frame per channel, assembled from
    * the batch analogs of the reference's two unit streams —
    * `Timeseries.eventBins` output (channel, bucket, …, avg_time, n)
    * and `Timeseries.spikeWaveforms` output (channel, wf, chunk, wmin,
    * wmax). Payload contract per reference query/
    * TimeSeriesUnitQueryRawHttp.scala:104-118 and WsClient.scala:
    * 120-139: times = the (avgTime, count) pair per bin, flattened in
    * bin order; data = the (min, max) pair per resampled waveform
    * chunk, flattened in (spike, chunk) order; samplePeriod = the
    * pixel width (µs); pointsPerEvent = chunks per spike.
    *
    * Scale note: like toSegments, input rows are pixel/spike-page
    * scale (bounded by the requested render width per channel), so
    * the per-channel collect is summary-scale by construction.
    */
  def toEventMessages(
    spark: SparkSession,
    eventBins: DataFrame,
    waveforms: DataFrame,
    pageStart: Long,
    pageEnd: Long,
    samplePeriodUs: Long,
    pointsPerEvent: Int
  ): Dataset[(String, Array[Byte])] = {
    import spark.implicits._
    val times = eventBins
      .groupBy(col("channel"))
      .agg(
        flatten(
          transform(
            array_sort(collect_list(struct(col("bucket"), col("avg_time"), col("n")))),
            x => array(x.getField("avg_time"), x.getField("n"))
          )
        ).as("times")
      )
    val spikes = waveforms
      .groupBy(col("channel"))
      .agg(
        flatten(
          transform(
            array_sort(collect_list(struct(col("wf"), col("chunk"), col("wmin"), col("wmax")))),
            x => array(x.getField("wmin"), x.getField("wmax"))
          )
        ).as("data")
      )
    times
      .join(spikes, Seq("channel"), "left")
      .select(
        col("channel"),
        col("times"),
        coalesce(col("data"), array().cast("array<double>")).as("data")
      )
      .as[(String, Seq[Long], Seq[Double])]
      .map { case (ch, ts, dt) =>
        ch -> SegmentProto.encodeEventMessage(
          SegmentProto.encodeEventFields(
            source = ch,
            pageStart = pageStart,
            pageEnd = pageEnd,
            samplePeriod = samplePeriodUs,
            pointsPerEvent = pointsPerEvent.toLong,
            times = ts,
            data = dt
          )
        )
      }
  }
}
