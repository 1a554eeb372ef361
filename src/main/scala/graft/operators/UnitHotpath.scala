package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The unit-channel hot path, composed end to end — the batch twin of
  * [[Filtering.hotPathWire]] for neural-unit (spike) channels: range →
  * event trim/bin → conditional spike-waveform group/resample →
  * event-message assembly → `TimeSeriesMessage{event}` wire frames.
  *
  * Mirrors the reference's unit serve (reference
  * query/TimeSeriesUnitQueryRawHttp.scala:104-160 with
  * query/WsClient.scala:85-139):
  *
  *  - the TIMES stream is the page's event summary — events trimmed to
  *    [start, end) and binned at the pixel width with
  *    avgTime = (minTime + maxTime) / 2 and a count per bin
  *    ([[Timeseries.eventBins]], the oracled ts_eventbin semantic);
  *  - the SPIKES stream is sent only when
  *    `pixelWidth * sendSpikeThreshold < spikeDuration`
  *    (TimeSeriesUnitQueryRawHttp.scala:77-79); when sent, the blob
  *    stream is grouped into waveforms of `spikeDataPointCount`
  *    samples and each is resampled to
  *    `chunkCount = spikeDuration / pixelWidth` (min, max) pairs
  *    (WsClient.scala:91-96 — [[Timeseries.spikeWaveforms]]);
  *  - spikes are trimmed to the page's EVENT-INDEX range, the batch
  *    analog of `trimToRange((first.minIndex, last.maxIndex), spikes)`
  *    (TimeSeriesUnitQueryRawHttp.scala:104-107): waveform w overlaps
  *    the page's sample range [minIdx, maxIdx] iff
  *    w ∈ [minIdx div c, maxIdx div c] — both ends inclusive, like the
  *    reference's dropWhile(< start) / takeWhile(<= end);
  *  - `limit` reproduces the reference's three branches
  *    (TimeSeriesUnitQueryRawHttp.scala:54-72): None serves the page
  *    unlimited; Some(0) answers one Event per channel carrying only
  *    the page coordinates; Some(n) takes the first n bins AND the
  *    first n waveforms (`times.take(limit)` / `spikes.take(limit)`).
  *
  * Scale shape: the page trim is a data filter pushed to the scan; the
  * event-index bounds are ONE partial aggregation over the stream
  * (conditional counts — no global rank); binning and waveform
  * grouping shuffle by (channel, bucket) / (channel, waveform) — never
  * channel alone over the data; the per-channel index-bound relation
  * is channel-grain and broadcasts back over the waveform stream; the
  * message assembly collects only pixel/waveform-chunk-scale rows (the
  * [[graft.sources.SegmentSink.toEventMessages]] argument).
  */
object UnitHotpath {

  /** Reference default (resources/application.conf:37). */
  val SendSpikeThreshold: Long = 10L

  /** Fixed unit request: the ts_hotpath window, hourly pixel, the
    * ts_waveforms waveform size, and a 12-pixel spike duration — so
    * `pixelUs * 10 < spikeDurationUs` holds and the serve exercises
    * the spike branch with chunkCount = 12.
    */
  val UnitPixelUs: Long = Timeseries.BucketUs
  val UnitSpikeDataPointCount: Int = 100
  val UnitSpikeDurationUs: Long = 12L * Timeseries.BucketUs

  /** One `TimeSeriesMessage{event}` wire frame per channel for the
    * page [startUs, endUs). `tsIn` is the FULL stream (channel, t, v):
    * like the reference — where the blob source is not range-trimmed,
    * only the spike list is index-trimmed — waveform boundaries are
    * global, so a page never shifts how samples group into waveforms.
    */
  def unitHotPathWire(
    spark: SparkSession,
    tsIn: DataFrame,
    startUs: Long,
    endUs: Long,
    pixelUs: Long,
    spikeDataPointCount: Int,
    spikeDurationUs: Long,
    limit: Option[Long] = None,
    sendSpikeThreshold: Long = SendSpikeThreshold
  ): DataFrame = {
    import spark.implicits._
    val ts = tsIn.select(col("channel"), col("t"), col("v"))
    if (limit.contains(0L)) {
      // Some(0): page coordinates only, one Event per channel
      return ts
        .select(col("channel"))
        .distinct()
        .as[String]
        .map { ch =>
          (ch, graft.sources.SegmentProto.encodeEventMessage(
            graft.sources.SegmentProto.encodeEventFields(
              source = ch,
              pageStart = startUs,
              pageEnd = endUs,
              samplePeriod = pixelUs
            )
          ))
        }
        .toDF("channel", "wire")
    }
    val page = ts.filter(col("t") >= startUs && col("t") < endUs)
    val binsAll = Timeseries.eventBins(page, pixelUs)
    val bins = limit.fold(binsAll) { n =>
      // bins are pixel-grain summary rows — the rank window runs over
      // the reduced per-page relation, not the data stream
      binsAll
        .withColumn(
          "__r",
          row_number().over(Window.partitionBy(col("channel")).orderBy(col("bucket")))
        )
        .filter(col("__r") <= n)
        .drop("__r")
    }
    val sendSpikes = pixelUs * sendSpikeThreshold < spikeDurationUs
    val chunkCount = (spikeDurationUs / pixelUs).toInt
    val wfs =
      if (!sendSpikes)
        spark.emptyDataset[(String, Long, Long, Double, Double)]
          .toDF("channel", "wf", "chunk", "wmin", "wmax")
      else {
        // the page's event-index bounds per channel, from ONE partial
        // agg of conditional counts: the first in-page sample has
        // 0-based index count(t < start), the last count(t < end) - 1
        val idx = ts
          .groupBy(col("channel"))
          .agg(
            sum(when(col("t") < startUs, 1L).otherwise(0L)).as("__lo"),
            sum(when(col("t") < endUs, 1L).otherwise(0L)).as("__hi1")
          )
          .filter(col("__hi1") > col("__lo"))
          .select(
            col("channel"),
            expr(s"__lo div $spikeDataPointCount").as("__wlo"),
            expr(s"(__hi1 - 1) div $spikeDataPointCount").as("__whi")
          )
        val trimmed = Timeseries
          .spikeWaveforms(spark, ts, spikeDataPointCount, chunkCount)
          .join(broadcast(idx), "channel")
          .filter(col("wf") >= col("__wlo") && col("wf") <= col("__whi"))
        limit
          .fold(trimmed)(n => trimmed.filter(col("wf") < col("__wlo") + n))
          .select(col("channel"), col("wf"), col("chunk"), col("wmin"), col("wmax"))
      }
    graft.sources.SegmentSink
      .toEventMessages(
        spark,
        bins,
        wfs,
        pageStart = startUs,
        pageEnd = endUs,
        samplePeriodUs = pixelUs,
        pointsPerEvent = if (sendSpikes) chunkCount else 0
      )
      .toDF("channel", "wire")
  }

  /** The composed chain as a driver query: wire frames summarized to
    * (channel, wire length, wire md5) — rows-only like ts_hotpath (the
    * protobuf stage is not ANSI-SQL-expressible; byte-exactness is
    * carried by the end-to-end golden spec against the sequential
    * kernel).
    */
  def tsUnitHotpath(spark: SparkSession, dir: String): DataFrame =
    unitHotPathWire(
      spark,
      Tables.ts(spark, dir),
      Filtering.HotpathRangeStartUs,
      Filtering.HotpathRangeEndUs,
      UnitPixelUs,
      UnitSpikeDataPointCount,
      UnitSpikeDurationUs
    ).select(
      col("channel"),
      length(col("wire")).as("wire_bytes"),
      md5(col("wire")).as("wire_md5")
    ).orderBy(col("channel"))
}
