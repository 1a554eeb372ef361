package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** The reference's realtime ingest-resample path, re-expressed as a
  * pure kernel + a typed streaming map.
  *
  * Reference semantics (query/TimeSeriesQueryUtils.scala:208-285,
  * asserted by IngestSegmentSpec):
  *  - an ingest segment (channel, startTime, samplePeriod, data)
  *    resamples iff samplePeriod < realtimePixelDuration;
  *  - chunk count = round((end - start) / pixelDuration) with
  *    end = start + samplePeriod * n;
  *  - `cut` splits data into balanced chunks with boundaries at
  *    round(x·m/n) — NOT fixed-size groups — so chunk sizes differ by
  *    at most one and the resampled stream stays gap-free;
  *  - each chunk yields (min, max), flattened; the output samplePeriod
  *    is (end - start) / chunkCount.
  *
  * This per-message transform is stateless, so in Structured Streaming
  * it is a simple typed map — no state store, no watermark required;
  * it composes with RealtimeDownsample's windowed aggregation for
  * cross-segment views.
  */
object RealtimeResample {

  case class IngestSegment(channel: String, startTime: Long, samplePeriod: Double, data: Seq[Double])

  case class Segment(
    source: String,
    startTs: Long,
    samplePeriod: Double,
    requestedSamplePeriod: Long,
    isMinMax: Boolean,
    segmentType: String,
    nrPoints: Int,
    data: Seq[Double]
  )

  /** Balanced split with boundaries at round(x·m/n) — reference `cut`
    * (query/TimeSeriesQueryUtils.scala:208-226).
    */
  def cut[A](xs: Vector[A], n: Int): Vector[Vector[A]] = {
    val m = xs.length
    val targets = (0 to n).map(x => math.round((x.toDouble * m) / n).toInt)
    targets
      .sliding(2)
      .collect { case Seq(i, j) => xs.slice(i, j) }
      .toVector
  }

  /** Min/max per balanced chunk, skipping empty chunks. */
  def resample(data: Vector[Double], sampleCount: Int): Seq[(Double, Double)] =
    if (data.isEmpty) Seq.empty
    else cut(data, sampleCount).collect { case c if c.nonEmpty => (c.min, c.max) }

  /** Per-segment resample decision + transform — reference
    * resampleMessage (query/TimeSeriesQueryUtils.scala:243-285).
    */
  def resampleMessage(ingest: IngestSegment, realtimePixelDuration: Long): Segment = {
    val shouldResample = ingest.samplePeriod < realtimePixelDuration
    if (shouldResample) {
      val data = ingest.data.toVector
      val endTime = (ingest.startTime + ingest.samplePeriod * data.size).toLong
      val chunkCount = Math.round((endTime - ingest.startTime) / realtimePixelDuration).toInt
      val resampled = resample(data, chunkCount).flatMap(p => List(p._1, p._2))
      Segment(
        source = ingest.channel,
        startTs = ingest.startTime,
        samplePeriod = (endTime - ingest.startTime) / chunkCount.toDouble,
        requestedSamplePeriod = realtimePixelDuration,
        isMinMax = true,
        segmentType = "realtime",
        nrPoints = chunkCount,
        data = resampled
      )
    } else {
      Segment(
        source = ingest.channel,
        startTs = ingest.startTime,
        samplePeriod = ingest.samplePeriod,
        requestedSamplePeriod = realtimePixelDuration,
        isMinMax = false,
        segmentType = "realtime",
        nrPoints = ingest.data.length,
        data = ingest.data
      )
    }
  }

  implicit val segmentEncoder: Encoder[Segment] = Encoders.product[Segment]

  /** Streaming (or batch) application: one output Segment per ingest
    * message.
    */
  def stream(ingest: Dataset[IngestSegment], realtimePixelDuration: Long): Dataset[Segment] =
    ingest.map(resampleMessage(_, realtimePixelDuration))

  /** The reference's realtime path composed END TO END: ingest →
    * resample → protobuf wire frame. The reference emits one
    * `TimeSeriesMessage{segment}` per realtime message
    * (server/TimeSeriesFlow.scala:390-397); this is that emission as
    * a streaming sink stage — each micro-batch row is the exact bytes
    * a reference websocket consumer would parse.
    */
  def wireStream(ingest: Dataset[IngestSegment], realtimePixelDuration: Long): Dataset[Array[Byte]] = {
    implicit val binEnc: Encoder[Array[Byte]] = Encoders.BINARY
    stream(ingest, realtimePixelDuration)
      .map(s => graft.sources.SegmentProto.encodeTimeSeriesMessage(s))
  }
}
