package graft.streaming

import graft.functions.Butterworth
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-channel IIR filtering with persistent state — the
  * Structured Streaming analog of the reference's session filter map
  * (server/FilterStateTracker.scala + TimeSeriesFlow channelFilters):
  * each channel owns a live filter cascade whose delay-line state
  * carries across incoming batches, and the filter RESETS with a
  * reflected prewarm whenever the next samples are not contiguous with
  * the last seen timestamp (reference: query/TimeSeriesQueryRawHttp
  * .scala:158-177 resets when the gap exceeds the threshold).
  *
  * State per key is O(2 × biquads) doubles + one timestamp — constant,
  * so the state store stays tiny no matter how long the stream runs.
  */
object StreamingFilter {

  case class Sample(channel: String, t: Long, v: Double)
  case class Filtered(channel: String, t: Long, v: Double, fv: Double)

  /** Persisted per-channel state: biquad delay lines, last timestamp,
    * and the id of the filter CONFIGURATION that produced them.
    */
  case class FilterState(v1: Seq[Double], v2: Seq[Double], lastT: Long, configId: Long)

  implicit val filteredEncoder: Encoder[Filtered] = Encoders.product[Filtered]
  implicit val sampleEncoder: Encoder[Sample] = Encoders.product[Sample]
  implicit val stateEncoder: Encoder[FilterState] = Encoders.product[FilterState]
  implicit val stringEncoder: Encoder[String] = Encoders.STRING

  /** Apply `cascade` to a stream of samples grouped by channel. Samples
    * within a batch are processed in t order; state persists across
    * batches; a gap > gapUs (vs the last processed timestamp) resets
    * the filter and re-warms it from the new block's reflected head.
    *
    * `configId` identifies the filter CONFIGURATION. The reference
    * swaps a channel's filter mid-session by replacing its tracker
    * with a freshly-built cascade (server/TimeSeriesFlow.scala:914
    * put(channelId, buildFilter(…)); state machinery in
    * server/FilterStateTracker.scala:19-97) — the old delay lines
    * never leak into the new filter. Operationally a swap here is a
    * query restart with the new cascade and a bumped configId over the
    * same checkpoint: persisted state stamped with a different
    * configId is discarded, so the first post-swap block resets and
    * re-prewarms exactly like a fresh start.
    */
  def apply(
    samples: Dataset[Sample],
    cascade: Butterworth.Cascade,
    padLength: Int,
    gapUs: Long,
    configId: Long = 0L
  ): Dataset[Filtered] = {
    val nBq = cascade.biquads.length
    samples
      .groupByKey(_.channel)
      .flatMapGroupsWithState[FilterState, Filtered](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (channel: String, rows: Iterator[Sample], state: GroupState[FilterState]) =>
        val batch = rows.toArray.sortBy(s => (s.t, s.v))
        if (batch.isEmpty) Iterator.empty
        else {
          val st = new Butterworth.State(cascade)
          var lastT = Long.MinValue
          var warmed = false
          // state from another configId is a filter/montage swap: its
          // delay lines belong to the OLD cascade — leave this run
          // clean so the first block resets + re-prewarms fresh
          state.getOption.filter(_.configId == configId).foreach { fs =>
            st.load(fs.v1.toArray, fs.v2.toArray)
            lastT = fs.lastT
            warmed = true
          }
          val out = new Array[Filtered](batch.length)
          var i = 0
          while (i < batch.length) {
            val s = batch(i)
            val gap = warmed && lastT != Long.MinValue && (s.t - lastT) > gapUs
            if (!warmed || gap) {
              // clean/reset state: reflected prewarm from THIS contiguous
              // block's head only (stop at the next intra-batch gap) —
              // matching the batch path and the reference's per-block policy
              st.reset()
              var j = i + 1
              while (j < batch.length && batch(j).t - batch(j - 1).t <= gapUs) j += 1
              val head = batch.slice(i, j).map(_.v)
              Butterworth.reflectedPrewarm(head, padLength).foreach(st.filter)
              warmed = true
            }
            out(i) = Filtered(s.channel, s.t, s.v, st.filter(s.v))
            lastT = s.t
            i += 1
          }
          val (v1, v2) = st.save()
          state.update(FilterState(v1.toSeq, v2.toSeq, lastT, configId))
          out.iterator
        }
      }
  }
}
