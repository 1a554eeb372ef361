package graft.streaming

import graft.functions.Butterworth
import graft.streaming.RealtimeResample.Segment
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's LIVE serve chain composed end to end in Structured
  * Streaming: raw ingest → hourly-grid close → montage pairing → IIR
  * filter cascade → pixel min/max downsample → continuity fill →
  * segment islands → `TimeSeriesMessage{segment}` wire frames — the
  * streaming twin of [[graft.operators.Filtering.hotPathWire]],
  * mirroring the reference's montage-active realtime flow
  * (server/TimeSeriesFlow.scala:244-397: buildMontage pairs the
  * channels, rangeQuery serves lead−secondary through channelFilters,
  * and each response leaves as a protobuf segment frame).
  *
  * Architecture: the montage/filter/pixel pipeline is ORDERED,
  * PER-VIRTUAL-CHANNEL state — exactly the shape Structured Streaming
  * assigns to one keyed stateful operator. Chaining four separate
  * stateful stages is both unsupported (flatMapGroupsWithState cannot
  * feed another stateful operator) and wasteful (three extra state
  * stores + shuffles for state that lives on the same key), so the
  * chain runs as ONE `flatMapGroupsWithState` keyed by virtual
  * channel, composed from the SAME pure kernels the batch path uses —
  * [[Butterworth.State]]/reflectedPrewarm, the detAvg decimal-mean
  * discipline, fillGaps clamping and the toSegments island/cap
  * grammar — so micro-batch frames decode byte-equal to
  * hotPathWire's batch output on the consumed prefix (asserted by
  * RealtimeServeSpec).
  *
  * Ordering contract (the realtime ingest model, as in the reference's
  * websocket flow): each RAW channel's samples arrive in
  * non-decreasing time order across micro-batches. A side's grid
  * bucket closes when that side first sees a later bucket; a virtual
  * sample emits when BOTH sides of its pair have closed the bucket
  * (buckets where either side has no data are montage gaps, exactly
  * like the batch equi-join). Everything downstream — filter resets
  * on gaps, pixel closure, island/cap segmentation, the
  * one-pixel-lookahead continuity clamp — advances on closure, so the
  * emitted prefix is always final (no retractions).
  *
  * Quiescence is INTENTIONALLY not a close signal: a buffered block
  * shorter than padLength (and the open pixel above it) is withheld
  * until data advances past it, even if the channel goes silent
  * forever. A wall-clock timeout flush would break both invariants
  * above — the flushed tail is filtered with short-block prewarm, so
  * if the channel later resumes inside the gap window the emitted
  * bytes would differ from what the batch twin computes over the full
  * block (a retraction). A producer that wants the tail served closes
  * the stream the way the reference's websocket flow does: emit one
  * final past-gap sample (any t > lastT + gap), which flushes the
  * pending short block and closes the pixel deterministically.
  *
  * State per key is O(pad + cap): the open-bucket accumulators of the
  * two sides (bounded by inter-channel skew), ≤ padLength pending
  * prewarm samples, one open pixel, and ≤ cap+1 closed pixels
  * awaiting their lookahead — constant for a fixed configuration, so
  * the state store stays tiny no matter how long the stream runs.
  */
object RealtimeServe {

  case class Sample(channel: String, t: Long, v: Double)
  case class Tagged(vchannel: String, side: Int, t: Long, v: Double)
  case class Frame(channel: String, startTs: Long, nrPoints: Int, wire: Array[Byte])

  /** Exact-decimal bucket accumulator: the running sum is carried as a
    * plain string rendering of the scale-10 decimal (exact, encoder-
    * friendly), matching the batch detAvg DECIMAL(27,10) route.
    */
  case class BucketAcc(bucket: Long, sum: String, cnt: Long)
  case class Pixel(bucket: Long, vmin: Double, vmax: Double)

  case class ServeState(
    aMaxBucket: Long,
    bMaxBucket: Long,
    aOpen: Seq[BucketAcc],
    bOpen: Seq[BucketAcc],
    fedThrough: Long,
    warmed: Boolean,
    v1: Seq[Double],
    v2: Seq[Double],
    lastT: Long,
    pending: Seq[(Long, Double)],
    pixBucket: Long,
    pixMin: Double,
    pixMax: Double,
    pixHas: Boolean,
    closed: Seq[Pixel]
  )

  private val NoBucket = Long.MinValue

  private def emptyState = ServeState(
    NoBucket, NoBucket, Nil, Nil, NoBucket,
    warmed = false, Nil, Nil, Long.MinValue, Nil,
    0L, 0.0, 0.0, pixHas = false, Nil
  )

  /** Double → exact scale-10 decimal, the Spark cast(double as
    * DECIMAL(27,10)) semantic (canonical toString rendering, HALF_UP).
    */
  private def dec10(v: Double): java.math.BigDecimal =
    new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(10, java.math.RoundingMode.HALF_UP)

  /** Spark round(x, 6): HALF_UP on the canonical rendering. */
  private def round6(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue

  implicit val taggedEncoder: Encoder[Tagged] = Encoders.product[Tagged]
  implicit val frameEncoder: Encoder[Frame] = Encoders.product[Frame]
  implicit val stateEncoder: Encoder[ServeState] = Encoders.product[ServeState]
  implicit val stringEncoder: Encoder[String] = Encoders.STRING

  /** Serve `samples` through the full chain. `pixelUs` is the
    * REQUESTED pixel; like the batch path, the serve falls back to
    * pixel = grid step when the virtual-channel rate is too low to
    * resample (query/BaseTimeSeriesQuery.scala:58-96 via
    * [[graft.operators.Timeseries.shouldResample]]).
    */
  def serve(
    samples: Dataset[Sample],
    pairs: Seq[(String, String)],
    bucketUs: Long,
    pixelUs: Long,
    cascade: Butterworth.Cascade,
    padLength: Int,
    maxPointsPerSegment: Int = 1000
  ): Dataset[Frame] = {
    val servePixelUs =
      if (graft.operators.Timeseries.shouldResample(1e6 / bucketUs.toDouble, pixelUs)) pixelUs
      else bucketUs
    val bcPairs = pairs.toArray
    val tagged = samples.flatMap { s =>
      bcPairs.iterator.flatMap { case (lead, sec) =>
        val key = s"$lead<->$sec"
        (if (s.channel == lead) Iterator.single(Tagged(key, 0, s.t, s.v)) else Iterator.empty) ++
          (if (s.channel == sec) Iterator.single(Tagged(key, 1, s.t, s.v)) else Iterator.empty)
      }.toSeq
    }
    tagged
      .groupByKey(_.vchannel)
      .flatMapGroupsWithState[ServeState, Frame](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (key: String, rows: Iterator[Tagged], state: GroupState[ServeState]) =>
        var st = state.getOption.getOrElse(emptyState)
        val eng = new Butterworth.State(cascade)
        if (st.warmed) eng.load(st.v1.toArray, st.v2.toArray)

        // ---- stage 1: fold raw samples into per-side open buckets ----
        var aOpen = scala.collection.mutable.LinkedHashMap(st.aOpen.map(b => b.bucket -> b): _*)
        var bOpen = scala.collection.mutable.LinkedHashMap(st.bOpen.map(b => b.bucket -> b): _*)
        var aMax = st.aMaxBucket
        var bMax = st.bMaxBucket
        rows.foreach { r =>
          val b = math.floorDiv(r.t, bucketUs)
          val m = if (r.side == 0) aOpen else bOpen
          val acc = m.getOrElse(b, BucketAcc(b, "0", 0L))
          m.update(
            b,
            BucketAcc(b, new java.math.BigDecimal(acc.sum).add(dec10(r.v)).toPlainString, acc.cnt + 1L)
          )
          if (r.side == 0) aMax = math.max(aMax, b) else bMax = math.max(bMax, b)
        }

        // ---- stage 2-4 plumbing (filter → pixel → islands) ----
        var warmed = st.warmed
        var lastT = st.lastT
        var pending = st.pending.toVector
        var pixBucket = st.pixBucket
        var pixMin = st.pixMin
        var pixMax = st.pixMax
        var pixHas = st.pixHas
        var closed = st.closed.toVector
        val out = Vector.newBuilder[Frame]
        val gapUs = bucketUs

        def emitChunks(): Unit = {
          // pixels 0..closed.len-2 have their lookahead closed; group
          // them into the toSegments island/cap grammar and emit every
          // COMPLETE chunk
          var go = true
          while (go && closed.length >= 2) {
            var end = 0 // inclusive chunk end candidate
            while (
              end < closed.length - 2 && end < maxPointsPerSegment - 1 &&
              closed(end + 1).bucket == closed(end).bucket + 1
            ) end += 1
            val capped = end == maxPointsPerSegment - 1
            val broke =
              end < closed.length - 1 && closed(end + 1).bucket != closed(end).bucket + 1
            if ((capped || broke) && end <= closed.length - 2) {
              val chunk = closed.slice(0, end + 1)
              val adj = chunk.zipWithIndex.map { case (p, i) =>
                val nxt = if (i + 1 <= end) closed(i + 1) else closed(end + 1)
                val fmin = if (p.vmin > nxt.vmax) nxt.vmax else p.vmin
                val fmax = if (p.vmax < nxt.vmin) nxt.vmin else p.vmax
                (fmin, fmax)
              }
              val seg = Segment(
                source = key,
                startTs = chunk.head.bucket * servePixelUs,
                samplePeriod = servePixelUs.toDouble,
                requestedSamplePeriod = servePixelUs,
                isMinMax = true,
                segmentType = "continuous",
                nrPoints = chunk.length,
                data = adj.flatMap(p => Seq(p._1, p._2))
              )
              out += Frame(
                key,
                seg.startTs,
                seg.nrPoints,
                graft.sources.SegmentProto.encodeTimeSeriesMessage(seg)
              )
              closed = closed.drop(end + 1)
            } else go = false
          }
        }

        def pixelFeed(t: Long, fv6: Double): Unit = {
          val pb = math.floorDiv(t, servePixelUs)
          if (!pixHas) { pixBucket = pb; pixMin = fv6; pixMax = fv6; pixHas = true }
          else if (pb == pixBucket) {
            if (fv6 < pixMin) pixMin = fv6
            if (fv6 > pixMax) pixMax = fv6
          } else {
            closed = closed :+ Pixel(pixBucket, pixMin, pixMax)
            emitChunks()
            pixBucket = pb; pixMin = fv6; pixMax = fv6
          }
        }

        def runFiltered(t: Long, v: Double): Unit = {
          val fv = eng.filter(v)
          lastT = t
          pixelFeed(t, round6(fv))
        }

        def flushPendingShortBlock(): Unit = {
          // the open block ended before reaching padLength samples:
          // prewarm from the block's own reflected head (the batch
          // short-block path) and filter it through
          if (pending.nonEmpty) {
            eng.reset()
            Butterworth
              .reflectedPrewarm(pending.map(_._2).toArray, padLength)
              .foreach(eng.filter)
            pending.foreach { case (t, v) => runFiltered(t, v) }
            pending = Vector.empty
          }
        }

        def feed(t: Long, v: Double): Unit = {
          if (warmed) {
            if (lastT != Long.MinValue && t - lastT > gapUs) {
              // gap: the live block ends; start buffering a new one
              warmed = false
              pending = Vector((t, v))
              lastT = t
            } else runFiltered(t, v)
          } else {
            if (pending.nonEmpty && t - pending.last._1 > gapUs) {
              // the buffered block ended short — filter it, then the
              // new block starts buffering
              flushPendingShortBlock()
              warmed = false
              pending = Vector((t, v))
            } else pending = pending :+ ((t, v))
            lastT = t
            if (pending.length >= padLength) {
              // enough head: reflected prewarm = first padLength
              // reversed (the batch long-block path), then the head
              // itself filters through
              eng.reset()
              pending.take(padLength).map(_._2).reverse.foreach(eng.filter)
              val head = pending
              pending = Vector.empty
              warmed = true
              head.foreach { case (ht, hv) => runFiltered(ht, hv) }
            }
          }
        }

        // ---- stage 2: close joint buckets up to the pair watermark ----
        val watermark = math.min(
          if (aMax == NoBucket) NoBucket else aMax - 1,
          if (bMax == NoBucket) NoBucket else bMax - 1
        )
        if (watermark > st.fedThrough) {
          // walk only the buckets that EXIST (ascending): absent
          // buckets produce no virtual sample anyway, and the filter's
          // gap test runs on time deltas, so skipping them is free
          val ks = (aOpen.keySet ++ bOpen.keySet).filter(_ <= watermark).toSeq.sorted
          ks.foreach { b =>
            (aOpen.get(b), bOpen.get(b)) match {
              case (Some(l), Some(r)) =>
                val lm = new java.math.BigDecimal(l.sum).doubleValue / l.cnt
                val rm = new java.math.BigDecimal(r.sum).doubleValue / r.cnt
                feed(b * bucketUs, round6(lm - rm))
              case _ => () // montage gap: one side has no data here
            }
            aOpen.remove(b)
            bOpen.remove(b)
          }
        }

        val (nv1, nv2) = eng.save()
        state.update(
          ServeState(
            aMax,
            bMax,
            aOpen.values.toSeq,
            bOpen.values.toSeq,
            math.max(watermark, st.fedThrough),
            warmed,
            nv1.toSeq,
            nv2.toSeq,
            lastT,
            pending,
            pixBucket,
            pixMin,
            pixMax,
            pixHas,
            closed
          )
        )
        out.result().iterator
      }
  }
}
