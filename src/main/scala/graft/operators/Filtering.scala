package graft.operators

import graft.Tables
import graft.functions.Butterworth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed application of per-channel IIR (Butterworth) filters —
  * the reference's streaming filter path re-expressed block-parallel.
  *
  * Reference semantics (query/TimeSeriesQueryRawHttp.scala:150-313):
  * the filter runs sequentially per channel, but RESETS whenever the
  * next block of data is not contiguous with the last (gap > threshold),
  * and re-warms from a clean state by filtering a reflected copy of the
  * block's first `padLength` samples before emitting. That reset policy
  * is exactly what licenses parallelism: every contiguous block is an
  * independent unit of sequential work.
  *
  * Scale design (100 TB): block assignment is TWO-PHASE — gap breaks,
  * block ids, and within-block positions are all computed with
  * (channel, time-bucket)-local windows plus a per-bucket summary
  * (one row per non-empty bucket) that carries boundary state across
  * buckets via a per-channel window over the tiny summary relation,
  * broadcast back (the same stitch Timeseries' two-phase operators
  * use) — so NO task ever sorts a whole channel. Block length is
  * capped at `maxBlockSamples` (oversized contiguous runs restart with
  * the same reflected-prewarm policy the reference applies at resets,
  * bounding executor memory); the blocks then shuffle by
  * (channel, block, chunk) so thousands of blocks filter concurrently
  * regardless of channel skew. The IIR kernel is the one genuinely
  * sequential computation in the engine, so it runs in typed
  * flatMapSortedGroups rather than Catalyst expressions.
  */
object Filtering {

  /** Apply a designed cascade to ts(channel, t, v): per contiguous
    * block (split where t - prev_t > gapUs), reset + reflect-prewarm +
    * filter. Emits (channel, t, v, fv).
    *
    * `stitchBucketUs` is the two-phase summary granularity — it must be
    * coarse enough that each bucket holds many samples (the summary is
    * one row per non-empty bucket) and is purely a parallelism knob:
    * results are identical for any width.
    */
  def applyCascade(
    spark: SparkSession,
    tsIn: DataFrame,
    cascade: Butterworth.Cascade,
    padLength: Int,
    gapUs: Long,
    maxBlockSamples: Int = 1 << 22,
    stitchBucketUs: Long = 86400000000L
  ): DataFrame = {
    import spark.implicits._

    // sources without per-row ids (blob-decoded uniform-rate data) get
    // a constant tie-break; t is unique per channel there
    val ts =
      if (tsIn.columns.contains("event_id")) tsIn
      else tsIn.withColumn("event_id", lit(0L))

    val bkted = ts
      .select($"channel", $"t", $"v", $"event_id")
      .withColumn("__bkt", floor($"t" / lit(stitchBucketUs)).cast("long"))
    val wLoc = Window.partitionBy($"channel", $"__bkt").orderBy($"t", $"event_id")
    val wLocRun = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSum = Window.partitionBy($"channel").orderBy($"__bkt")
    val wSumPrev = wSum.rowsBetween(Window.unboundedPreceding, -1)

    // Phase A: each bucket's last timestamp, lagged per channel over
    // the tiny summary → the predecessor of every bucket's FIRST row.
    val prevT = bkted
      .groupBy($"channel", $"__bkt")
      .agg(max($"t").as("__last_t"))
      .select($"channel", $"__bkt", lag($"__last_t", 1).over(wSum).as("__pb_prev_t"))

    // Local pass: gap breaks, local block index (running break count),
    // local row number, and the local row number of the latest break —
    // all within (channel, __bkt), arbitrarily parallel.
    val local = bkted
      .join(broadcast(prevT), Seq("channel", "__bkt"))
      .withColumn("__rnl", row_number().over(wLoc).cast("long"))
      .withColumn(
        "__prev_t",
        when($"__rnl" === 1L, $"__pb_prev_t").otherwise(lag($"t", 1).over(wLoc))
      )
      .withColumn("__brk", when($"t" - $"__prev_t" > gapUs, 1L).otherwise(0L))
      .withColumn("__blkl", sum($"__brk").over(wLocRun))
      .withColumn("__bsrnl", max(when($"__brk" === 1L, $"__rnl")).over(wLocRun))

    // Phase B: per-bucket totals → per-channel prefixes over the tiny
    // summary: row-count prefix (globalizes row numbers), break-count
    // prefix (globalizes block ids), and the carry of the latest
    // block-start row number from preceding buckets (for rows whose
    // block began before their bucket) — asofJoin's carry trick.
    val prefixed = local
      .groupBy($"channel", $"__bkt")
      .agg(
        count(lit(1)).as("__cnt"),
        sum($"__brk").as("__bsum"),
        max(when($"__brk" === 1L, $"__rnl")).as("__mbr")
      )
      // window expressions aliased directly (PlanSpec's __pb_ marker on
      // the Window node); nulls from empty preceding-frames coalesce at
      // use sites below
      .withColumn("__pb_rnprefix0", sum($"__cnt").over(wSumPrev))
      .withColumn("__pb_rnprefix", coalesce($"__pb_rnprefix0", lit(0L)))
      .withColumn("__pb_blkprefix0", sum($"__bsum").over(wSumPrev))
      .withColumn("__pb_blkprefix", coalesce($"__pb_blkprefix0", lit(0L)))
      .withColumn("__gbr", $"__mbr" + $"__pb_rnprefix")
      .withColumn("__pb_carry", last($"__gbr", ignoreNulls = true).over(wSumPrev))
      .select($"channel", $"__bkt", $"__pb_rnprefix", $"__pb_blkprefix", $"__pb_carry")

    // cap contiguous-run length: chunk restarts filter state with the
    // reference's reset+prewarm policy. Within-block position = global
    // row number − the block's first row number (its latest break, or
    // the channel's first row when no break precedes).
    val chunkCol =
      if (maxBlockSamples == Int.MaxValue) lit(0L)
      else {
        val rn = $"__rnl" + $"__pb_rnprefix"
        val blockStart = coalesce($"__bsrnl" + $"__pb_rnprefix", $"__pb_carry", lit(1L))
        ((rn - blockStart) / maxBlockSamples).cast("long")
      }
    val withBlocks = local
      .join(broadcast(prefixed), Seq("channel", "__bkt"))
      .withColumn("block", $"__blkl" + $"__pb_blkprefix")
      .withColumn("chunk", chunkCol)
      .select($"channel", $"block", $"chunk", $"t", $"v", $"event_id")
      .as[(String, Long, Long, Long, Double, Long)]

    val bcCascade = spark.sparkContext.broadcast(cascade)
    withBlocks
      .groupByKey { case (ch, blk, chk, _, _, _) => (ch, blk, chk) }
      .flatMapSortedGroups($"t", $"event_id") { case ((ch, _, _), rows) =>
        val arr = rows.toArray
        val data = new Array[Double](arr.length)
        var i = 0
        while (i < arr.length) { data(i) = arr(i)._5; i += 1 }
        val out = Butterworth.filterBlock(bcCascade.value, data, padLength)
        arr.iterator.zipWithIndex.map { case ((_, _, _, t, v, _), j) => (ch, t, v, out(j)) }
      }
      .toDF("channel", "t", "v", "fv")
  }

  // ---------------------------------------------------------------------
  // Fixed driver query (rows-only: IIR recursion is not ANSI-SQL
  // expressible; correctness is covered by ButterworthSpec golden values
  // and FilteringSpec's sequential-equivalence check)
  // ---------------------------------------------------------------------

  /** Design used by the fixed query: the reference FilterSpec's notch
    * filter, bandstop(order 4, rate 250, center 50, width 3); pad from
    * the reference transient estimate with maxFilterFreq = 50 + 3.
    */
  val FixedCascade: Butterworth.Cascade = Butterworth.bandStop(4, 250.0, 50.0, 3.0)
  val FixedPad: Int = Butterworth.transientLength(4, 53.0, 250.0)

  def tsButterworth(spark: SparkSession, dir: String): DataFrame =
    applyCascade(
      spark,
      Tables.ts(spark, dir),
      FixedCascade,
      FixedPad,
      Timeseries.GapUs
    ).select(col("channel"), col("t"), round(col("fv"), 6).as("fv"))
      .orderBy(col("channel"), col("t"))

  /** Montage→filter chain: virtual channels (lead − secondary on the
    * aligned sample grid) flow straight into the Butterworth cascade —
    * the reference's filtered-montage streaming path applies the same
    * filter flow to montaged output as to raw channels
    * (query/TimeSeriesQueryRawHttp.scala:326-334). The montage output
    * (channel, t, v) IS applyCascade's input contract, so composition
    * is a function call: no re-keying, the filter blocks shuffle by the
    * virtual channel exactly as they would for physical ones. Gap
    * threshold is ONE grid step (applyCascade splits on t−prev >
    * gapUs, strictly): consecutive hourly grid points sit exactly
    * BucketUs apart and stay contiguous, while a single missing bucket
    * (2·BucketUs) resets filter state.
    */
  def tsMontageFilter(spark: SparkSession, dir: String): DataFrame =
    applyCascade(
      spark,
      Timeseries.tsMontageAligned(spark, dir),
      FixedCascade,
      FixedPad,
      gapUs = Timeseries.BucketUs
    ).select(col("channel"), col("t"), round(col("fv"), 6).as("fv"))
      .orderBy(col("channel"), col("t"))

  // ---------------------------------------------------------------------
  // The reference's actual serving workload composed end to end
  // ---------------------------------------------------------------------

  /** The reference hot path — what one websocket request actually
    * costs — as ONE chain: time-range read → grid montage (virtual
    * channels) → Butterworth cascade → shouldResample decision →
    * min/max downsample → fillGaps render pass → Segment assembly →
    * protobuf wire frames (server/TimeSeriesFlow.scala's
    * request-to-frame flow, batch-expressed). Returns one row per
    * emitted Segment with its exact wire bytes.
    *
    * The resample decision is the reference's per-request branch
    * (query/BaseTimeSeriesQuery.scala:58-96): the virtual channels
    * live on the `bucketUs` grid, so their rate is 1e6/bucketUs;
    * when `shouldResample` rejects (under ~3 samples per pixel) the
    * serve falls back to pixel = grid step, where each bucket holds
    * exactly one sample and the min/max band degenerates to the raw
    * stream — the raw branch in the same segment vocabulary.
    *
    * Scale shape: range prunes at the scan; the chain's data-grain
    * shuffles are the grid aggregation, the montage equi-join, the
    * filter's block shuffle, and the downsample aggregation — each
    * keyed by (channel, time), none corpus-global; everything after
    * the downsample is pixel-scale by construction (the SegmentSink
    * argument).
    */
  def hotPathWire(
    spark: SparkSession,
    tsIn: DataFrame,
    pairs: Seq[(String, String)],
    bucketUs: Long,
    pixelUs: Long,
    cascade: Butterworth.Cascade = FixedCascade,
    padLength: Int = FixedPad
  ): DataFrame = {
    import spark.implicits._
    val virt = Timeseries.montageAlignedGrid(spark, tsIn, pairs, bucketUs)
    val filtered = applyCascade(spark, virt, cascade, padLength, gapUs = bucketUs)
      .select(col("channel"), col("t"), round(col("fv"), 6).as("v"))
    val rate = 1e6 / bucketUs.toDouble
    val servePixel = if (Timeseries.shouldResample(rate, pixelUs)) pixelUs else bucketUs
    val down = Timeseries.downsample(filtered, servePixel)
    graft.sources.SegmentSink
      .toSegments(spark, down, servePixel, fillContinuity = true)
      .map(s => (s.source, s.startTs, s.nrPoints, graft.sources.SegmentProto.encodeTimeSeriesMessage(s)))
      .toDF("channel", "start_ts", "nr_points", "wire")
  }

  /** Fixed request window (first ~15 days of the event month) — the
    * [range] stage; pushed into the parquet scan as a t predicate.
    */
  val HotpathRangeStartUs: Long = 1704067200000000L
  val HotpathRangeEndUs: Long = 1705363200000000L

  /** 4 grid steps per pixel → shouldResample(1e6/BucketUs, pixel) is
    * true (ratio 4 > 3): the fixed request serves the downsampled
    * branch, like the reference's default zoomed-out view.
    */
  val HotpathPixelUs: Long = 4L * Timeseries.BucketUs

  /** The composed chain as a driver query: wire frames summarized to
    * (channel, start_ts, nr_points, wire length, wire md5) — rows-only
    * (the IIR stage is not ANSI-SQL-expressible; byte-exactness is
    * carried by the end-to-end golden spec against the sequential
    * kernels).
    */
  def tsHotpath(spark: SparkSession, dir: String): DataFrame =
    hotPathWire(
      spark,
      Tables
        .ts(spark, dir)
        .filter(col("t") >= HotpathRangeStartUs && col("t") < HotpathRangeEndUs),
      Timeseries.MontagePairs,
      Timeseries.BucketUs,
      HotpathPixelUs
    ).select(
      col("channel"),
      col("start_ts"),
      col("nr_points"),
      length(col("wire")).as("wire_bytes"),
      md5(col("wire")).as("wire_md5")
    ).orderBy(col("channel"), col("start_ts"))
}
