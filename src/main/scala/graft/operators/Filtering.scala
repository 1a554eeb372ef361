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
  * Scale design (100 TB): one window pass keyed by channel assigns
  * block ids (gap split) and caps block length at `maxBlockSamples`
  * (oversized contiguous runs restart with the same reflected-prewarm
  * policy the reference applies at resets, bounding executor memory);
  * the blocks then shuffle by (channel, block, chunk) so thousands of
  * blocks filter concurrently regardless of channel skew. The IIR
  * kernel is the one genuinely sequential computation in the engine, so
  * it runs in typed flatMapSortedGroups rather than Catalyst
  * expressions.
  */
object Filtering {

  /** Apply a designed cascade to ts(channel, t, v): per contiguous
    * block (split where t - prev_t > gapUs), reset + reflect-prewarm +
    * filter. Emits (channel, t, v, fv).
    */
  def applyCascade(
    spark: SparkSession,
    tsIn: DataFrame,
    cascade: Butterworth.Cascade,
    padLength: Int,
    gapUs: Long,
    maxBlockSamples: Int = 1 << 22
  ): DataFrame = {
    import spark.implicits._

    // sources without per-row ids (blob-decoded uniform-rate data) get
    // a constant tie-break; t is unique per channel there
    val ts =
      if (tsIn.columns.contains("event_id")) tsIn
      else tsIn.withColumn("event_id", lit(0L))

    val byT = Window.partitionBy($"channel").orderBy($"t", $"event_id")
    val withBlocks = ts
      .select($"channel", $"t", $"v", $"event_id")
      .withColumn(
        "brk",
        when($"t" - lag($"t", 1).over(byT) > gapUs, 1L).otherwise(0L)
      )
      .withColumn(
        "block",
        sum($"brk").over(byT.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      // cap contiguous-run length: chunk restarts filter state with the
      // reference's reset+prewarm policy, keeping executor memory
      // bounded (the row_number window is skipped entirely when no cap
      // is requested)
      .withColumn(
        "chunk",
        if (maxBlockSamples == Int.MaxValue) lit(0L)
        else
          ((row_number().over(
            Window.partitionBy($"channel", $"block").orderBy($"t", $"event_id")
          ) - 1) / maxBlockSamples).cast("long")
      )
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
}
