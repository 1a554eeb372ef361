package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training — the concat-and-chunk layout
  * every autoregressive pretraining pipeline runs last: documents are
  * concatenated in a canonical order and the token stream is cut into
  * fixed-length training sequences ("bins"). The operator assigns each
  * document its global token offset and the bin span it lands in, so a
  * downstream writer can materialize shards knowing exactly which docs
  * (and which parts of split docs) belong to every sequence.
  *
  * The core is a GLOBAL prefix sum over a corpus-scale relation —
  * exactly the computation a naive `Window.orderBy(doc_id)` with no
  * partitioning would serialize into one task. This implementation is
  * the classic two-phase distributed scan instead:
  *
  *   1. shard the corpus deterministically on the key itself
  *      (`doc_id div shardWidth`) and run the running sum PER SHARD —
  *      a partitioned window, parallel across shards;
  *   2. roll shard totals up to one row per shard (partial agg), turn
  *      them into exclusive shard base offsets, and broadcast-join the
  *      bases back.
  *
  * The only unpartitioned window runs over the shard-totals relation —
  * cardinality = number of shards (metadata scale, ~10⁶ rows for a
  * 10⁹-doc corpus at width 10³), the same driver-size argument as a
  * k-means centroid update. The corpus itself moves through exactly one
  * hash exchange (the shard window) and one broadcast join; the result
  * is bit-identical to the single-task global window for every
  * shardWidth, which the spec proves by sweeping widths.
  *
  * Reference framing: the reference chunks samples into fixed
  * pixel-width segments per channel (`TimeSeriesFlow.scala:
  * resampleMessage` cutting continuous data into chunks); this is the
  * corpus-scale analog over token streams.
  */
object Packing {

  /** Per-document packing assignment: global token offset and bin span.
    *
    * Output: (doc_id, n_tokens, t_offset, bin_first, bin_last, n_bins)
    * where bins are `seqLen`-token training sequences and a document
    * spanning `n_bins > 1` is split across consecutive sequences.
    * An empty document occupies zero tokens but is assigned the bin at
    * its offset point (span of max(n,1)-1 ≡ its own offset's bin).
    */
  def packSequences(docs: DataFrame, seqLen: Int, shardWidth: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(shardWidth > 0, s"shardWidth must be positive, got $shardWidth")
    val toks = docs.select(
      col("doc_id"),
      coalesce(size(expr(TextAnalysis.WordsSql)).cast("long"), lit(0L)).as("n_tokens"),
      expr(s"doc_id div ${shardWidth}L").as("shard")
    )
    // phase 1: parallel running sum within each deterministic shard
    val w = Window
      .partitionBy("shard")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = toks.withColumn("local_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
    // phase 2: shard totals -> exclusive base offsets (shard-count
    // cardinality; the lone unpartitioned window runs post-reduction)
    val wb = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    val bases = toks
      .groupBy("shard")
      .agg(sum(col("n_tokens")).as("shard_n"))
      .select(col("shard"), coalesce(sum(col("shard_n")).over(wb), lit(0L)).as("base"))
    local
      .join(broadcast(bases), "shard")
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("base") + col("local_off")).as("t_offset")
      )
      .withColumn("bin_first", expr(s"t_offset div ${seqLen}L"))
      .withColumn("bin_last", expr(s"(t_offset + greatest(n_tokens, 1L) - 1L) div ${seqLen}L"))
      .withColumn("n_bins", col("bin_last") - col("bin_first") + lit(1L))
  }

  def packSequencesQ(spark: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(spark, dir), seqLen = 128, shardWidth = 64L)

  val packSequencesSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    COALESCE(CAST(LEN(string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ')) AS BIGINT), 0) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS t_offset
      |  FROM t)
      |SELECT doc_id, n_tokens, CAST(t_offset AS BIGINT) AS t_offset,
      |  CAST(t_offset // 128 AS BIGINT) AS bin_first,
      |  CAST((t_offset + GREATEST(n_tokens, 1) - 1) // 128 AS BIGINT) AS bin_last,
      |  CAST((t_offset + GREATEST(n_tokens, 1) - 1) // 128 - t_offset // 128 + 1 AS BIGINT) AS n_bins
      |FROM c
      |ORDER BY doc_id""".stripMargin

  /** Per-bin composition report for the concat-and-chunk layout — the
    * cross-document attention-contamination curve (Zhao et al. 2024
    * "fewer truncations" line of work): concat-and-chunk wastes zero
    * padding but makes every bin that mixes documents attend across
    * unrelated contexts, and the standard diagnostic is exactly this
    * table — how many documents each training sequence mixes, and how
    * much of the sequence its DOMINANT document owns (main_frac → 1 =
    * clean, → 1/n_docs = fully contaminated). Pipelines weigh this
    * against the padding waste a no-split packer would pay.
    *
    * Scale shape: rides [[packSequences]]' two-phase prefix sum; the
    * bin explode adds ~⌈n/L⌉ rows per doc (≤ 2 for typical docs);
    * the rollup and the dominant-doc rank are keyed by BIN id — a
    * fine-grained corpus-scale key (a few docs per bin), never a
    * channel-alone window. Integer token arithmetic end to end;
    * main_frac is the one round-6 division.
    */
  def packBins(docs: DataFrame, seqLen: Int, shardWidth: Long): DataFrame = {
    val pk = packSequences(docs, seqLen, shardWidth)
    val l = lit(seqLen.toLong)
    val per = pk
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("t_offset"),
        explode(sequence(col("bin_first"), col("bin_last"))).as("bin")
      )
      .withColumn(
        "tok_in",
        least((col("bin") + 1) * l, col("t_offset") + col("n_tokens")) -
          greatest(col("bin") * l, col("t_offset"))
      )
      .filter(col("tok_in") > 0)
    val agg = per
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok_in")).as("n_tokens"))
    val main = per
      .withColumn(
        "__rn",
        row_number().over(
          Window.partitionBy(col("bin")).orderBy(col("tok_in").desc, col("doc_id"))
        )
      )
      .filter(col("__rn") === 1)
      .select(col("bin"), col("doc_id").as("main_doc"), col("tok_in").as("main_tokens"))
    agg
      .join(main, Seq("bin"))
      .select(
        col("bin"),
        col("n_docs"),
        col("n_tokens"),
        col("main_doc"),
        col("main_tokens"),
        round(col("main_tokens").cast("double") / col("n_tokens"), 6).as("main_frac")
      )
  }

  def packBinsQ(spark: SparkSession, dir: String): DataFrame =
    packBins(Tables.documents(spark, dir), seqLen = 128, shardWidth = 64L)
      .orderBy(col("bin"))

  /** Oracle: the pack prefix-sum CTE, the identical bin-span UNNEST
    * and integer overlap arithmetic, the same (tokens desc, doc asc)
    * dominant pick.
    */
  val packBinsSql: String =
    s"""WITH pk AS ($packSequencesSql),
       |per AS (
       |  SELECT doc_id, n_tokens, t_offset, u.bin AS bin,
       |    LEAST((u.bin + 1) * 128, t_offset + n_tokens)
       |      - GREATEST(u.bin * 128, t_offset) AS tok_in
       |  FROM pk, UNNEST(range(bin_first, bin_last + 1)) AS u(bin)),
       |pp AS (SELECT * FROM per WHERE tok_in > 0),
       |agg AS (
       |  SELECT bin, COUNT(*) AS n_docs, CAST(SUM(tok_in) AS BIGINT) AS n_tokens
       |  FROM pp GROUP BY bin),
       |main AS (
       |  SELECT bin, doc_id AS main_doc, CAST(tok_in AS BIGINT) AS main_tokens FROM (
       |    SELECT bin, doc_id, tok_in,
       |      ROW_NUMBER() OVER (PARTITION BY bin ORDER BY tok_in DESC, doc_id) AS rn
       |    FROM pp) t
       |  WHERE rn = 1)
       |SELECT CAST(agg.bin AS BIGINT) AS bin, agg.n_docs, agg.n_tokens,
       |  main.main_doc, main.main_tokens,
       |  ROUND(CAST(main.main_tokens AS DOUBLE) / agg.n_tokens, 6) AS main_frac
       |FROM agg JOIN main ON main.bin = agg.bin
       |ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------------
  // Token-balanced shard manifest (the distributed writer layout)
  // ---------------------------------------------------------------------

  /** Shard manifest over the canonical doc order: each document joins
    * the shard containing its global token offset, so shards carry
    * ~`targetTokens` tokens each and every shard is a CONTIGUOUS doc_id
    * range — the layout a fleet of shard writers needs to emit
    * training files independently (contiguity means a writer seeks one
    * range, and the manifest is the only coordination artifact).
    *
    * Scale shape: rides [[packSequences]]' two-phase distributed prefix
    * sum (the only unpartitioned window runs over the shard-totals
    * metadata relation), then ONE partial agg to shard grain. Fill
    * ratios stay exact (integer token counts over an integer target).
    */
  def trainShards(docs: DataFrame, targetTokens: Long, shardWidth: Long = 64L): DataFrame =
    packSequences(docs, seqLen = 128, shardWidth = shardWidth)
      .withColumn("shard_id", expr(s"t_offset div ${targetTokens}L"))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc")
      )
      .withColumn("fill", round(col("n_tokens").cast("double") / lit(targetTokens.toDouble), 6))

  val TrainShardTokens = 5000L

  def trainShardsQ(spark: SparkSession, dir: String): DataFrame =
    trainShards(Tables.documents(spark, dir), TrainShardTokens).orderBy(col("shard_id"))

  /** Oracle: the pack prefix-sum CTE feeding the shard rollup. */
  val trainShardsSql: String =
    s"""WITH pk AS ($packSequencesSql)
       |SELECT CAST(t_offset // $TrainShardTokens AS BIGINT) AS shard_id,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  MIN(doc_id) AS first_doc,
       |  MAX(doc_id) AS last_doc,
       |  ROUND(CAST(SUM(n_tokens) AS DOUBLE) / $TrainShardTokens.0, 6) AS fill
       |FROM pk
       |GROUP BY 1
       |ORDER BY shard_id""".stripMargin
}
