package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016) — the
  * merge-table learner every LLM data pipeline runs before anything
  * else can count tokens. Each round counts adjacent symbol pairs
  * across the corpus, picks the most frequent pair, and rewrites every
  * occurrence into a merged symbol; the ranked merge list IS the
  * tokenizer.
  *
  * Scale shape — the detail that makes BPE trainable at 100 TB: the
  * corpus is scanned ONCE, reducing to a (word, freq) vocabulary
  * relation (vocabulary-scale, zipf-bounded: orders of magnitude
  * smaller than the corpus), and the entire merge loop runs over that
  * relation — pair counting is a partial aggregation over vocab rows
  * weighted by freq, the argmax is a 1-row collect (the Lloyd
  * broadcast-update shape), and the rewrite is a pure codegen'd
  * higher-order fold over each word's symbol array. No corpus rescan,
  * no shuffle wider than the distinct-pair relation, per round. Vocab
  * state is localCheckpoint'd each round so Catalyst never re-analyzes
  * the growing rewrite lineage (the planner-bound-loop discipline the
  * CC/PageRank loops established).
  *
  * Greedy left-to-right merge semantics: within a word the fold walks
  * symbols once, merging a (lhs, rhs) adjacency only when the
  * accumulator's LAST symbol is an unconsumed lhs — so "aaa" under
  * merge (a,a) becomes [aa, a], never [a, aa], and a freshly merged
  * symbol is never immediately re-merged. The DuckDB oracle replays
  * the identical fold with list_reduce, so the whole merge trajectory
  * is bit-identical across engines.
  */
object Tokenizer {

  /** One merge round's rewrite of a symbol array, as a codegen'd fold.
    * Single-symbol words pass through (slice of length 0 is avoided).
    */
  private def mergeFold(syms: Column, lhs: String, rhs: String): Column =
    when(size(syms) === 1, syms).otherwise(
      aggregate(
        slice(syms, lit(2), size(syms) - 1),
        array(element_at(syms, 1)),
        (acc, s) =>
          when(
            element_at(acc, -1) === lit(lhs) && s === lit(rhs),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs)))
          ).otherwise(concat(acc, array(s)))
      )
    )

  /** Train `rounds` BPE merges over the normalized word stream of
    * `docs`. Returns the ranked merge table (rank, lhs, rhs, merged,
    * pair_count) — pair_count is the corpus-wide weighted adjacency
    * count that won the round.
    */
  def bpeMerges(docs: DataFrame, rounds: Int = 10): DataFrame = {
    val (m, vocab) = bpeTrain(docs, rounds)
    vocab.unpersist(false)
    m
  }

  /** Train like [[bpeMerges]] but ALSO return the fully-rewritten
    * vocabulary after the last round — (word, freq, syms), where syms
    * is each word's final symbol sequence. Encoding a corpus under the
    * trained tokenizer is then a join against this vocabulary-scale
    * relation; no per-document merge replay is ever needed.
    */
  def bpeTrain(docs: DataFrame, rounds: Int = 10): (DataFrame, DataFrame) = {
    require(rounds > 0, s"rounds must be positive, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(explode(split(expr(TextAnalysis.NormSql), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("word"), ""))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.Buffer.empty[(Long, String, String, String, Long)]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val best = vocab
        .filter(size(col("syms")) >= 2)
        .select(
          col("freq"),
          explode(
            expr(
              """transform(sequence(1, size(syms) - 1),
                |  i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))""".stripMargin
            )
          ).as("p")
        )
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, rr, cnt) =
          (best(0).getAs[String]("lhs"), best(0).getAs[String]("rhs"), best(0).getAs[Long]("cnt"))
        merges += ((r.toLong, l, rr, l + rr, cnt))
        val next = vocab.withColumn("syms", mergeFold(col("syms"), l, rr)).localCheckpoint(true)
        vocab.unpersist(false)
        vocab = next
      }
    }
    (merges.toSeq.toDF("rank", "lhs", "rhs", "merged", "pair_count"), vocab)
  }

  /** Per-document token statistics under the trained tokenizer: encode
    * every corpus word with the merge table and count the resulting
    * symbols — the token accounting (budget, packing, pricing) step
    * that follows tokenizer training in every pipeline.
    *
    * Scale shape: the training loop already leaves the ENTIRE
    * vocabulary fully rewritten (word → final symbol array), so
    * encoding is a join of the exploded (doc_id, word) stream against
    * that zipf-bounded vocabulary relation — broadcast when it fits,
    * otherwise the same word-keyed hash join any wordcount pays — and
    * a per-doc partial aggregation. No merge fold ever runs over the
    * corpus itself, and no state bigger than the vocabulary exists.
    */
  def bpeEncodeStats(docs: DataFrame, rounds: Int = 10): DataFrame = {
    val (_, vocab) = bpeTrain(docs, rounds)
    val enc = vocab.select(col("word"), size(col("syms")).cast("long").as("w_tokens"))
    docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(split(expr(TextAnalysis.NormSql), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(enc, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("long").as("n_chars"),
        sum(col("w_tokens")).as("n_tokens")
      )
      .withColumn("ratio", round(col("n_tokens").cast("double") / col("n_chars"), 6))
  }

  // The registry has three consumers of the SAME training run (merge
  // table, per-doc encode, per-lang fertility); a real pipeline trains
  // once and every report reads the trained artifact. Train once per
  // (SparkSession, sfDir) — the final vocabulary is already
  // localCheckpoint'd by the round loop, and the merge table is a
  // driver-size local relation — and let consumers share it (the
  // minedJaccardFor discipline, including the dead-session eviction).
  private val trainCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), (DataFrame, DataFrame)]()
  private val trainLock = new Object

  /** (merges, final vocab) for the registry's fixed 10-round training
    * run, computed once per (SparkSession, sfDir).
    */
  def trainedFor(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    trainCache.keys.foreach { k =>
      if (k._1.sparkContext.isStopped) trainCache.remove(k): Unit
    }
    val key = (spark, dir)
    trainCache.getOrElse(
      key,
      trainLock.synchronized {
        trainCache.getOrElseUpdate(key, bpeTrain(Tables.documents(spark, dir)))
      }
    )
  }

  /** The (doc_id, word) stream + vocabulary join behind every encode
    * consumer: per-doc word/char/token partial sums.
    */
  private def encodedDocWords(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val enc = vocab.select(col("word"), size(col("syms")).cast("long").as("w_tokens"))
    docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(split(expr(TextAnalysis.NormSql), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(enc, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("long").as("n_chars"),
        sum(col("w_tokens")).as("n_tokens")
      )
  }

  def trainBpe(spark: SparkSession, dir: String): DataFrame =
    trainedFor(spark, dir)._1

  def tokenizeBpe(spark: SparkSession, dir: String): DataFrame =
    encodedDocWords(Tables.documents(spark, dir), trainedFor(spark, dir)._2)
      .withColumn("ratio", round(col("n_tokens").cast("double") / col("n_chars"), 6))
      .orderBy(col("doc_id"))

  /** Per-language tokenizer fertility under the trained BPE — the
    * standard multilingual tokenizer-parity report (how many tokens a
    * word costs per language, and how many characters each token
    * carries): a tokenizer trained on a skewed mix over-fragments the
    * under-represented languages, which silently inflates their
    * training/inference cost per character; pipelines gate the merge
    * budget and the language mix on exactly this table.
    *
    * Scale shape: composes the per-doc encode rollup (word-keyed
    * vocabulary join, per-doc partial agg — the proven tokenize_bpe
    * plan) with a doc-keyed attach of the language column and a
    * |langs|-row rollup; nothing wider than the vocabulary relation
    * ever shuffles, and the fertility division happens once per lang
    * row. Portability: integer sums all the way, two pinned round-6
    * divisions at the end.
    */
  def tokenizeFertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    encodedDocWords(docs, trainedFor(spark, dir)._2)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_tokens")).as("n_tokens")
      )
      .select(
        col("lang"),
        col("n_docs"),
        col("n_words"),
        col("n_chars"),
        col("n_tokens"),
        round(col("n_tokens").cast("double") / col("n_words"), 6).as("fertility"),
        round(col("n_chars").cast("double") / col("n_tokens"), 6).as("chars_per_token")
      )
      .orderBy(col("lang"))
  }

  /** The merge trajectory unrolled round by round in MATERIALIZED CTEs:
    * identical pair grid (1-based adjacent indices), identical
    * (cnt DESC, lhs, rhs) argmax order, and the same greedy
    * left-to-right fold via list_reduce over singleton-wrapped symbols
    * (list_reduce seeds the accumulator with the first element, so
    * symbols are wrapped to lists and unwrapped with cur[1]).
    */
  /** The full training-replay CTE chain (words → vocab0 → pairs/best/
    * vocab per round) shared by the train and encode oracles.
    */
  private def bpeCtesSql(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""pairs$r AS (
         |  SELECT syms[CAST(u.i AS INT)] AS lhs, syms[CAST(u.i AS INT) + 1] AS rhs,
         |    CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM vocab${r - 1}, UNNEST(range(1, len(syms))) AS u(i)
         |  WHERE len(syms) >= 2
         |  GROUP BY 1, 2),
         |best$r AS MATERIALIZED (
         |  SELECT lhs, rhs, cnt FROM pairs$r ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |vocab$r AS MATERIALIZED (
         |  SELECT word, freq,
         |    CASE WHEN len(syms) = 1 THEN syms
         |         ELSE list_reduce(
         |           list_transform(syms, s -> [s]),
         |           (acc, cur) -> CASE WHEN acc[-1] = b.lhs AND cur[1] = b.rhs
         |                              THEN list_append(acc[1:len(acc) - 1], b.lhs || b.rhs)
         |                              ELSE list_append(acc, cur[1]) END) END AS syms
         |  FROM vocab${r - 1} CROSS JOIN best$r b)""".stripMargin
    }
    s"""words AS (
       |  SELECT UNNEST(string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ')) AS w
       |  FROM documents
       |  WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0),
       |vocab0 AS MATERIALIZED (
       |  SELECT w AS word, COUNT(*) AS freq,
       |    list_transform(range(1, LENGTH(w) + 1), i -> substr(w, CAST(i AS INT), 1)) AS syms
       |  FROM words WHERE LENGTH(w) > 0 GROUP BY w),
       |${roundCtes.mkString(",\n")}""".stripMargin
  }

  val trainBpeSql: String = {
    val rounds = 10
    s"""WITH ${bpeCtesSql(rounds)}
       |SELECT rank, lhs, rhs, lhs || rhs AS merged, cnt AS pair_count FROM (
       |${(1 to rounds)
        .map(r => s"  SELECT CAST($r AS BIGINT) AS rank, lhs, rhs, cnt FROM best$r")
        .mkString("\n  UNION ALL\n")}) s
       |ORDER BY rank""".stripMargin
  }

  /** Encode oracle: the identical training replay, then every corpus
    * word joined to the final vocabulary's symbol arrays and rolled up
    * per document.
    */
  val tokenizeBpeSql: String = {
    val rounds = 10
    s"""WITH ${bpeCtesSql(rounds)},
       |docw AS (
       |  SELECT doc_id,
       |    UNNEST(string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ')) AS word
       |  FROM documents
       |  WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0)
       |SELECT d.doc_id,
       |  COUNT(*) AS n_words,
       |  CAST(SUM(LENGTH(d.word)) AS BIGINT) AS n_chars,
       |  CAST(SUM(len(v.syms)) AS BIGINT) AS n_tokens,
       |  ROUND(CAST(SUM(len(v.syms)) AS DOUBLE) / CAST(SUM(LENGTH(d.word)) AS DOUBLE), 6) AS ratio
       |FROM docw d JOIN vocab$rounds v ON v.word = d.word
       |WHERE LENGTH(d.word) > 0
       |GROUP BY d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Fertility oracle: the identical training replay and per-doc word
    * join, rolled up per language with the same two round-6 divisions.
    */
  val tokenizeFertilitySql: String = {
    val rounds = 10
    s"""WITH ${bpeCtesSql(rounds)},
       |docw AS (
       |  SELECT doc_id,
       |    UNNEST(string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ')) AS word
       |  FROM documents
       |  WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0),
       |perdoc AS (
       |  SELECT d.doc_id,
       |    COUNT(*) AS n_words,
       |    CAST(SUM(LENGTH(d.word)) AS BIGINT) AS n_chars,
       |    CAST(SUM(len(v.syms)) AS BIGINT) AS n_tokens
       |  FROM docw d JOIN vocab$rounds v ON v.word = d.word
       |  WHERE LENGTH(d.word) > 0
       |  GROUP BY d.doc_id)
       |SELECT doc.lang,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(p.n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(p.n_chars) AS BIGINT) AS n_chars,
       |  CAST(SUM(p.n_tokens) AS BIGINT) AS n_tokens,
       |  ROUND(CAST(SUM(p.n_tokens) AS DOUBLE) / CAST(SUM(p.n_words) AS DOUBLE), 6) AS fertility,
       |  ROUND(CAST(SUM(p.n_chars) AS DOUBLE) / CAST(SUM(p.n_tokens) AS DOUBLE), 6) AS chars_per_token
       |FROM perdoc p JOIN documents doc ON doc.doc_id = p.doc_id
       |GROUP BY doc.lang
       |ORDER BY doc.lang""".stripMargin
  }
}
