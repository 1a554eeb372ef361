package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, and rolling-hash document
  * fingerprinting (winnowing).
  *
  * All per-document computation is codegen'd Catalyst expressions over
  * higher-order array functions — map-side only, no shuffle, no UDFs —
  * so these scale linearly with the scan and pipeline into whatever
  * shuffle (dedup join, aggregation) consumes them.
  */
object TextAnalysis {

  private[graft] val NormSql = "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"
  private[graft] val WordsSql = s"split($NormSql, ' ')"

  /** BPE-ish token pattern: letter runs, digit runs, or single
    * non-alphanumeric marks — a portable approximation of byte-pair
    * pre-tokenization (kept to syntax Java regex and RE2 agree on).
    */
  val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Whitespace + regex token counts per document. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(expr(WordsSql)).cast("long").as("n_ws_tokens"),
      regexp_count(col("text"), lit(TokenPattern)).cast("long").as("n_re_tokens"),
      length(col("text")).cast("long").as("n_chars")
    )

  /** English stopword sample used by the quality score (a fixed public
    * list keeps Spark and the SQL oracle in lockstep).
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "was", "for", "on", "with")

  /** Quality scoring: length, word, punctuation, alpha and stopword
    * ratios plus a composite score — the standard cheap pre-filter for
    * web-scale corpora.
    */
  def qualityScores(docs: DataFrame): DataFrame = {
    val inList = Stopwords.map(s => s"'$s'").mkString(", ")
    docs
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(expr(WordsSql)).cast("long").as("n_words"),
        expr(s"size(filter($WordsSql, w -> w IN ($inList)))").cast("long").as("n_stop"),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long").as("n_alpha"),
        length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("long").as("n_punct")
      )
      .select(
        col("doc_id"),
        col("n_chars"),
        col("n_words"),
        // divide by NULLIF(...,0): empty text must yield NULL in BOTH
        // engines (Spark's non-ANSI x/0 is NULL but DuckDB's is inf/NaN)
        round(col("n_stop").cast("double") / nullif(col("n_words"), lit(0)), 6).as("stop_ratio"),
        round(col("n_alpha").cast("double") / nullif(col("n_chars"), lit(0)), 6).as("alpha_ratio"),
        round(col("n_punct").cast("double") / nullif(col("n_chars"), lit(0)), 6).as("punct_ratio"),
        round(
          col("n_alpha").cast("double") / nullif(col("n_chars"), lit(0)) * 0.5 +
            col("n_stop").cast("double") / nullif(col("n_words"), lit(0)) * 0.3 +
            least(col("n_words").cast("double") / 100.0, lit(1.0)) * 0.2,
          6
        ).as("quality")
      )
  }

  /** The required-word list of the Gopher rule filter (Rae et al. 2021
    * §A1.1): a document must contain at least two of these to pass the
    * stopword gate.
    */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style hard rule filter (Rae et al. 2021 §A1.1) — the gate
    * battery web-scale pretraining pipelines apply before any
    * model-based scoring. A document passes when ALL rules hold:
    *
    *   - r_words:   word count in [minWords, maxWords]
    *   - r_wordlen: mean word length in [3, 10] characters
    *   - r_symbol:  (hash chars + ellipses) per word <= 0.1
    *   - r_alpha:   >= 80% of words contain an alphabetic character
    *   - r_stop:    at least 2 distinct [[GopherStops]] words appear
    *
    * Scale shape: a pure map-side projection — higher-order array
    * functions and regex counts only (whole-stage codegen, no UDF, no
    * shuffle); the corpus is scanned once and the flags pipeline into
    * whatever consumes them. Mean word length divides the normalized
    * text's non-space character count by the word count, so no second
    * pass over the word array is needed.
    */
  def gopherRules(docs: DataFrame, minWords: Int = 20, maxWords: Int = 100000): DataFrame = {
    val reqList = GopherStops.map(s => s"'$s'").mkString(", ")
    docs
      .select(
        col("doc_id"),
        expr(NormSql).as("nm"),
        size(expr(WordsSql)).cast("long").as("n_words"),
        expr(s"size(filter($WordsSql, w -> w rlike '[A-Za-z]'))").cast("long").as("n_alpha_w"),
        expr(s"size(filter(array($reqList), s -> array_contains($WordsSql, s)))")
          .cast("long")
          .as("n_req")
      )
      .select(
        col("doc_id"),
        col("n_words"),
        round(
          length(regexp_replace(col("nm"), " ", "")).cast("double") / nullif(col("n_words"), lit(0)),
          6
        ).as("mean_word_len"),
        round(
          ((length(col("nm")) - length(regexp_replace(col("nm"), "#", ""))) +
            regexp_count(col("nm"), lit("\\.\\.\\."))).cast("double") / nullif(col("n_words"), lit(0)),
          6
        ).as("symbol_ratio"),
        round(col("n_alpha_w").cast("double") / nullif(col("n_words"), lit(0)), 6).as("alpha_ratio"),
        col("n_req")
      )
      .select(
        col("doc_id"),
        col("n_words"),
        col("mean_word_len"),
        col("symbol_ratio"),
        col("alpha_ratio"),
        col("n_req"),
        (col("n_words") >= minWords && col("n_words") <= maxWords).as("r_words"),
        (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0).as("r_wordlen"),
        (col("symbol_ratio") <= 0.1).as("r_symbol"),
        (col("alpha_ratio") >= 0.8).as("r_alpha"),
        (col("n_req") >= 2).as("r_stop")
      )
      .withColumn(
        "pass",
        col("r_words") && col("r_wordlen") && col("r_symbol") && col("r_alpha") && col("r_stop")
      )
  }

  /** C4-style cleaning report (Raffel et al. 2020 §2.2 — the line +
    * document rule battery behind the C4 corpus, the pragmatic
    * complement to [[gopherRules]]' document-statistics gates): a LINE
    * survives when it has ≥ 3 words, ends in terminal punctuation
    * (. ! ? "), and does not mention javascript; the DOCUMENT passes
    * when it contains no "lorem ipsum", no curly brace, and its
    * surviving lines carry ≥ `minSentences` sentences. The report
    * keeps the per-rule evidence (line/sentence counts, kept-char
    * ratio, the two content flags) so a curator can tune each gate
    * instead of reading one opaque boolean.
    *
    * Scale shape: a pure map-side projection — line split + lambda
    * filters + regex counts, whole-stage codegen, no UDF, no shuffle
    * (the gopherRules discipline). Portability: counts are integers;
    * the kept-char ratio divides the single-space rejoined survivor
    * text by the raw length with the NULLIF(…,0) guard.
    */
  def c4Rules(docs: DataFrame, minSentences: Int = 5): DataFrame = {
    val keptSql =
      """filter(split(text, '\n'), l ->
        |  size(filter(split(trim(l), ' '), w -> w != '')) >= 3
        |  AND trim(l) rlike '[.!?"]$'
        |  AND NOT contains(lower(l), 'javascript'))""".stripMargin.replaceAll("\n", " ")
    docs
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        size(expr("split(text, '\\n')")).cast("long").as("n_lines"),
        expr(keptSql).as("__kept"),
        contains(lower(col("text")), lit("lorem ipsum")).as("has_lorem"),
        contains(col("text"), lit("{")).as("has_brace"),
        length(col("text")).cast("long").as("__len")
      )
      .select(
        col("doc_id"),
        col("n_lines"),
        size(col("__kept")).cast("long").as("n_kept_lines"),
        regexp_count(array_join(col("__kept"), " "), lit("[.!?]")).cast("long").as("n_sentences"),
        round(
          length(array_join(col("__kept"), " ")).cast("double") /
            nullif(col("__len"), lit(0L)).cast("double"),
          6
        ).as("kept_ratio"),
        col("has_lorem"),
        col("has_brace")
      )
      .withColumn(
        "pass",
        !col("has_lorem") && !col("has_brace") && col("n_sentences") >= minSentences
      )
  }

  def qualityC4(spark: SparkSession, dir: String): DataFrame =
    c4Rules(Tables.documents(spark, dir))

  /** C4 oracle: identical line lambda, sentence regex and rejoin. */
  val qualityC4Sql: String =
    """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      |k AS (
      |  SELECT doc_id, text,
      |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
      |    list_filter(string_split(text, chr(10)), l ->
      |      len(list_filter(string_split(TRIM(l), ' '), w -> w != '')) >= 3
      |      AND regexp_matches(TRIM(l), '[.!?"]$')
      |      AND NOT contains(LOWER(l), 'javascript')) AS kept,
      |    contains(LOWER(text), 'lorem ipsum') AS has_lorem,
      |    contains(text, '{') AS has_brace
      |  FROM d),
      |f AS (
      |  SELECT doc_id, n_lines,
      |    CAST(len(kept) AS BIGINT) AS n_kept_lines,
      |    -- DuckDB's array_to_string([]) is NULL (Spark's array_join is '') — coalesce
      |    CAST(len(regexp_extract_all(COALESCE(array_to_string(kept, ' '), ''), '[.!?]')) AS BIGINT) AS n_sentences,
      |    ROUND(CAST(LENGTH(COALESCE(array_to_string(kept, ' '), '')) AS DOUBLE)
      |      / CAST(NULLIF(LENGTH(text), 0) AS DOUBLE), 6) AS kept_ratio,
      |    has_lorem, has_brace
      |  FROM k)
      |SELECT doc_id, n_lines, n_kept_lines, n_sentences, kept_ratio,
      |  has_lorem, has_brace,
      |  NOT has_lorem AND NOT has_brace AND n_sentences >= 5 AS pass
      |FROM f
      |ORDER BY doc_id""".stripMargin

  /** FineWeb-style repetition-removal battery (Penedo et al. 2024,
    * adopting the MassiveText repetition filters of Rae et al. 2021
    * §A1.1): the four repetition signals that catch the boilerplate
    * C4/Gopher's length/stopword priors walk past — duplicate-line
    * fraction (> 0.30 rejects), duplicate-line CHARACTER fraction
    * (> 0.20), the character fraction covered by repeats of the top
    * word 2-gram (> 0.20), and the character fraction in duplicated
    * word 5-grams (> 0.15). The report keeps every rate plus the
    * winning bigram as evidence, so a curator tunes gates instead of
    * reading one opaque boolean.
    *
    * Scale shape: a pure map-side projection, zero shuffle (the
    * quality_c4 discipline) — each signal is ONE fold over a
    * sorted-in-row array (lines, bigrams, 5-grams), so repetition
    * counting never leaves the document's own row; no (doc, gram)
    * exchange exists to skew. Portability: every rate is an
    * integer/integer ratio computed as HALF_UP integer division into
    * MICRO units then /1e6 — the quotient lands exactly on the
    * scale-6 grid in any engine (no ROUND of a raw double anywhere),
    * and the top-bigram tie-break is "first maximum over the sorted
    * gram array" = lexicographically smallest, pinned cross-engine by
    * the shared binary sort order.
    */
  def finewebRules(docs: DataFrame): DataFrame = {
    // HALF_UP integer division to micro units: round(num/den, 6) with
    // no double half-grid anywhere (num, den integer, den > 0)
    def microFrac(num: String, den: String): String =
      s"CASE WHEN ($den) <= 0 THEN 0.0 ELSE CAST((($num) * 2000000 + ($den)) DIV (($den) * 2) AS DOUBLE) / 1000000.0 END"
    val lineFold =
      """aggregate(
        |  slice(__lines, 2, size(__lines) - 1),
        |  named_struct('prev', element_at(__lines, 1), 'dis', 1L, 'dupch', 0L),
        |  (acc, l) -> IF(l <=> acc.prev,
        |    named_struct('prev', l, 'dis', acc.dis, 'dupch', acc.dupch + length(l)),
        |    named_struct('prev', l, 'dis', acc.dis + 1, 'dupch', acc.dupch)))""".stripMargin
    val top2Fold =
      """CASE WHEN size(__w2s) = 0 THEN named_struct('bg', '', 'bc', 0L)
        |ELSE aggregate(
        |  slice(__w2s, 2, size(__w2s) - 1),
        |  named_struct('prev', element_at(__w2s, 1), 'run', 1L,
        |               'bg', element_at(__w2s, 1), 'bc', 1L),
        |  (acc, g) -> CASE WHEN g <=> acc.prev THEN
        |      IF(acc.run + 1 > acc.bc,
        |        named_struct('prev', g, 'run', acc.run + 1, 'bg', g, 'bc', acc.run + 1),
        |        named_struct('prev', g, 'run', acc.run + 1, 'bg', acc.bg, 'bc', acc.bc))
        |    ELSE named_struct('prev', g, 'run', 1L, 'bg', acc.bg, 'bc', acc.bc) END,
        |  acc -> named_struct('bg', acc.bg, 'bc', acc.bc)) END""".stripMargin
    val dup5Fold =
      """CASE WHEN size(__w5s) = 0 THEN 0L
        |ELSE aggregate(
        |  slice(__w5s, 2, size(__w5s) - 1),
        |  named_struct('prev', element_at(__w5s, 1), 'dupch', 0L),
        |  (acc, g) -> IF(g <=> acc.prev,
        |    named_struct('prev', g, 'dupch', acc.dupch + length(g) - 4),
        |    named_struct('prev', g, 'dupch', acc.dupch)),
        |  acc -> acc.dupch) END""".stripMargin
    docs
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("__len"),
        expr("array_sort(split(text, '\\n'))").as("__lines"),
        expr(s"filter($WordsSql, w -> w != '')").as("__words")
      )
      .select(
        col("doc_id"),
        col("__len"),
        size(col("__lines")).cast("long").as("n_lines"),
        expr(lineFold).as("__lf"),
        expr("aggregate(__words, 0L, (a, w) -> a + length(w))").as("__chars"),
        expr(
          """CASE WHEN size(__words) < 2 THEN array()
            |ELSE array_sort(transform(sequence(1, size(__words) - 1),
            |  i -> concat(element_at(__words, i), ' ', element_at(__words, i + 1)))) END""".stripMargin
        ).as("__w2s"),
        expr(
          """CASE WHEN size(__words) < 5 THEN array()
            |ELSE array_sort(transform(sequence(1, size(__words) - 4),
            |  i -> concat_ws(' ', slice(__words, i, 5)))) END""".stripMargin
        ).as("__w5s")
      )
      // hoist the two gram folds ONCE (aggregate() is CodegenFallback
      // with no common-subexpression elimination — inlining the top-2
      // fold three times in the final projection would run the
      // dominant per-row cost three times; the __lf pattern)
      .select(
        col("doc_id"),
        col("n_lines"),
        col("__len"),
        col("__lf"),
        col("__chars"),
        expr(top2Fold).as("__t2"),
        expr(dup5Fold).as("__d5ch")
      )
      .select(
        col("doc_id"),
        col("n_lines"),
        expr(microFrac("n_lines - __lf.dis", "n_lines")).as("dup_line_frac"),
        expr(microFrac("__lf.dupch", "__len - (n_lines - 1)")).as("dup_line_char_frac"),
        col("__t2.bg").as("top2_gram"),
        expr(
          microFrac(
            "greatest(__t2.bc - 1, 0L) * greatest(length(__t2.bg) - 1, 0)",
            "__chars"
          )
        ).as("top2_char_frac"),
        expr(microFrac("__d5ch", "__chars")).as("dup5_char_frac")
      )
      .withColumn(
        "pass",
        col("dup_line_frac") <= 0.30 && col("dup_line_char_frac") <= 0.20 &&
          col("top2_char_frac") <= 0.20 && col("dup5_char_frac") <= 0.15
      )
  }

  def qualityFineweb(spark: SparkSession, dir: String): DataFrame =
    finewebRules(Tables.documents(spark, dir))

  /** FineWeb oracle: the RELATIONAL form of the same four signals —
    * UNNEST + GROUP BY run-length counts and a (c DESC, gram ASC)
    * argmax, value-identical to the engine's sorted-array folds (a
    * run-length fold over a sorted array computes exactly the
    * per-value counts; "first maximum in sort order" = smallest gram
    * among the argmax). Deliberately NOT a list_reduce replay: DuckDB
    * 1.0.0 misaligns rows when list_reduce over struct elements runs
    * vectorized across a table (single-row probes give the right
    * answer; full scans shift results between neighboring rows), so
    * the oracle stays on plain relational operators.
    */
  val qualityFinewebSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS len,
      |    string_split(text, chr(10)) AS lines,
      |    list_filter(string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' '),
      |                w -> w != '') AS ws
      |  FROM documents WHERE text IS NOT NULL),
      |base AS (
      |  SELECT doc_id, len, CAST(len(lines) AS BIGINT) AS n_lines,
      |    CAST(COALESCE(list_sum(list_transform(ws, w -> CAST(LENGTH(w) AS BIGINT))), 0)
      |      AS BIGINT) AS chars
      |  FROM d),
      |lc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |    CAST(SUM((c - 1) * ll) AS BIGINT) AS dupch
      |  FROM (
      |    SELECT doc_id, l, COUNT(*) AS c, LENGTH(l) AS ll
      |    FROM (SELECT doc_id, UNNEST(lines) AS l FROM d)
      |    GROUP BY doc_id, l)
      |  GROUP BY doc_id),
      |g2 AS (
      |  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (
      |    SELECT doc_id, UNNEST(CASE WHEN len(ws) < 2 THEN []
      |      ELSE list_transform(range(1, len(ws)),
      |        i -> ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1]) END) AS g
      |    FROM d)
      |  GROUP BY doc_id, g),
      |t2 AS (
      |  SELECT doc_id, g AS bg, c AS bc FROM (
      |    SELECT doc_id, g, c,
      |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
      |    FROM g2)
      |  WHERE rn = 1),
      |d5 AS (
      |  SELECT doc_id, CAST(SUM((c - 1) * (LENGTH(g) - 4)) AS BIGINT) AS dup5ch
      |  FROM (
      |    SELECT doc_id, g, COUNT(*) AS c
      |    FROM (
      |      SELECT doc_id, UNNEST(CASE WHEN len(ws) < 5 THEN []
      |        ELSE list_transform(range(1, len(ws) - 3),
      |          i -> array_to_string(ws[CAST(i AS INT):CAST(i AS INT) + 4], ' ')) END) AS g
      |      FROM d)
      |    GROUP BY doc_id, g)
      |  WHERE c >= 2
      |  GROUP BY doc_id),
      |r AS (
      |  SELECT b.doc_id, b.n_lines,
      |    CASE WHEN b.n_lines <= 0 THEN 0.0 ELSE CAST(((b.n_lines - lc.n_distinct) * 2000000
      |      + b.n_lines) // (b.n_lines * 2) AS DOUBLE) / 1000000.0 END AS dup_line_frac,
      |    CASE WHEN b.len - (b.n_lines - 1) <= 0 THEN 0.0 ELSE CAST((lc.dupch * 2000000
      |      + (b.len - (b.n_lines - 1))) // ((b.len - (b.n_lines - 1)) * 2) AS DOUBLE)
      |      / 1000000.0 END AS dup_line_char_frac,
      |    COALESCE(t2.bg, '') AS top2_gram,
      |    CASE WHEN b.chars <= 0 THEN 0.0 ELSE CAST((GREATEST(COALESCE(t2.bc, 0) - 1, 0)
      |      * GREATEST(LENGTH(COALESCE(t2.bg, '')) - 1, 0) * 2000000 + b.chars)
      |      // (b.chars * 2) AS DOUBLE) / 1000000.0 END AS top2_char_frac,
      |    CASE WHEN b.chars <= 0 THEN 0.0 ELSE CAST((COALESCE(d5.dup5ch, 0) * 2000000
      |      + b.chars) // (b.chars * 2) AS DOUBLE) / 1000000.0 END AS dup5_char_frac
      |  FROM base b
      |  JOIN lc USING (doc_id)
      |  LEFT JOIN t2 USING (doc_id)
      |  LEFT JOIN d5 USING (doc_id))
      |SELECT doc_id, n_lines, dup_line_frac, dup_line_char_frac, top2_gram,
      |  top2_char_frac, dup5_char_frac,
      |  dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
      |    AND top2_char_frac <= 0.20 AND dup5_char_frac <= 0.15 AS pass
      |FROM r
      |ORDER BY doc_id""".stripMargin

  /** Code-vs-prose detector: the routing signal that sends source code
    * to a code pipeline instead of the prose quality gates (whose
    * stopword/punctuation priors misfire on it — [[gopherRules]] and
    * [[c4Rules]] both reject good code). Four per-line rates —
    * semicolons, braces/brackets, indented lines, reserved-word hits —
    * vote; ≥ 2 votes classifies the document as code. The rates ship
    * alongside the flag so a curator can re-weight the vote without
    * re-scanning.
    *
    * Scale shape: pure map-side projection — three regexp counters, a
    * line-lambda filter and integer arithmetic, whole-stage codegen,
    * no UDF, no shuffle (the quality_c4 discipline). Portability: all
    * counts are integers; rates round at 6 over NULLIF'd line counts.
    */
  def codeDetect(docs: DataFrame): DataFrame = {
    val kw = "(^|[^a-z0-9_])(def|class|import|return|function|const|var|void|int|public|static|struct|fn|let|elif|lambda|null|nullptr|printf|println)([^a-z0-9_]|$)"
    docs
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        size(expr("split(text, '\\n')")).cast("long").as("n_lines"),
        regexp_count(col("text"), lit(";")).cast("long").as("__semi"),
        regexp_count(col("text"), lit("[{}\\[\\]()]")).cast("long").as("__brace"),
        size(expr("filter(split(text, '\\n'), l -> l rlike '^(  |\\t)')")).cast("long")
          .as("__indented"),
        regexp_count(lower(col("text")), lit(kw)).cast("long").as("__kw")
      )
      .withColumn("semi_per_line", round(col("__semi") / nullif(col("n_lines"), lit(0L)).cast("double"), 6))
      .withColumn("brace_per_line", round(col("__brace") / nullif(col("n_lines"), lit(0L)).cast("double"), 6))
      .withColumn("indent_frac", round(col("__indented") / nullif(col("n_lines"), lit(0L)).cast("double"), 6))
      .withColumn("kw_per_line", round(col("__kw") / nullif(col("n_lines"), lit(0L)).cast("double"), 6))
      .withColumn(
        "is_code",
        (when(col("semi_per_line") > 0.2, 1).otherwise(0) +
          when(col("brace_per_line") > 0.5, 1).otherwise(0) +
          when(col("indent_frac") > 0.3, 1).otherwise(0) +
          when(col("kw_per_line") > 0.3, 1).otherwise(0)) >= 2
      )
      .select(
        "doc_id", "n_lines", "semi_per_line", "brace_per_line",
        "indent_frac", "kw_per_line", "is_code"
      )
  }

  def textCodeDetect(spark: SparkSession, dir: String): DataFrame =
    codeDetect(Tables.documents(spark, dir))

  /** Code-detector oracle: identical counters, thresholds and NULLIF'd
    * round-6 rates.
    */
  val textCodeDetectSql: String = {
    val kw = "(^|[^a-z0-9_])(def|class|import|return|function|const|var|void|int|public|static|struct|fn|let|elif|lambda|null|nullptr|printf|println)([^a-z0-9_]|$)"
    s"""WITH c AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
      |    CAST(len(regexp_extract_all(text, ';')) AS BIGINT) AS n_semi,
      |    CAST(len(regexp_extract_all(text, '[{}[\\]()]')) AS BIGINT) AS brace,
      |    CAST(len(list_filter(string_split(text, chr(10)),
      |      l -> regexp_matches(l, '^(  |\\t)'))) AS BIGINT) AS indented,
      |    CAST(len(regexp_extract_all(LOWER(text), '$kw')) AS BIGINT) AS kw
      |  FROM documents WHERE text IS NOT NULL),
      |r AS (
      |  SELECT doc_id, n_lines,
      |    ROUND(n_semi / CAST(NULLIF(n_lines, 0) AS DOUBLE), 6) AS semi_per_line,
      |    ROUND(brace / CAST(NULLIF(n_lines, 0) AS DOUBLE), 6) AS brace_per_line,
      |    ROUND(indented / CAST(NULLIF(n_lines, 0) AS DOUBLE), 6) AS indent_frac,
      |    ROUND(kw / CAST(NULLIF(n_lines, 0) AS DOUBLE), 6) AS kw_per_line
      |  FROM c)
      |SELECT doc_id, n_lines, semi_per_line, brace_per_line, indent_frac, kw_per_line,
      |  (CASE WHEN semi_per_line > 0.2 THEN 1 ELSE 0 END
      |   + CASE WHEN brace_per_line > 0.5 THEN 1 ELSE 0 END
      |   + CASE WHEN indent_frac > 0.3 THEN 1 ELSE 0 END
      |   + CASE WHEN kw_per_line > 0.3 THEN 1 ELSE 0 END) >= 2 AS is_code
      |FROM r
      |ORDER BY doc_id""".stripMargin
  }

  /** Per-document Shannon entropy at character and word granularity —
    * the compressibility signals that flag binary junk, boilerplate
    * and keyword-stuffed spam (low entropy) or encrypted/encoded noise
    * (abnormally high character entropy).
    *
    * Both use H = ln n − (Σ m·ln m)/n over the symbol histogram —
    * algebraically −Σ p·ln p but summable from raw counts, so no
    * per-symbol division order matters.
    *
    * Scale shape: the CHARACTER side is a pure map-side SINGLE-PASS
    * fold — sort the char array once, then run-length walk it with a
    * struct accumulator (prev char, run length, DECIMAL term sum,
    * distinct count), closing each run with its m·ln m term. O(len)
    * lambda steps per doc, zero shuffle. (A first cut counted each
    * distinct char with filter(cs, x = c) — O(alphabet·len)
    * INTERPRETED work per doc that benched 10.6 s at sf0.1; the
    * run-length fold is the linear shape.) The WORD side's histogram
    * is per-doc unbounded, so it takes the same (doc, word)-keyed
    * partial aggregation any wordcount pays. BOTH sides route every
    * m·ln m term through DECIMAL(27,10), so the sums are exact and
    * order-independent — which is exactly what lets the oracle compute
    * the char histogram relationally (UNNEST + GROUP BY) while Spark
    * folds it sequentially: same terms, same total, any order.
    * Portability: round-9 on every ln, round-6 on the final entropies.
    */
  def entropyScores(docs: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    // one-pass native codepoint-histogram kernel; s_nanos/1e9 is the
    // exact Σ m·round(ln m, 9) the former decimal fold accumulated
    // (see functions.CharEntropyStats for the exactness argument), so
    // the oracle's relational UNNEST histogram is unchanged
    val charSide = docs
      .select(col("doc_id"), expr(NormSql).as("nm"))
      .withColumn("n", length(col("nm")).cast("long"))
      .withColumn("__k", graft.functions.Shingling.charEntropyStats(col("nm")))
      .select(
        col("doc_id"),
        col("n").as("n_chars"),
        col("__k.n_uniq_chars").as("n_uniq_chars"),
        when(
          col("n") > 0,
          round(
            round(log(col("n")), 9) -
              (col("__k.s_nanos").cast("double") / lit(1e9)) / col("n"),
            6
          )
        ).as("char_entropy")
      )
    val wordSide = docs
      .select(col("doc_id"), explode(split(expr(NormSql), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_words"),
        count(lit(1)).as("n_uniq_words"),
        sum((col("c") * round(log(col("c")), 9)).cast(dec)).as("__sd")
      )
      .select(
        col("doc_id"),
        col("n_words"),
        col("n_uniq_words"),
        round(
          round(log(col("n_words").cast("double")), 9) -
            col("__sd").cast("double") / col("n_words"),
          6
        ).as("word_entropy")
      )
    charSide
      .join(wordSide, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_chars"),
        col("n_uniq_chars"),
        col("char_entropy"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_uniq_words"), lit(0L)).as("n_uniq_words"),
        col("word_entropy")
      )
  }

  /** Stopword profiles for the language-ID heuristic (small public
    * function-word lists; zh is handled by CJK character ratio).
    */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for", "with", "are"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "mit", "für", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans", "qui", "pas"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "que", "por", "para", "con", "no")
  )

  /** Language ID via stopword-profile hit ratios + CJK character ratio
    * for zh; returns (doc_id, lang_pred, score). "und" when nothing
    * matches.
    */
  def langId(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), langBestColumn.as("__best"))
      .select(
        col("doc_id"),
        when(col("__best.score") > 0, col("__best.lang")).otherwise(lit("und")).as("lang_pred"),
        round(col("__best.score"), 6).as("score")
      )

  // ---------------------------------------------------------------------
  // Per-row feature COLUMNS (shared by the standalone queries above and
  // the training-mix composition in Curation — all pure map-side)
  // ---------------------------------------------------------------------

  /** The composite quality score as a single column over `text` — the
    * same formula qualityScores emits (deterministic expressions over
    * the same inputs, so the two agree bit-for-bit).
    */
  def qualityColumn: Column = {
    val inList = Stopwords.map(s => s"'$s'").mkString(", ")
    val nWords = size(expr(WordsSql))
    val nStop = expr(s"size(filter($WordsSql, w -> w IN ($inList)))")
    val nAlpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
    round(
      nAlpha.cast("double") / nullif(length(col("text")), lit(0)) * 0.5 +
        nStop.cast("double") / nullif(nWords, lit(0)) * 0.3 +
        least(nWords.cast("double") / 100.0, lit(1.0)) * 0.2,
      6
    )
  }

  /** The winning (score, lang) struct of the language-ID heuristic as a
    * single column (argmax via greatest-struct, ties to the larger lang
    * string — the exact semantics langId uses).
    */
  def langBestColumn: Column = {
    val zh = (length(regexp_replace(col("text"), "[^\\x{4e00}-\\x{9fff}]", "")).cast("double") /
      greatest(length(col("text")), lit(1)).cast("double"))
    val scores = ("zh" -> zh) +: LangProfiles.toSeq.sortBy(_._1).map { case (lang, stops) =>
      val inList = stops.map(s => s"'$s'").mkString(", ")
      lang -> (expr(s"size(filter($WordsSql, w -> w IN ($inList)))").cast("double") /
        greatest(size(expr(WordsSql)), lit(1)).cast("double"))
    }
    greatest(scores.map { case (l, s) => struct(s.as("score"), lit(l).as("lang")) }: _*)
  }

  /** Predicted language ("und" when nothing scores). */
  def langPredColumn: Column = {
    val best = langBestColumn
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** BPE-ish regex token count. */
  def reTokensColumn: Column =
    regexp_count(col("text"), lit(TokenPattern)).cast("long")

  /** Deterministic split assignment as a column (see deterministicSplit). */
  def splitColumn(trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = expr(s"${Dedup.md5Prefix60Sql("cast(doc_id as string)")} % 100")
    when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test")
  }

  /** Winnowing document fingerprint: Rabin-Karp rolling hash over
    * k-char-grams of the normalized text with a sliding-window minimum —
    * the classic local-sampling fingerprint whose guarantee is that any
    * shared substring of length >= k + win - 1 yields a shared
    * fingerprint. The O(n) kernel is the native `Winnow` Catalyst
    * expression (graft.functions.Winnowing); the normalization stays a
    * codegen'd child expression.
    */
  def fingerprints(docs: DataFrame, k: Int = 8, win: Int = 4): DataFrame =
    docs
      .select(
        col("doc_id"),
        graft.functions.Winnow.winnow(lower(trim(regexp_replace(col("text"), "\\s+", " "))), k, win).as("fps")
      )
      .select(col("doc_id"), explode(col("fps")).as("fingerprint"))

  // ---------------------------------------------------------------------
  // Fixed driver queries
  // ---------------------------------------------------------------------

  def textTokens(spark: SparkSession, dir: String): DataFrame =
    tokenCounts(Tables.documents(spark, dir))

  val textTokensSql: String =
    s"""SELECT doc_id,
       |  len(string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ')) AS n_ws_tokens,
       |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_re_tokens,
       |  LENGTH(text) AS n_chars
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  def textQuality(spark: SparkSession, dir: String): DataFrame =
    qualityScores(Tables.documents(spark, dir))

  val textQualitySql: String = {
    val inList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    LENGTH(text) AS n_chars,
       |    len(string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ')) AS n_words,
       |    len(list_filter(string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' '), w -> w IN ($inList))) AS n_stop,
       |    LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
       |    LENGTH(REGEXP_REPLACE(text, '[^.,;:!?]', '', 'g')) AS n_punct
       |  FROM documents)
       |SELECT doc_id, n_chars, n_words,
       |  ROUND(CAST(n_stop AS DOUBLE) / NULLIF(n_words, 0), 6) AS stop_ratio,
       |  ROUND(CAST(n_alpha AS DOUBLE) / NULLIF(n_chars, 0), 6) AS alpha_ratio,
       |  ROUND(CAST(n_punct AS DOUBLE) / NULLIF(n_chars, 0), 6) AS punct_ratio,
       |  ROUND(CAST(n_alpha AS DOUBLE) / NULLIF(n_chars, 0) * 0.5 +
       |        CAST(n_stop AS DOUBLE) / NULLIF(n_words, 0) * 0.3 +
       |        LEAST(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.2, 6) AS quality
       |FROM t
       |ORDER BY doc_id""".stripMargin
  }

  def qualityGopher(spark: SparkSession, dir: String): DataFrame =
    gopherRules(Tables.documents(spark, dir))

  /** Oracle: identical normalized-word features, identical ROUND(…, 6)
    * ratios, identical rule thresholds — flags and the pass conjunction
    * recomputed from the rounded ratios in both engines.
    */
  val qualityGopherSql: String = {
    val reqList = GopherStops.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS nm,
       |    string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ') AS words
       |  FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    CAST(len(words) AS BIGINT) AS n_words,
       |    ROUND(CAST(LENGTH(REPLACE(nm, ' ', '')) AS DOUBLE) / NULLIF(len(words), 0), 6) AS mean_word_len,
       |    ROUND(CAST(LENGTH(nm) - LENGTH(REPLACE(nm, '#', '')) + len(regexp_extract_all(nm, '\\.\\.\\.')) AS DOUBLE) / NULLIF(len(words), 0), 6) AS symbol_ratio,
       |    ROUND(CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) / NULLIF(len(words), 0), 6) AS alpha_ratio,
       |    CAST(len(list_filter([$reqList], s -> list_contains(words, s))) AS BIGINT) AS n_req
       |  FROM t)
       |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio, n_req,
       |  (n_words >= 20 AND n_words <= 100000) AS r_words,
       |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS r_wordlen,
       |  (symbol_ratio <= 0.1) AS r_symbol,
       |  (alpha_ratio >= 0.8) AS r_alpha,
       |  (n_req >= 2) AS r_stop,
       |  (n_words >= 20 AND n_words <= 100000 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |    AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.8 AND n_req >= 2) AS pass
       |FROM f
       |ORDER BY doc_id""".stripMargin
  }

  def textEntropy(spark: SparkSession, dir: String): DataFrame =
    entropyScores(Tables.documents(spark, dir))

  /** Oracle: the char histogram computed RELATIONALLY (UNNEST + GROUP
    * BY) — legitimate because both engines sum the identical
    * DECIMAL(27,10) m·ln m terms, which is order-independent — plus
    * identical word-histogram DECIMAL sums.
    */
  val textEntropySql: String =
    s"""WITH t AS (
       |  SELECT doc_id, LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS nm FROM documents),
       |ch AS (
       |  SELECT doc_id, nm, LENGTH(nm) AS n,
       |    list_transform(range(1, LENGTH(nm) + 1), i -> substr(nm, CAST(i AS INT), 1)) AS cs
       |  FROM t),
       |cc AS (
       |  SELECT doc_id, c, COUNT(*) AS m
       |  FROM (SELECT doc_id, UNNEST(cs) AS c FROM ch) u GROUP BY 1, 2),
       |cstat AS (
       |  SELECT doc_id, COUNT(*) AS u,
       |    SUM(CAST(m * ROUND(LN(m), 9) AS DECIMAL(27,10))) AS s
       |  FROM cc GROUP BY doc_id),
       |chs AS (
       |  SELECT ch.doc_id, CAST(ch.n AS BIGINT) AS n_chars,
       |    CASE WHEN ch.n IS NULL THEN NULL
       |         ELSE CAST(COALESCE(cstat.u, 0) AS BIGINT) END AS n_uniq_chars,
       |    CASE WHEN ch.n > 0 THEN
       |      ROUND(ROUND(LN(ch.n), 9) - CAST(cstat.s AS DOUBLE) / ch.n, 6)
       |    END AS char_entropy
       |  FROM ch LEFT JOIN cstat ON cstat.doc_id = ch.doc_id),
       |w AS (SELECT doc_id, UNNEST(string_split(nm, ' ')) AS word FROM t),
       |wc AS (SELECT doc_id, word, COUNT(*) AS c FROM w WHERE LENGTH(word) > 0 GROUP BY 1, 2),
       |ws AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words, COUNT(*) AS n_uniq_words,
       |    ROUND(ROUND(LN(CAST(SUM(c) AS DOUBLE)), 9) -
       |      CAST(SUM(CAST(c * ROUND(LN(c), 9) AS DECIMAL(27,10))) AS DOUBLE) / SUM(c), 6) AS word_entropy
       |  FROM wc GROUP BY doc_id)
       |SELECT c.doc_id, c.n_chars, c.n_uniq_chars, c.char_entropy,
       |  COALESCE(ws.n_words, 0) AS n_words,
       |  COALESCE(ws.n_uniq_words, 0) AS n_uniq_words,
       |  ws.word_entropy
       |FROM chs c LEFT JOIN ws ON ws.doc_id = c.doc_id
       |ORDER BY c.doc_id""".stripMargin

  def textLangid(spark: SparkSession, dir: String): DataFrame =
    langId(Tables.documents(spark, dir))

  /** Language-ID oracle: same stopword-hit / CJK-char ratios; the
    * greatest-struct argmax becomes a (score DESC, lang DESC) ranking —
    * identical tie semantics to Spark's struct comparison.
    */
  val textLangidSql: String = {
    val scoreCols = LangProfiles.toSeq.sortBy(_._1).map { case (lang, stops) =>
      val inList = stops.map(s => s"'$s'").mkString(", ")
      s"    CAST(len(list_filter(words, x -> x IN ($inList))) AS DOUBLE) / GREATEST(len(words), 1) AS score_$lang"
    }
    val valueRows = ("zh" +: LangProfiles.keys.toSeq.sorted)
      .map(l => s"('$l', score_$l)")
      .mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id,
       |    string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ') AS words,
       |    CAST(LENGTH(REGEXP_REPLACE(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS DOUBLE)
       |      / GREATEST(LENGTH(text), 1) AS score_zh
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, score_zh,
       |${scoreCols.mkString(",\n")}
       |  FROM w),
       |u AS (
       |  SELECT doc_id, t.lang, t.score
       |  FROM s CROSS JOIN LATERAL (VALUES $valueRows) t(lang, score)),
       |r AS (
       |  SELECT doc_id, lang, score,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rnk
       |  FROM u)
       |SELECT doc_id,
       |  CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred,
       |  ROUND(score, 6) AS score
       |FROM r WHERE rnk = 1
       |ORDER BY doc_id""".stripMargin
  }

  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    fingerprints(Tables.documents(spark, dir))

  /** Winnowing oracle: Winnow's hash is polynomial mod 2⁶¹−1 exactly so
    * this SQL can reproduce it — each k-gram hash is a list_reduce fold
    * in HUGEINT (128-bit, exact), the winnow selection is a 4-row
    * sliding MIN (full windows only), and docs with fewer than `win`
    * grams take the min over all their grams (the kernel's
    * w = min(win, grams) clamp).
    */
  val textFingerprintSql: String = {
    val k = 8
    val base = graft.functions.Winnow.Base
    val p = graft.functions.Winnow.P
    s"""WITH normed AS (
       |  SELECT doc_id, LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS s FROM documents
       |  WHERE LENGTH(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))) > 0),
       |pos AS (
       |  SELECT doc_id, s,
       |    UNNEST(range(1, GREATEST(LENGTH(s) - $k + 1, 1) + 1)) AS i,
       |    LENGTH(s) AS n
       |  FROM normed),
       |grams AS (
       |  SELECT doc_id, i,
       |    list_reduce(
       |      list_transform(range(i, i + LEAST(n - i + 1, $k)),
       |                     j -> CAST(unicode(substr(s, CAST(j AS INT), 1)) AS HUGEINT)),
       |      (h, c) -> (h * $base + c) % $p) AS h,
       |    COUNT(*) OVER (PARTITION BY doc_id) AS grams_n
       |  FROM pos),
       |fps AS (
       |  SELECT doc_id, fp FROM (
       |    SELECT doc_id, grams_n,
       |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS rn,
       |      MIN(h) OVER (PARTITION BY doc_id ORDER BY i
       |                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
       |    FROM grams) w
       |  WHERE grams_n >= 4 AND rn >= 4
       |  UNION ALL
       |  SELECT doc_id, MIN(h) AS fp FROM grams
       |  GROUP BY doc_id HAVING COUNT(*) < 4)
       |SELECT DISTINCT doc_id, CAST(fp AS BIGINT) AS fingerprint
       |FROM fps
       |ORDER BY doc_id, fingerprint""".stripMargin
  }

  /** Within-document repetition signals — the Gopher/RefinedWeb-style
    * "repetitious text" filters (Rae et al. 2021 §A1.1): the fraction
    * of word occurrences that are repeats, the same for word bigrams,
    * and the share of the single most frequent bigram. High values mark
    * boilerplate / spam / generation loops that a training-data
    * pipeline drops before dedup even runs.
    *
    * Scale shape: ZERO shuffles — every statistic is a function of one
    * document, computed by the one-pass native RepetitionStats kernel
    * (graft.functions.Shingling) in the scan-side projection. The
    * first cut of this operator exploded a tagged (doc, gram) stream
    * through two aggregations; that shuffled one row per gram
    * occurrence and ran an interpreted per-word lambda — 7.3 s at
    * sf0.1 against ~0.4 s for the kernel, and strictly worse at the
    * design point where the gram stream is corpus×shingle-factor
    * sized.
    */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val nb = nullif(col("__r.n_bigrams"), lit(0L))
    docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), graft.functions.Shingling.repetitionStats(expr(NormSql)).as("__r"))
      .select(
        col("doc_id"),
        col("__r.n_words").as("n_words"),
        round(
          (col("__r.n_words") - col("__r.n_distinct_words")).cast("double") / col("__r.n_words"),
          6
        ).as("dup_word_frac"),
        col("__r.n_bigrams").as("n_bigrams"),
        round((col("__r.n_bigrams") - col("__r.n_distinct_bigrams")).cast("double") / nb, 6)
          .as("dup_bigram_frac"),
        round(col("__r.max_bigram").cast("double") / nb, 6).as("top_bigram_frac")
      )
  }

  // ---------------------------------------------------------------------
  // Corpus reporting and deterministic splits
  // ---------------------------------------------------------------------

  /** Per-(source, lang) corpus report — the first thing a pipeline run
    * prints: document counts and character-length distribution. Plain
    * algebraic aggregation: one shuffle of (source, lang)-keyed partial
    * aggregates; the sum is exact integer arithmetic so the average is
    * deterministic in both engines.
    */
  def corpusStats(docs: DataFrame): DataFrame =
    docs
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 6).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars")
      )

  /** Character-class profile per source — the mojibake / format-drift
    * screen a curation pass runs before trusting language ID or token
    * counts: fractions of lowercase, uppercase, digit, whitespace, and
    * other characters. A source whose "other" fraction jumps is
    * carrying markup, encoding damage, or binary spill.
    *
    * Scale shape: four regexp_count projections map-side (identical
    * POSIX-free character classes in both engines), ONE source-grain
    * algebraic agg of exact integer counts; fractions divide at the
    * k-row grain.
    */
  def charsetProfile(docs: DataFrame): DataFrame = {
    def cc(pat: String) = regexp_count(col("text"), lit(pat)).cast("long")
    val counted = docs
      .filter(col("text").isNotNull)
      .select(
        col("source"),
        length(col("text")).cast("long").as("__n"),
        cc("[a-z]").as("__lo"),
        cc("[A-Z]").as("__up"),
        cc("[0-9]").as("__dg"),
        cc("[ \\t\\n\\r]").as("__ws")
      )
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_chars"),
        sum(col("__lo")).as("__slo"),
        sum(col("__up")).as("__sup"),
        sum(col("__dg")).as("__sdg"),
        sum(col("__ws")).as("__sws")
      )
    def frac(c: Column) = round(c.cast("double") / col("n_chars"), 6)
    counted.select(
      col("source"),
      col("n_docs"),
      col("n_chars"),
      frac(col("__slo")).as("lower_frac"),
      frac(col("__sup")).as("upper_frac"),
      frac(col("__sdg")).as("digit_frac"),
      frac(col("__sws")).as("space_frac"),
      frac(
        col("n_chars") - col("__slo") - col("__sup") - col("__sdg") - col("__sws")
      ).as("other_frac")
    )
  }

  def corpusCharset(spark: SparkSession, dir: String): DataFrame =
    charsetProfile(graft.Tables.documents(spark, dir)).orderBy(col("source"))

  /** Oracle: identical character classes and integer sums. */
  val corpusCharsetSql: String =
    """WITH c AS (
      |  SELECT source, CAST(LENGTH(text) AS BIGINT) AS n,
      |    CAST(len(regexp_extract_all(text, '[a-z]')) AS BIGINT) AS lo,
      |    CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS up,
      |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS dg,
      |    CAST(len(regexp_extract_all(text, '[ \t\n\r]')) AS BIGINT) AS ws
      |  FROM documents WHERE text IS NOT NULL),
      |a AS (
      |  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_chars,
      |    CAST(SUM(lo) AS BIGINT) AS slo, CAST(SUM(up) AS BIGINT) AS sup,
      |    CAST(SUM(dg) AS BIGINT) AS sdg, CAST(SUM(ws) AS BIGINT) AS sws
      |  FROM c GROUP BY 1)
      |SELECT source, n_docs, n_chars,
      |  ROUND(CAST(slo AS DOUBLE) / n_chars, 6) AS lower_frac,
      |  ROUND(CAST(sup AS DOUBLE) / n_chars, 6) AS upper_frac,
      |  ROUND(CAST(sdg AS DOUBLE) / n_chars, 6) AS digit_frac,
      |  ROUND(CAST(sws AS DOUBLE) / n_chars, 6) AS space_frac,
      |  ROUND(CAST(n_chars - slo - sup - sdg - sws AS DOUBLE) / n_chars, 6) AS other_frac
      |FROM a
      |ORDER BY source""".stripMargin

  /** Deterministic train/val/test assignment: bucket = a 60-bit md5
    * prefix of the doc id string, mod 100 — stable across runs,
    * machines, and engines (no RNG, no row order dependence), the
    * standard way a pipeline splits a corpus reproducibly. Map-side
    * only.
    */
  def deterministicSplit(docs: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame =
    docs.select(col("doc_id"), splitColumn(trainPct, valPct).as("split"))

  // ---------------------------------------------------------------------
  // Fixed driver queries
  // ---------------------------------------------------------------------

  /** Corpus-LM negative log-likelihood per document — the KenLM/CCNet
    * quality-filter proxy as a pure relational job: a unigram word
    * model is estimated FROM THE CORPUS ITSELF (count/total), and each
    * document scores its mean −ln P(w) in nats/token. Rare-word-heavy
    * documents (OCR noise, gibberish, lorem) score high; templated/
    * common text scores low — the standard "document prior" screen
    * before a real LM filter exists.
    *
    * Scale shape: one word-keyed partial-agg shuffle estimates the
    * model; the score join is keyed identically (co-partitioned); the
    * per-doc rollup is one doc-keyed partial agg; the model total is a
    * 1-row broadcast (the bm25 stats-relation pattern). Portability:
    * ln of an identical rational rounds to 9 decimals on both engines
    * (the ln-round-9 discipline), and per-doc sums route through
    * DECIMAL so addition order can't drift.
    */
  def tokenPerplexity(docs: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    val words = docs.select(col("doc_id"), explode(expr(WordsSql)).as("w"))
    val model = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = model.agg(sum(col("c")).cast("double").as("total"))
    words
      .join(model, "w")
      .crossJoin(broadcast(total))
      .select(
        col("doc_id"),
        round(log(col("c").cast("double") / col("total")), 9).as("lp")
      )
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(-sum(col("lp").cast(dec)).cast("double") / count(lit(1)), 6).as("nll")
      )
  }

  def textPerplexity(spark: SparkSession, dir: String): DataFrame =
    tokenPerplexity(Tables.documents(spark, dir))

  /** Bigram-LM document score — the order-2 step of the CCNet/KenLM
    * quality ladder that [[tokenPerplexity]] starts at order 1: each
    * document's mean −ln P(w₂|w₁) under a Jelinek-Mercer interpolated
    * bigram model estimated from the corpus itself,
    * P(w₂|w₁) = λ·c(w₁w₂)/c(w₁·) + (1−λ)·c(w₂)/T with pinned λ = 0.75.
    * Sequence-breaking text (shuffled words, gibberish transitions)
    * scores high even when its unigram mix looks normal — exactly the
    * failure mode the unigram prior cannot see. Documents need ≥ 2
    * words to have a bigram; shorter ones are excluded (declared).
    *
    * Scale shape: ONE bigram-keyed partial agg estimates c(w₁w₂) (the
    * corpus_cond_entropy key), word-keyed aggs for c(w₁·) and c(w₂),
    * score joins co-keyed on the same bigram/word keys, 1-row total
    * broadcast, per-doc rollup — vocabulary-grain relations only, the
    * corpus is never joined to itself or broadcast. Portability: the
    * interpolation is evaluated in ONE pinned expression order, its ln
    * rounds at 9, per-doc sums route through DECIMAL.
    */
  def bigramPerplexity(docs: DataFrame, lambda: Double = 0.75): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    val words = docs.select(col("doc_id"), expr(WordsSql).as("__ws"))
    val bi = words
      .filter(size(col("__ws")) >= 2)
      .select(
        col("doc_id"),
        explode(
          expr(
            """transform(sequence(1, size(__ws) - 1),
              |  i -> struct(element_at(__ws, i) AS w1, element_at(__ws, i + 1) AS w2))""".stripMargin
          )
        ).as("__b")
      )
      .select(col("doc_id"), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    val cb = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cu = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cu"))
    val cw = bi.groupBy(col("w2")).agg(count(lit(1)).as("cw"))
    val total = cw.agg(sum(col("cw")).cast("double").as("total"))
    bi
      .join(cb, Seq("w1", "w2"))
      .join(cu, Seq("w1"))
      .join(cw, Seq("w2"))
      .crossJoin(broadcast(total))
      .select(
        col("doc_id"),
        round(
          log(
            lit(lambda) * (col("cb").cast("double") / col("cu")) +
              lit(1.0 - lambda) * (col("cw").cast("double") / col("total"))
          ),
          9
        ).as("lp")
      )
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        // + 0.0: a degenerate all-certain doc has sum(lp) = 0 and the
        // negated round can emit −0.0 in one engine (the clusterNmi
        // signed-zero guard)
        (round(-sum(col("lp").cast(dec)).cast("double") / count(lit(1)), 6) + lit(0.0)).as("nll2")
      )
  }

  def textPerplexity2(spark: SparkSession, dir: String): DataFrame =
    bigramPerplexity(Tables.documents(spark, dir))

  /** Bigram-LM oracle: identical bigram/margin counts and the same
    * pinned interpolation order, ln-round-9, DECIMAL per-doc sums.
    */
  val textPerplexity2Sql: String =
    s"""WITH normed AS (
       |  SELECT doc_id, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |  FROM documents),
       |bi AS (
       |  SELECT doc_id,
       |    ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
       |  FROM normed, UNNEST(range(1, len(ws))) AS u(i)
       |  WHERE len(ws) >= 2),
       |cb AS (SELECT w1, w2, COUNT(*) AS cb FROM bi GROUP BY 1, 2),
       |cu AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu FROM cb GROUP BY 1),
       |cw AS (SELECT w2, COUNT(*) AS cw FROM bi GROUP BY 1),
       |tt AS (SELECT CAST(SUM(cw) AS DOUBLE) AS total FROM cw),
       |s AS (
       |  SELECT bi.doc_id,
       |    ROUND(LN(0.75 * (CAST(cb.cb AS DOUBLE) / cu.cu)
       |      + 0.25 * (CAST(cw.cw AS DOUBLE) / tt.total)), 9) AS lp
       |  FROM bi
       |  JOIN cb USING (w1, w2) JOIN cu USING (w1) JOIN cw USING (w2)
       |  CROSS JOIN tt)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  ROUND(-CAST(SUM(CAST(lp AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*), 6) + 0.0 AS nll2
       |FROM s GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  val textPerplexitySql: String =
    s"""WITH normed AS (
       |  SELECT doc_id, LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS nm
       |  FROM documents),
       |w AS (SELECT doc_id, UNNEST(string_split(nm, ' ')) AS w FROM normed),
       |m AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w),
       |tt AS (SELECT CAST(SUM(c) AS DOUBLE) AS total FROM m),
       |s AS (
       |  SELECT w.doc_id, ROUND(LN(CAST(m.c AS DOUBLE) / tt.total), 9) AS lp
       |  FROM w JOIN m USING (w) CROSS JOIN tt)
       |SELECT doc_id, COUNT(*) AS n_tokens,
       |  ROUND(-CAST(SUM(CAST(lp AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*), 6) AS nll
       |FROM s GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  def corpusStatsQ(spark: SparkSession, dir: String): DataFrame =
    corpusStats(Tables.documents(spark, dir)).orderBy(col("source"), col("lang"))

  /** The corpus report with ROLLUP subtotals — per (source, lang),
    * per source, and the grand total in ONE aggregation pass (Spark
    * expands grouping sets inside the same partial-agg shuffle; no
    * extra scan per level). NULL grouping keys are rendered as 'ALL'
    * for readability, and `lvl` (grouping_id: bit 2 = source rolled
    * up, bit 1 = lang rolled up) is carried as an output AND sort
    * column so a subtotal row can never collide with a real group
    * that happens to contain a NULL or literal 'ALL' key — the
    * (source, lang, lvl) order is total by construction.
    */
  def corpusRollup(docs: DataFrame): DataFrame =
    docs
      .rollup(col("source"), col("lang"))
      .agg(
        // grouping_id is only resolvable inside the rollup aggregate
        grouping_id().cast("long").as("lvl"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars")
      )
      .select(
        coalesce(col("source"), lit("ALL")).as("source"),
        coalesce(col("lang"), lit("ALL")).as("lang"),
        col("lvl"),
        col("n_docs"),
        col("total_chars"),
        col("min_chars"),
        col("max_chars")
      )

  def corpusRollupQ(spark: SparkSession, dir: String): DataFrame =
    corpusRollup(Tables.documents(spark, dir)).orderBy(col("source"), col("lang"), col("lvl"))

  val corpusRollupSql: String =
    """SELECT COALESCE(source, 'ALL') AS source, COALESCE(lang, 'ALL') AS lang,
      |  CAST(GROUPING(source, lang) AS BIGINT) AS lvl,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents
      |GROUP BY ROLLUP (source, lang)
      |ORDER BY source, lang, lvl""".stripMargin

  val corpusStatsSql: String =
    """SELECT source, lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents
      |GROUP BY 1, 2
      |ORDER BY source, lang""".stripMargin

  def textSplit(spark: SparkSession, dir: String): DataFrame =
    deterministicSplit(Tables.documents(spark, dir))

  val textSplitSql: String =
    s"""SELECT doc_id,
       |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
       |FROM (
       |  SELECT doc_id,
       |    ${Dedup.md5Prefix60Duck("CAST(doc_id AS VARCHAR)")} % 100 AS b
       |  FROM documents) t
       |ORDER BY doc_id""".stripMargin

  /** Corpus drift: Jensen–Shannon divergence between the word
    * distributions of two corpus slices (here: language pairs) — the
    * distribution-shift report a pipeline runs when a new crawl or
    * source lands. JS(P,Q) = ½KL(P‖M) + ½KL(Q‖M), M = ½(P+Q); zero-
    * probability terms contribute 0 by the usual convention.
    *
    * Scale shape: ONE (slice, word)-keyed partial aggregation reduces
    * the corpus to vocabulary size; the per-pair support union is a
    * FULL OUTER join ON THE WORD KEY (the [[sourceDivergence]]
    * discipline — vocabulary-grain relations SHUFFLE on word, they are
    * never broadcast; only the slice-grain totals and the slice-pair
    * list, both |slices|-bounded, ride the broadcast). Words absent
    * from both slices of a pair contribute an exact-zero term, so the
    * union support sums identically to the full pair × vocab grid the
    * oracle spells out. Portability: probabilities are exact-integer
    * ratios, the one transcendental (ln) is ROUNDed to 9 decimals on
    * identical inputs, and per-word terms sum through DECIMAL.
    */
  def corpusDrift(docs: DataFrame): DataFrame = {
    val d = docs.filter(col("text").isNotNull)
    val w = d
      .select(col("lang"), explode(expr(WordsSql)).as("word"))
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("c"))
    val tot = w.groupBy(col("lang")).agg(sum(col("c")).as("n"))
    val p = w.join(broadcast(tot), "lang").select(
      col("lang"),
      col("word"),
      (col("c").cast("double") / col("n")).as("p")
    )
    val langs = d.select(col("lang")).distinct()
    val prs = langs
      .select(col("lang").as("la"))
      .join(langs.select(col("lang").as("lb")), col("la") < col("lb"))
    val pa = p
      .join(broadcast(prs), col("lang") === col("la"))
      .select(col("la"), col("lb"), col("word"), col("p").as("pa"))
    val pb = p
      .join(broadcast(prs), col("lang") === col("lb"))
      .select(col("la"), col("lb"), col("word"), col("p").as("pb"))
    val g = pa
      .join(pb, Seq("la", "lb", "word"), "full_outer")
      .select(
        col("la"),
        col("lb"),
        coalesce(col("pa"), lit(0.0)).as("pa"),
        coalesce(col("pb"), lit(0.0)).as("pb")
      )
    val m = (col("pa") + col("pb")) / lit(2.0)
    val term =
      when(col("pa") > 0, col("pa") * round(log(col("pa") / m), 9)).otherwise(lit(0.0)) +
        when(col("pb") > 0, col("pb") * round(log(col("pb") / m), 9)).otherwise(lit(0.0))
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    g.select(col("la"), col("lb"), term.as("t"), col("pa"), col("pb"))
      .groupBy(col("la"), col("lb"))
      .agg(
        round(lit(0.5) * sum(col("t").cast(dec)).cast("double"), 6).as("js_divergence"),
        sum(when(col("pa") > 0 && col("pb") > 0, 1L).otherwise(0L)).as("n_shared_words")
      )
  }

  /** Count-min sketch heavy-hitter report (Cormode & Muthukrishnan
    * 2005) via Spark's NATIVE `count_min_sketch` aggregate: the
    * fixed-memory path to approximate token counts when the exact
    * vocabulary aggregation is too expensive to run on every pass.
    * The report ranks the top-k exact heavy hitters (the acceptance
    * baseline) against the sketch's point estimates — the
    * overcount column is the thing a pipeline monitors before
    * trusting sketch counts downstream.
    *
    * Scale shape — the whole point at 100 TB: the sketch aggregate's
    * partial state is a FIXED d×w counter array, merged counter-wise
    * across partitions map-side, so the exchange carries
    * O(partitions × sketch) bytes regardless of vocabulary size
    * (contrast the exact count's vocabulary-grain shuffle). The
    * driver holds one sketch (~w·d longs) + k report rows.
    * Determinism: the sketch's hash seeds derive from the fixed
    * `seed`, so estimates are reproducible run to run; the spec pins
    * the CMS guarantees (estimate ≥ exact, ≤ exact + ε·N) and
    * counter-wise mergeability across corpus splits.
    */
  def corpusCmsReport(
    docs: DataFrame,
    k: Int = 25,
    eps: Double = 0.0005,
    confidence: Double = 0.99,
    seed: Int = 42
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .filter(col("text").isNotNull)
      .select(explode(expr(WordsSql)).as("word"))
      .filter(length(col("word")) > 0)
    val skBytes = words
      .agg(count_min_sketch(col("word"), lit(eps), lit(confidence), lit(seed)).as("sk"))
      .head()
      .getAs[Array[Byte]]("sk")
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skBytes))
    val top = words
      .groupBy(col("word"))
      .agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("word"))
      .limit(k)
      .as[(String, Long)]
      .collect()
    top.toSeq
      .map { case (w, exact) =>
        val est = cms.estimateCount(w)
        (w, exact, est, est - exact)
      }
      .toDF("word", "exact", "estimate", "overcount")
      .orderBy(col("exact").desc, col("word"))
  }

  def corpusCms(spark: SparkSession, dir: String): DataFrame =
    corpusCmsReport(Tables.documents(spark, dir))

  /** HyperLogLog distinct-token report per language (Flajolet et al.
    * 2007), hand-rolled on the shared 60-bit md5-prefix hash so the
    * sketch is BIT-REPRODUCIBLE in any engine — the property the
    * native `approx_count_distinct` (HLL++, private seeds) cannot
    * give an oracle. p=10 → m=1024 registers: register = top 10 hash
    * bits, rank = leading-zero count of the remaining 50-bit field +1
    * (computed by bit-smear OR-cascade + bit_count — pure integer
    * ops, no float log), estimate = αm²/Σ2^(−Mⱼ) with the standard
    * small-range linear-counting switch at 2.5m. The report ranks the
    * sketch against the exact per-language distinct count — the
    * rel_err column is what a pipeline checks before trusting sketch
    * cardinalities at 100 TB where the exact count is the expensive
    * path.
    *
    * Scale shape: hashing/register/rank are map-side arithmetic on the
    * exploded words; the ONE data-scale aggregation reduces each
    * partition to ≤ m rows per language BEFORE the exchange (partial
    * MAX per (lang, register)), so the shuffle carries
    * O(partitions × m) rows regardless of vocabulary — the
    * fixed-memory contrast to the exact count's vocabulary-grain
    * shuffle (kept here only as the acceptance baseline, exactly as in
    * [[corpusCmsReport]]). Portability: the register sum is
    * integer-scaled by 2^51 (terms 2^(51−Mⱼ) are exact longs, total
    * ≤ 2^61 — double summation would round past 2^53), the α·m²·2^51
    * numerator is spelled from literals in identical op order in both
    * engines, and the branch compares the identical raw double.
    */
  def corpusHllReport(docs: DataFrame): DataFrame = {
    val words = docs
      .filter(col("text").isNotNull)
      .select(col("lang"), explode(expr(WordsSql)).as("word"))
      .filter(length(col("word")) > 0)
    // rank = 51 - bitlength(r) over the low 50 hash bits; bitlength by
    // OR-smearing r into (2^bitlength - 1) then popcounting
    val grid = words
      .select(col("lang"), expr(Dedup.md5Prefix60Sql("word")).as("__h"))
      .select(
        col("lang"),
        expr("shiftright(__h, 50)").as("__reg"),
        expr("__h & 1125899906842623").as("__s") // low 50 bits
      )
      .withColumn("__s", col("__s").bitwiseOR(shiftright(col("__s"), 1)))
      .withColumn("__s", col("__s").bitwiseOR(shiftright(col("__s"), 2)))
      .withColumn("__s", col("__s").bitwiseOR(shiftright(col("__s"), 4)))
      .withColumn("__s", col("__s").bitwiseOR(shiftright(col("__s"), 8)))
      .withColumn("__s", col("__s").bitwiseOR(shiftright(col("__s"), 16)))
      .withColumn("__s", col("__s").bitwiseOR(shiftright(col("__s"), 32)))
      .select(
        col("lang"),
        col("__reg"),
        (lit(51) - bit_count(col("__s"))).cast("long").as("__rank")
      )
      .groupBy(col("lang"), col("__reg"))
      .agg(max(col("__rank")).as("__m"))
    val perLang = grid
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("__present"),
        // register sum integer-scaled by 2^51: terms are exact longs
        sum(expr("shiftleft(cast(1 as bigint), cast(51 - __m as int))")).as("__zs")
      )
      .select(
        col("lang"),
        (lit(1024L) - col("__present")).as("v_zero"),
        (col("__zs") + (lit(1024L) - col("__present")) * lit(2251799813685248L)).as("__z")
      )
      // alpha * m^2 * 2^51, spelled from literals in identical op order
      // in both engines (0.7213/(1 + 1.079/m) is the standard m>=128 alpha)
      .withColumn(
        "__raw",
        expr(
          "(0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0 * 2251799813685248.0"
        ) / col("__z").cast("double")
      )
      .select(
        col("lang"),
        col("v_zero"),
        round(
          when(
            col("__raw") <= 2560.0 && col("v_zero") > 0,
            lit(1024.0) * round(log(lit(1024.0) / col("v_zero").cast("double")), 9)
          ).otherwise(col("__raw")),
          6
        ).as("hll_estimate")
      )
    val exact = words
      .groupBy(col("lang"))
      .agg(countDistinct(col("word")).as("exact_distinct"))
    perLang
      .join(broadcast(exact), Seq("lang"))
      .select(
        col("lang"),
        col("v_zero"),
        col("hll_estimate"),
        col("exact_distinct"),
        round(
          abs(col("hll_estimate") - col("exact_distinct").cast("double")) /
            col("exact_distinct").cast("double"),
          6
        ).as("rel_err")
      )
  }

  def corpusHll(spark: SparkSession, dir: String): DataFrame =
    corpusHllReport(Tables.documents(spark, dir)).orderBy(col("lang"))

  /** HLL oracle: identical hash/register/smear-rank integer pipeline,
    * the same 2^51-scaled register sum, and the same literal-spelled
    * α·m²·2^51 numerator and linear-counting branch.
    */
  val corpusHllSql: String =
    s"""WITH w AS (
      |  SELECT lang, u.word
      |  FROM (SELECT lang, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ') AS ws
      |        FROM documents WHERE text IS NOT NULL) t,
      |       UNNEST(ws) AS u(word)
      |  WHERE LENGTH(u.word) > 0),
      |h AS (
      |  SELECT lang, ${Dedup.md5Prefix60Duck("word")} AS h FROM w),
      |r0 AS (
      |  SELECT lang, h >> 50 AS reg, h & 1125899906842623 AS s FROM h),
      |r1 AS (SELECT lang, reg, s | (s >> 1) AS s FROM r0),
      |r2 AS (SELECT lang, reg, s | (s >> 2) AS s FROM r1),
      |r3 AS (SELECT lang, reg, s | (s >> 4) AS s FROM r2),
      |r4 AS (SELECT lang, reg, s | (s >> 8) AS s FROM r3),
      |r5 AS (SELECT lang, reg, s | (s >> 16) AS s FROM r4),
      |r6 AS (SELECT lang, reg, s | (s >> 32) AS s FROM r5),
      |grid AS (
      |  SELECT lang, reg, MAX(51 - bit_count(s)) AS m
      |  FROM r6 GROUP BY 1, 2),
      |pl AS (
      |  SELECT lang,
      |    1024 - COUNT(*) AS v_zero,
      |    CAST(SUM(CAST(1 AS BIGINT) << CAST(51 - m AS INTEGER)) AS BIGINT)
      |      + (1024 - COUNT(*)) * 2251799813685248 AS z
      |  FROM grid GROUP BY 1),
      |est AS (
      |  SELECT lang, v_zero,
      |    (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0 * 2251799813685248.0
      |      / CAST(z AS DOUBLE) AS raw
      |  FROM pl),
      |fin AS (
      |  SELECT lang, v_zero,
      |    ROUND(CASE WHEN raw <= 2560.0 AND v_zero > 0
      |      THEN 1024.0 * ROUND(LN(1024.0 / CAST(v_zero AS DOUBLE)), 9)
      |      ELSE raw END, 6) AS hll_estimate
      |  FROM est),
      |ex AS (
      |  SELECT lang, COUNT(DISTINCT word) AS exact_distinct FROM w GROUP BY 1)
      |SELECT fin.lang, fin.v_zero, fin.hll_estimate, ex.exact_distinct,
      |  ROUND(ABS(fin.hll_estimate - CAST(ex.exact_distinct AS DOUBLE))
      |    / CAST(ex.exact_distinct AS DOUBLE), 6) AS rel_err
      |FROM fin JOIN ex ON ex.lang = fin.lang
      |ORDER BY fin.lang""".stripMargin

  /** Word burstiness (Church & Gale 1995, "Poisson mixtures"): the
    * variance-to-mean ratio of a word's per-document count over ALL
    * documents (absent docs contribute zero — the moments fold them in
    * for free since zeros add nothing to Σc and Σc²). VMR ≈ 1 is
    * Poisson scatter (function words); VMR ≫ 1 marks bursty,
    * topic-carrying terms that concentrate in few documents — the
    * signal behind tf flattening in retrieval and boilerplate
    * detection in curation.
    *
    * Scale shape: the corpus reduces to (doc, word) grain in one
    * exploded partial agg, then to vocabulary grain in a second — the
    * corpus_drift discipline; the doc-count total is a broadcast
    * 1-row relation. Portability: every moment is an INTEGER sum;
    * vmr derives from them in one pinned double expression; ranking
    * orders the rounded value with a word tie-break.
    */
  def corpusBurstiness(docs: DataFrame, minDf: Long = 5L, k: Int = 25): DataFrame = {
    val d = docs.filter(col("text").isNotNull)
    val wc = d
      .select(col("doc_id"), explode(expr(WordsSql)).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
    val n = d.select(count(lit(1)).as("__N"))
    val mean = col("__s1").cast("double") / col("__N")
    val ex2 = col("__s2").cast("double") / col("__N")
    wc.groupBy(col("word"))
      .agg(
        sum(col("c")).as("__s1"),
        sum(col("c") * col("c")).as("__s2"),
        count(lit(1)).as("df")
      )
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(n))
      .select(
        col("word"),
        col("df"),
        col("__s1").as("tf"),
        round((ex2 - mean * mean) / mean, 6).as("vmr")
      )
      .orderBy(col("vmr").desc, col("word"))
      .limit(k)
  }

  def corpusBurstinessQ(spark: SparkSession, dir: String): DataFrame =
    corpusBurstiness(Tables.documents(spark, dir))

  val corpusBurstinessSql: String =
    """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      |wc AS (
      |  SELECT doc_id, u.word, COUNT(*) AS c
      |  FROM (SELECT doc_id, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ') AS ws FROM d) t,
      |       UNNEST(ws) AS u(word)
      |  GROUP BY 1, 2),
      |n AS (SELECT COUNT(*) AS nn FROM d),
      |st AS (
      |  SELECT word, CAST(SUM(c) AS BIGINT) AS tf, CAST(SUM(c * c) AS BIGINT) AS s2,
      |    COUNT(*) AS df
      |  FROM wc GROUP BY 1)
      |SELECT word, df, tf,
      |  ROUND((CAST(s2 AS DOUBLE) / nn - (CAST(tf AS DOUBLE) / nn) * (CAST(tf AS DOUBLE) / nn))
      |        / (CAST(tf AS DOUBLE) / nn), 6) AS vmr
      |FROM st, n
      |WHERE df >= 5
      |ORDER BY vmr DESC, word
      |LIMIT 25""".stripMargin

  def corpusDriftQ(spark: SparkSession, dir: String): DataFrame =
    corpusDrift(Tables.documents(spark, dir)).orderBy(col("la"), col("lb"))

  val corpusDriftSql: String =
    """WITH d AS (SELECT lang, text FROM documents WHERE text IS NOT NULL),
      |w AS (
      |  SELECT lang, u.word, COUNT(*) AS c
      |  FROM (SELECT lang, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ') AS ws FROM d) t,
      |       UNNEST(ws) AS u(word)
      |  GROUP BY 1, 2),
      |tot AS (SELECT lang, SUM(c) AS n FROM w GROUP BY 1),
      |p AS (SELECT w.lang, w.word, CAST(c AS DOUBLE) / n AS p FROM w JOIN tot ON w.lang = tot.lang),
      |langs AS (SELECT DISTINCT lang FROM d),
      |prs AS (SELECT a.lang AS la, b.lang AS lb FROM langs a JOIN langs b ON a.lang < b.lang),
      |grid AS (SELECT la, lb, word FROM prs CROSS JOIN (SELECT DISTINCT word FROM w) v),
      |g AS (
      |  SELECT grid.la, grid.lb,
      |    COALESCE(pa.p, 0.0) AS pa, COALESCE(pb.p, 0.0) AS pb
      |  FROM grid
      |  LEFT JOIN p pa ON pa.lang = grid.la AND pa.word = grid.word
      |  LEFT JOIN p pb ON pb.lang = grid.lb AND pb.word = grid.word),
      |terms AS (
      |  SELECT la, lb, pa, pb,
      |    (CASE WHEN pa > 0 THEN pa * ROUND(LN(pa / ((pa + pb) / 2.0)), 9) ELSE 0.0 END +
      |     CASE WHEN pb > 0 THEN pb * ROUND(LN(pb / ((pa + pb) / 2.0)), 9) ELSE 0.0 END) AS t
      |  FROM g)
      |SELECT la, lb,
      |  ROUND(0.5 * CAST(SUM(CAST(t AS DECIMAL(27,10))) AS DOUBLE), 6) AS js_divergence,
      |  CAST(SUM(CASE WHEN pa > 0 AND pb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_words
      |FROM terms
      |GROUP BY 1, 2
      |ORDER BY la, lb""".stripMargin

  /** Distinctive keywords per corpus slice: tf-idf over slice word
    * distributions (tf = within-slice frequency ratio, idf over the
    * slices containing the word, +1-smoothed), top-k per slice — the
    * "what characterizes this source" report next to [[corpusDrift]]'s
    * "how far apart are they".
    *
    * Same scale shape as corpusDrift: one (slice, word) partial
    * aggregation reduces the corpus to vocabulary size; scoring joins
    * the word-keyed df relation ON THE WORD KEY (vocabulary grain
    * shuffles, it is never broadcast — only the |slices|-bounded
    * totals ride the broadcast) and the top-k rank compiles to
    * WindowGroupLimit. ln is ROUNDed to 9 decimals
    * on exact-integer-ratio inputs; tf ratios are exact divisions —
    * engine-portable like the BM25 discipline.
    */
  def corpusKeywords(docs: DataFrame, k: Int = 5): DataFrame = {
    val d = docs.filter(col("text").isNotNull)
    val w = d
      .select(col("lang"), explode(expr(WordsSql)).as("word"))
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("c"))
    val tot = w.groupBy(col("lang")).agg(sum(col("c")).as("n"))
    val dfc = w.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val nSlices = w.select(col("lang")).distinct().agg(count(lit(1)).as("s"))
    val score =
      (col("c").cast("double") / col("n")) *
        round(log((col("s") + lit(1.0)) / (col("df") + lit(1.0))), 9)
    val bySlice = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("score").desc, col("word"))
    w.join(broadcast(tot), "lang")
      .join(dfc, "word")
      .crossJoin(broadcast(nSlices))
      .select(col("lang"), col("word"), score.as("score"))
      .withColumn("rank", row_number().over(bySlice))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank").cast("long").as("rank"), col("word"), round(col("score"), 6).as("score"))
  }

  /** Corpus n-gram count table — the raw material of a KenLM-style
    * count-based LM and of the classic "top n-grams" corpus report:
    * positional word 1/2/3-grams (occurrences, NOT distinct — counts
    * are the point) counted corpus-wide, top-k heavy hitters per
    * order. One scan: each row emits a single tagged (n, gram) struct
    * array built map-side, so the three orders don't triple-scan the
    * corpus; the count is one gram-keyed partial agg (map-side
    * combined — skewed stopword grams partial-aggregate before the
    * exchange); the per-order top-k rank compiles to WindowGroupLimit
    * over the aggregated vocabulary relation, which is
    * vocabulary-scale, not corpus-scale.
    */
  def ngramCounts(docs: DataFrame, k: Int = 20): DataFrame = {
    val grams = docs
      .filter(col("text").isNotNull)
      .select(split(expr(NormSql), " ").as("ws"))
      .select(
        explode(
          expr(
            """concat(
              |  transform(ws, g -> struct(1L as n, g as gram)),
              |  case when size(ws) >= 2
              |       then transform(sequence(1, size(ws) - 1),
              |                      i -> struct(2L as n, concat(element_at(ws, i), ' ', element_at(ws, i + 1)) as gram))
              |       else cast(array() as array<struct<n:bigint,gram:string>>) end,
              |  case when size(ws) >= 3
              |       then transform(sequence(1, size(ws) - 2),
              |                      i -> struct(3L as n, concat(element_at(ws, i), ' ', element_at(ws, i + 1), ' ', element_at(ws, i + 2)) as gram))
              |       else cast(array() as array<struct<n:bigint,gram:string>>) end
              |)""".stripMargin
          )
        ).as("g")
      )
      .select(col("g.n").as("n"), col("g.gram").as("gram"))
    val byOrder = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n"))
      .orderBy(col("cnt").desc, col("gram"))
    grams
      .groupBy(col("n"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(byOrder))
      .filter(col("rank") <= k)
      .select(col("n"), col("rank").cast("long").as("rank"), col("gram"), col("cnt"))
  }

  def corpusNgrams(spark: SparkSession, dir: String): DataFrame =
    ngramCounts(Tables.documents(spark, dir)).orderBy(col("n"), col("rank"))

  val corpusNgramsSql: String =
    """WITH wsa AS (
      |  SELECT string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ') AS ws
      |  FROM documents WHERE text IS NOT NULL),
      |g AS (
      |  SELECT CAST(1 AS BIGINT) AS n, UNNEST(ws) AS gram FROM wsa
      |  UNION ALL
      |  SELECT CAST(2 AS BIGINT),
      |    UNNEST(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) FROM wsa
      |  UNION ALL
      |  SELECT CAST(3 AS BIGINT),
      |    UNNEST(list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) FROM wsa),
      |c AS (SELECT n, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
      |r AS (
      |  SELECT n, gram, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY n ORDER BY cnt DESC, gram) AS rank
      |  FROM c)
      |SELECT n, rank, gram, cnt FROM r WHERE rank <= 20
      |ORDER BY n, rank""".stripMargin

  def corpusKeywordsQ(spark: SparkSession, dir: String): DataFrame =
    corpusKeywords(Tables.documents(spark, dir)).orderBy(col("lang"), col("rank"))

  val corpusKeywordsSql: String =
    """WITH d AS (SELECT lang, text FROM documents WHERE text IS NOT NULL),
      |w AS (
      |  SELECT lang, u.word, COUNT(*) AS c
      |  FROM (SELECT lang, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ') AS ws FROM d) t,
      |       UNNEST(ws) AS u(word)
      |  GROUP BY 1, 2),
      |tot AS (SELECT lang, SUM(c) AS n FROM w GROUP BY 1),
      |dfc AS (SELECT word, COUNT(*) AS df FROM w GROUP BY 1),
      |s AS (SELECT COUNT(DISTINCT lang) AS s FROM w),
      |scored AS (
      |  SELECT w.lang, w.word,
      |    (CAST(c AS DOUBLE) / n) * ROUND(LN((s.s + 1.0) / (df + 1.0)), 9) AS score
      |  FROM w JOIN tot ON w.lang = tot.lang JOIN dfc ON w.word = dfc.word CROSS JOIN s),
      |ranked AS (
      |  SELECT lang, word, score,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, word) AS rank
      |  FROM scored)
      |SELECT lang, rank, word, ROUND(score, 6) AS score
      |FROM ranked WHERE rank <= 5
      |ORDER BY lang, rank""".stripMargin

  def textRepetition(spark: SparkSession, dir: String): DataFrame =
    repetitionSignals(Tables.documents(spark, dir))

  /** Repetition oracle: the identical tagged unigram/bigram stream via
    * UNNEST (bigram i spans words[i], words[i+1]; range(1, len) is
    * empty below 2 words, matching the Spark guard), the same two-level
    * count, and integer-derived double ratios — all arithmetic exact
    * until the final ROUND.
    */
  val textRepetitionSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ') AS w
      |  FROM documents
      |  WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0),
      |uni AS (SELECT doc_id, 1 AS k, u.g FROM t, UNNEST(w) AS u(g)),
      |bi AS (
      |  SELECT doc_id, 2 AS k, w[CAST(r.i AS INT)] || ' ' || w[CAST(r.i AS INT) + 1] AS g
      |  FROM t, UNNEST(range(1, len(w))) AS r(i)),
      |c AS (
      |  SELECT doc_id, k, g, COUNT(*) AS c
      |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi) u
      |  GROUP BY 1, 2, 3),
      |a AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN k = 1 THEN c END) AS nw,
      |    COUNT(CASE WHEN k = 1 THEN 1 END) AS dw,
      |    SUM(CASE WHEN k = 2 THEN c END) AS nb,
      |    COUNT(CASE WHEN k = 2 THEN 1 END) AS db,
      |    MAX(CASE WHEN k = 2 THEN c END) AS mb
      |  FROM c GROUP BY 1)
      |SELECT doc_id,
      |  CAST(nw AS BIGINT) AS n_words,
      |  ROUND(CAST(nw - dw AS DOUBLE) / nw, 6) AS dup_word_frac,
      |  CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams,
      |  ROUND(CAST(nb - db AS DOUBLE) / nb, 6) AS dup_bigram_frac,
      |  ROUND(CAST(mb AS DOUBLE) / nb, 6) AS top_bigram_frac
      |FROM a
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // RAG chunking
  // ---------------------------------------------------------------------

  /** Sliding-window document chunker — the retrieval-corpus prep step
    * (split every document into `window`-word chunks every `stride`
    * words, overlap = window − stride) that feeds embedding and ANN
    * indexing. Emits one row per chunk with its word offset, length,
    * and a 60-bit content hash (the exact-dedup key: identical chunks
    * collide, so chunk-level dedup composes downstream exactly like
    * [[Dedup.exactDuplicates]] over documents).
    *
    * Chunk starts are 0, stride, 2·stride, … for every start < word
    * count, so the tail chunk may be shorter than `window` but no
    * word is ever dropped. (Reference analog: the streaming engine
    * chunks timeseries into fixed spans the same way —
    * reference/src/main/scala/.../TimeSeriesFlow.scala pages data by
    * fixed-size spans; here the span unit is words.)
    *
    * Scale shape: one scan, zero shuffle — starts are generated and
    * sliced inside a single codegen'd projection (`transform` over
    * `sequence`, then one explode), so chunking pipelines into
    * whatever consumes it without an exchange; the output carries
    * hashes and offsets, not duplicated text, so the explode grows
    * rows ~n_words/stride× but bytes stay O(corpus).
    */
  def chunkDocuments(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window, s"stride must be in [1, window], got $stride")
    docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(expr(NormSql), " ").as("ws"))
      .select(
        col("doc_id"),
        explode(
          expr(
            s"""transform(sequence(0, size(ws) - 1, $stride),
               |  st -> struct(st,
               |               least($window, size(ws) - st) AS nw,
               |               array_join(slice(ws, st + 1, $window), ' ') AS ctext))""".stripMargin
          )
        ).as("c")
      )
      .select(
        col("doc_id"),
        (col("c.st") / stride).cast("long").as("chunk_id"),
        col("c.st").cast("long").as("start_word"),
        col("c.nw").cast("long").as("n_words"),
        length(col("c.ctext")).cast("long").as("n_chars"),
        expr(Dedup.md5Prefix60Sql("c.ctext")).as("chunk_hash")
      )
  }

  def textChunk(spark: SparkSession, dir: String): DataFrame =
    chunkDocuments(Tables.documents(spark, dir))

  /** Chunk oracle: the identical start grid via range(0, len, stride),
    * 1-based inclusive list slices matching Spark's slice(pos, len),
    * and the shared md5-prefix hash.
    */
  val textChunkSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |  FROM documents
       |  WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0),
       |c AS (
       |  SELECT doc_id, CAST(r.st AS BIGINT) AS start_word,
       |    LEAST(64, len(ws) - CAST(r.st AS BIGINT)) AS nw,
       |    array_to_string(ws[CAST(r.st AS INT) + 1 : CAST(r.st AS INT) + 64], ' ') AS ctext
       |  FROM t, UNNEST(range(0, len(ws), 48)) AS r(st))
       |SELECT doc_id, start_word // 48 AS chunk_id, start_word,
       |  CAST(nw AS BIGINT) AS n_words,
       |  CAST(LENGTH(ctext) AS BIGINT) AS n_chars,
       |  ${Dedup.md5Prefix60Duck("ctext")} AS chunk_hash
       |FROM c
       |ORDER BY doc_id, chunk_id""".stripMargin

  /** Zipf-law fit over the corpus frequency spectrum — the one-number
    * corpus health check (natural corpora slope ≈ −1; template/spam
    * mass and truncated vocabularies bend it) fitted as ordinary least
    * squares of ln(freq) on ln(rank) over the top `topN` words.
    *
    * Scale shape: the word histogram is the standard corpus-scale
    * partial aggregation; everything after runs at TOP-N scale — the
    * rank cut is orderBy+limit (TakeOrderedAndProject, no global sort
    * materializes, no unpartitioned corpus-size window), the rank
    * itself is a window over the already-limited `topN` rows, and the
    * OLS moments are one tiny aggregate. Portability: ln's round-9,
    * every moment sum routed through DECIMAL(27,10) (the x·y double
    * products are identical binary64 in both engines; the decimal sum
    * makes the ORDER irrelevant), and the closed-form slope/intercept
    * are computed in one pinned expression order, round-6.
    */
  def zipfFit(docs: DataFrame, topN: Int = 1000): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    val top = docs
      .filter(col("text").isNotNull)
      .select(explode(expr(WordsSql)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(topN)
    val byFreq = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("word"))
    val xy = top
      .withColumn("rank", row_number().over(byFreq))
      .select(
        round(log(col("rank")), 9).as("x"),
        round(log(col("freq")), 9).as("y")
      )
    val m = xy.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(dec)).cast("double").as("sx"),
      sum(col("y").cast(dec)).cast("double").as("sy"),
      sum((col("x") * col("y")).cast(dec)).cast("double").as("sxy"),
      sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx")
    )
    m.select(
      col("n").as("n_words"),
      round(
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")),
        6
      ).as("slope"),
      round(
        (col("sy") -
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("n"),
        6
      ).as("intercept")
    )
  }

  def corpusZipf(spark: SparkSession, dir: String): DataFrame =
    zipfFit(Tables.documents(spark, dir))

  /** The identical top-N spectrum, round-9 logs, DECIMAL moments and
    * pinned closed-form OLS.
    */
  val corpusZipfSql: String =
    """WITH w AS (
      |  SELECT u.word, COUNT(*) AS freq
      |  FROM (SELECT string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ') AS ws
      |        FROM documents WHERE text IS NOT NULL) t,
      |       UNNEST(ws) AS u(word)
      |  WHERE LENGTH(u.word) > 0
      |  GROUP BY 1
      |  ORDER BY freq DESC, word
      |  LIMIT 1000),
      |xy AS (
      |  SELECT ROUND(LN(ROW_NUMBER() OVER (ORDER BY freq DESC, word)), 9) AS x,
      |    ROUND(LN(freq), 9) AS y
      |  FROM w),
      |m AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(27,10))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x * y AS DECIMAL(27,10))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(x * x AS DECIMAL(27,10))) AS DOUBLE) AS sxx
      |  FROM xy)
      |SELECT n AS n_words,
      |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
      |  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept
      |FROM m""".stripMargin

  /** Language-ID evaluation — the confusion matrix of the heuristic
    * classifier against the corpus's labeled `lang` column, as a
    * query: the model-eval-as-aggregation pattern every curation
    * pipeline runs after swapping a classifier (precision per
    * language falls out of the matrix row/column sums).
    *
    * Scale shape: truth and prediction come from the SAME scan row
    * (the prediction is a pure projection — no join against a
    * prediction table), and the rollup is a languages²-cardinality
    * partial agg. All-integer outputs.
    */
  def langidEval(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("lang").as("lang_true"), langPredColumn.as("lang_pred"))
      .groupBy(col("lang_true"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang_true"), col("lang_pred"))

  def langidEvalQ(spark: SparkSession, dir: String): DataFrame =
    langidEval(Tables.documents(spark, dir))

  /** Oracle: the langid prediction pipeline as a CTE (identical
    * scoring + tie order), joined back to the labeled column and
    * rolled up.
    */
  def langidEvalSql: String =
    s"""WITH pred AS (${textLangidSql.stripSuffix("ORDER BY doc_id")})
       |SELECT d.lang AS lang_true, p.lang_pred, COUNT(*) AS n
       |FROM pred p JOIN documents d ON d.doc_id = p.doc_id
       |WHERE d.text IS NOT NULL
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** Approximate per-source vocabulary — the 100 TB scale path for
    * exact COUNT(DISTINCT word) rollups: HLL++ sketches
    * (`approx_count_distinct`) are FIXED-SIZE and mergeable, so the
    * shuffle carries one ~rsd⁻²-byte sketch per group instead of the
    * deduplicated (source, word) pair stream the exact two-phase
    * expansion moves — on an open web vocabulary the exact path's
    * intermediate grows with the corpus, the sketch does not. Same
    * paired exact/approx design as channelQuantiles: the exact rollups
    * stay the oracled driver surface (corpus_stats, q16_counts), this
    * is the documented swap-in, spec-bounded against the exact counts
    * (HLL++ relative error ≈ rsd; not cross-engine oracle-able since
    * DuckDB's approx_distinct uses a different sketch).
    */
  def vocabApprox(docs: DataFrame, rsd: Double = 0.02): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("source"), explode(expr(WordsSql)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("source"))
      .agg(
        approx_count_distinct(col("word"), rsd).as("vocab_approx"),
        count(lit(1)).as("n_tokens")
      )
      .orderBy(col("source"))

  // ---------------------------------------------------------------------
  // Heaps'-law vocabulary growth
  // ---------------------------------------------------------------------

  /** Vocabulary-growth curve (Heaps/Herdan law): cumulative distinct
    * vocabulary vs cumulative token count at `buckets` doc-order
    * checkpoints. A curation pipeline reads the curve's bend — natural
    * corpora grow V ≈ K·nᵝ with β ≈ 0.5–0.7; a flattening curve means
    * template mass (vocabulary saturates), a straight line near slope
    * 1 means noise/IDs (every token new).
    *
    * The naive formulation (running COUNT(DISTINCT) over a doc-ordered
    * stream) needs an unpartitioned corpus-size window. This one
    * doesn't: a word's contribution to the curve is fully determined
    * by its FIRST-occurrence doc — so the cumulative vocabulary at
    * checkpoint b is just the count of words whose min(doc_id) falls
    * in buckets ≤ b.
    *
    * Scale shape: one vocabulary-scale shuffle (word → min doc_id),
    * one bucket-scale doc rollup (map-side partial agg), and every
    * window/join after runs on `buckets` rows. The corpus is scanned
    * twice (token counts, first occurrences) and never re-shuffled.
    * Portability: all-integer outputs — no float discipline needed;
    * bucket assignment is exact integer floor-division in both
    * engines.
    */
  def heapsGrowth(docs: DataFrame, buckets: Int = 10): DataFrame = {
    val d = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), expr(WordsSql).as("__ws"))
      .select(
        col("doc_id"),
        expr("size(filter(__ws, w -> length(w) > 0))").cast("long").as("n_words"),
        col("__ws")
      )
    val mx = d.agg(max(col("doc_id")).as("__mx"))
    val bucketed = d.crossJoin(broadcast(mx))
      .withColumn("bucket", expr(s"(doc_id * $buckets) div (__mx + 1)"))
    val perBucket = bucketed
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("__n_docs"), sum(col("n_words")).as("__n_tokens"))
    val firstOcc = bucketed
      .select(col("doc_id"), explode(col("__ws")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(min(col("doc_id")).as("__first_doc"))
    val newPerBucket = firstOcc
      .crossJoin(broadcast(mx))
      .groupBy(expr(s"(__first_doc * $buckets) div (__mx + 1)").as("bucket"))
      .agg(count(lit(1)).as("__n_new"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
    perBucket
      .join(newPerBucket, Seq("bucket"), "left")
      .select(
        col("bucket"),
        sum(col("__n_docs")).over(w).as("cum_docs"),
        sum(col("__n_tokens")).over(w).as("cum_tokens"),
        sum(coalesce(col("__n_new"), lit(0L))).over(w).as("cum_vocab")
      )
      .orderBy(col("bucket"))
  }

  def corpusHeaps(spark: SparkSession, dir: String): DataFrame =
    heapsGrowth(Tables.documents(spark, dir))

  val corpusHeapsSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ') AS ws
      |  FROM documents WHERE text IS NOT NULL),
      |mx AS (SELECT MAX(doc_id) AS mx FROM d),
      |bt AS (
      |  SELECT (doc_id * 10) // (mx + 1) AS bucket, COUNT(*) AS n_docs,
      |    SUM(len(list_filter(ws, w -> LENGTH(w) > 0))) AS n_tokens
      |  FROM d, mx GROUP BY 1),
      |fo AS (
      |  SELECT u.word, MIN(doc_id) AS first_doc
      |  FROM d, UNNEST(ws) AS u(word)
      |  WHERE LENGTH(u.word) > 0
      |  GROUP BY 1),
      |vb AS (
      |  SELECT (first_doc * 10) // (mx + 1) AS bucket, COUNT(*) AS n_new
      |  FROM fo, mx GROUP BY 1)
      |SELECT bt.bucket,
      |  CAST(SUM(n_docs) OVER w AS BIGINT) AS cum_docs,
      |  CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
      |  CAST(SUM(COALESCE(n_new, 0)) OVER w AS BIGINT) AS cum_vocab
      |FROM bt LEFT JOIN vb ON bt.bucket = vb.bucket
      |WINDOW w AS (ORDER BY bt.bucket)
      |ORDER BY bt.bucket""".stripMargin

  // ---------------------------------------------------------------------
  // PMI collocations
  // ---------------------------------------------------------------------

  /** Pointwise-mutual-information collocation mining over adjacent word
    * pairs (Church & Hanks, "Word Association Norms, Mutual Information,
    * and Lexicography", 1990): which bigrams co-occur more often than
    * their unigram frequencies predict. A curation pipeline uses the
    * high-PMI list to spot boilerplate phrases and templated spans that
    * per-word statistics miss.
    *
    * PMI(x,y) = ln p(x,y) − ln p(x) − ln p(y) with pair probabilities
    * over the adjacent-pair stream and unigram probabilities over the
    * token stream.
    *
    * Scale shape: pair and unigram counts are each ONE map-side
    * partially-aggregated shuffle at vocabulary / vocabulary² key
    * cardinality — the corpus itself never re-shuffles; the unigram
    * relation is VOCABULARY grain, so it attaches to the pair table by
    * word-keyed joins (the corpus_jsd shape — never a broadcast, which
    * would pin 10^8-10^9 tokens to every executor); only the 1-row
    * totals broadcast. The score is then a projection over the
    * vocabulary-scale frame.
    *
    * Portability: counts are exact integers; every ln is taken on an
    * exact-integer input and ROUNDed to 9 decimals before entering the
    * score, and the six rounded terms combine in the identical written
    * order in both engines, so the double arithmetic is bit-identical.
    */
  def pmiCollocations(docs: DataFrame, k: Int = 25, minPair: Long = 5L): DataFrame = {
    val d = docs.filter(col("text").isNotNull).select(expr(WordsSql).as("ws"))
    val pairs = d
      .select(
        explode(
          expr(
            """case when size(ws) >= 2
              |     then transform(sequence(1, size(ws) - 1),
              |                    i -> struct(element_at(ws, i) as w1, element_at(ws, i + 1) as w2))
              |     else cast(array() as array<struct<w1:string,w2:string>>) end""".stripMargin
          )
        ).as("p")
      )
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_pair"))
    val uni = d
      .select(explode(col("ws")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c_uni"))
    val totals = d.agg(
      sum(when(size(col("ws")) >= 2, size(col("ws")) - 1).otherwise(lit(0)).cast("long"))
        .as("n_pairs"),
      sum(size(col("ws")).cast("long")).as("n_tok")
    )
    val ln9 = (c: org.apache.spark.sql.Column) => round(log(c.cast("double")), 9)
    // ln p(xy) − ln p(x) − ln p(y), each probability expanded so every
    // ln argument is an exact integer; fixed evaluation order.
    val pmi = round(
      ln9(col("c_pair")) - ln9(col("n_pairs")) -
        (ln9(col("c_u1")) - ln9(col("n_tok"))) -
        (ln9(col("c_u2")) - ln9(col("n_tok"))),
      6
    )
    val order =
      org.apache.spark.sql.expressions.Window.orderBy(col("pmi").desc, col("w1"), col("w2"))
    // the unigram relation is VOCABULARY grain (10^8-10^9 distinct
    // tokens on a web corpus) — join it on the word key like
    // corpus_jsd, never broadcast it (the corpus_drift disease class)
    pairs
      .filter(col("c_pair") >= minPair)
      .join(uni.select(col("w").as("w1"), col("c_uni").as("c_u1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c_uni").as("c_u2")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_pair"), pmi.as("pmi"))
      .withColumn("rank", row_number().over(order).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("w1"), col("w2"), col("c_pair"), col("pmi"))
  }

  def corpusPmi(spark: SparkSession, dir: String): DataFrame =
    pmiCollocations(Tables.documents(spark, dir)).orderBy(col("rank"))

  /** Identical counts, round-9 logs in the identical term order. */
  val corpusPmiSql: String =
    """WITH wsa AS (
      |  SELECT string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ') AS ws
      |  FROM documents WHERE text IS NOT NULL),
      |p AS (
      |  SELECT u.p.w1 AS w1, u.p.w2 AS w2, COUNT(*) AS c_pair
      |  FROM (SELECT list_transform(range(1, len(ws)),
      |               i -> struct_pack(w1 := ws[i], w2 := ws[i+1])) AS ps FROM wsa) t,
      |       UNNEST(ps) AS u(p)
      |  GROUP BY 1, 2),
      |uni AS (SELECT u.w AS w, COUNT(*) AS c_uni FROM wsa, UNNEST(ws) AS u(w) GROUP BY 1),
      |tot AS (
      |  SELECT SUM(CASE WHEN len(ws) >= 2 THEN len(ws) - 1 ELSE 0 END) AS n_pairs,
      |    SUM(len(ws)) AS n_tok
      |  FROM wsa),
      |scored AS (
      |  SELECT p.w1, p.w2, p.c_pair,
      |    ROUND(ROUND(LN(CAST(c_pair AS DOUBLE)), 9) - ROUND(LN(CAST(n_pairs AS DOUBLE)), 9) -
      |      (ROUND(LN(CAST(u1.c_uni AS DOUBLE)), 9) - ROUND(LN(CAST(n_tok AS DOUBLE)), 9)) -
      |      (ROUND(LN(CAST(u2.c_uni AS DOUBLE)), 9) - ROUND(LN(CAST(n_tok AS DOUBLE)), 9)), 6) AS pmi
      |  FROM p
      |  JOIN uni u1 ON p.w1 = u1.w
      |  JOIN uni u2 ON p.w2 = u2.w
      |  CROSS JOIN tot
      |  WHERE p.c_pair >= 5)
      |SELECT ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS rank, w1, w2, c_pair, pmi
      |FROM scored
      |ORDER BY pmi DESC, w1, w2
      |LIMIT 25""".stripMargin

  // -------------------------------------------------------------------
  // Bigram conditional entropy
  // -------------------------------------------------------------------

  /** Bigram conditional entropy H(W₂|W₁) per language (Shannon 1951,
    * "Prediction and Entropy of Printed English" — how predictable is
    * the next word given the current one?). Natural prose sits well
    * below its unigram entropy (context pays); word-soup spam and
    * shuffled scrapes show H(W₂|W₁) ≈ H(W₂) (context buys nothing) —
    * the SEQUENCE-structure screen beside [[pmiCollocations]]'
    * pair-level view and [[entropyScores]]' per-document marginal.
    * Reports the chain-rule triple H(W₁,W₂), H(W₁), H(W₂|W₁) so the
    * identity H(W₂|W₁) = H(W₁,W₂) − H(W₁) is checkable on the output.
    *
    * Scale shape: adjacent pairs reduce to (lang, w1, w2) counts in
    * ONE map-side partial agg; the prefix marginal derives from the
    * bigram relation itself (one more partial agg — the corpus is
    * never re-scanned); the attach is a (lang, w1)-KEYED join —
    * vocabulary grain, so never a broadcast (the corpus_jsd/corpus_pmi
    * discipline); only the k-row per-lang totals broadcast. Final agg
    * is lang-grain. Portability: every ln is round-9 on an exact
    * integer; each entropy term multiplies (c/N) in one pinned order
    * and sums through DECIMAL(38,10); finals round at 6.
    */
  def conditionalEntropy(docs: DataFrame): DataFrame = {
    val dec3810 = org.apache.spark.sql.types.DecimalType(38, 10)
    val ln9 = (c: Column) => round(log(c.cast("double")), 9)
    val pairs = docs
      .filter(col("text").isNotNull && col("lang").isNotNull)
      .select(col("lang"), expr(WordsSql).as("ws"))
      .select(
        col("lang"),
        explode(
          expr(
            """case when size(ws) >= 2
              |     then transform(sequence(1, size(ws) - 1),
              |                    i -> struct(element_at(ws, i) as w1, element_at(ws, i + 1) as w2))
              |     else cast(array() as array<struct<w1:string,w2:string>>) end""".stripMargin
          )
        ).as("p")
      )
      .groupBy(col("lang"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    val prefix = pairs
      .groupBy(col("lang"), col("w1"))
      .agg(sum(col("c12")).as("c1"))
    val totals = pairs
      .groupBy(col("lang"))
      .agg(sum(col("c12")).as("n_bigrams"), count(lit(1)).as("n_pairs"))
    val joined = pairs
      .join(prefix, Seq("lang", "w1"))
      .join(broadcast(totals), Seq("lang"))
    val p12 = col("c12").cast("double") / col("n_bigrams").cast("double")
    val hJoint = joined
      .groupBy(col("lang"), col("n_bigrams"), col("n_pairs"))
      .agg(
        sum((p12 * (ln9(col("c12")) - ln9(col("n_bigrams")))).cast(dec3810))
          .cast("double").as("__hj"),
        sum((p12 * (ln9(col("c12")) - ln9(col("c1")))).cast(dec3810))
          .cast("double").as("__hc")
      )
    val hPrefix = prefix
      .join(broadcast(totals), Seq("lang"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_prefixes"),
        sum(((col("c1").cast("double") / col("n_bigrams").cast("double")) *
          (ln9(col("c1")) - ln9(col("n_bigrams")))).cast(dec3810))
          .cast("double").as("__hp")
      )
    hJoint
      .join(hPrefix, Seq("lang"))
      .select(
        col("lang"),
        col("n_bigrams"),
        col("n_pairs"),
        col("n_prefixes"),
        round(-col("__hj"), 6).as("h_joint"),
        round(-col("__hp"), 6).as("h_prefix"),
        round(-col("__hc"), 6).as("h_cond")
      )
  }

  def corpusCondEntropy(spark: SparkSession, dir: String): DataFrame =
    conditionalEntropy(Tables.documents(spark, dir)).orderBy(col("lang"))

  /** Conditional-entropy oracle: identical pair/prefix/total counts,
    * round-9 integer logs, pinned term order, DECIMAL sums.
    */
  val corpusCondEntropySql: String =
    """WITH wsa AS (
      |  SELECT lang, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ') AS ws
      |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
      |bg AS (
      |  SELECT lang, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM wsa, UNNEST(range(1, len(ws))) AS t(i)
      |  WHERE len(ws) >= 2),
      |pairs AS (
      |  SELECT lang, w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2, 3),
      |prefix AS (
      |  SELECT lang, w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM pairs GROUP BY 1, 2),
      |tot AS (
      |  SELECT lang, CAST(SUM(c12) AS BIGINT) AS n_bigrams, COUNT(*) AS n_pairs
      |  FROM pairs GROUP BY 1),
      |hj AS (
      |  SELECT p.lang, t.n_bigrams, t.n_pairs,
      |    CAST(SUM(CAST((CAST(p.c12 AS DOUBLE) / CAST(t.n_bigrams AS DOUBLE))
      |      * (ROUND(LN(CAST(p.c12 AS DOUBLE)), 9) - ROUND(LN(CAST(t.n_bigrams AS DOUBLE)), 9))
      |      AS DECIMAL(38,10))) AS DOUBLE) AS hjs,
      |    CAST(SUM(CAST((CAST(p.c12 AS DOUBLE) / CAST(t.n_bigrams AS DOUBLE))
      |      * (ROUND(LN(CAST(p.c12 AS DOUBLE)), 9) - ROUND(LN(CAST(x.c1 AS DOUBLE)), 9))
      |      AS DECIMAL(38,10))) AS DOUBLE) AS hcs
      |  FROM pairs p
      |  JOIN prefix x ON x.lang = p.lang AND x.w1 = p.w1
      |  JOIN tot t ON t.lang = p.lang
      |  GROUP BY 1, 2, 3),
      |hp AS (
      |  SELECT x.lang, COUNT(*) AS n_prefixes,
      |    CAST(SUM(CAST((CAST(x.c1 AS DOUBLE) / CAST(t.n_bigrams AS DOUBLE))
      |      * (ROUND(LN(CAST(x.c1 AS DOUBLE)), 9) - ROUND(LN(CAST(t.n_bigrams AS DOUBLE)), 9))
      |      AS DECIMAL(38,10))) AS DOUBLE) AS hps
      |  FROM prefix x JOIN tot t ON t.lang = x.lang
      |  GROUP BY 1)
      |SELECT hj.lang, hj.n_bigrams, hj.n_pairs, hp.n_prefixes,
      |  ROUND(-hjs, 6) AS h_joint,
      |  ROUND(-hps, 6) AS h_prefix,
      |  ROUND(-hcs, 6) AS h_cond
      |FROM hj JOIN hp ON hp.lang = hj.lang
      |ORDER BY hj.lang""".stripMargin

  // -------------------------------------------------------------------
  // Vocabulary coverage curve
  // -------------------------------------------------------------------

  /** Cumulative token-coverage curve of the top-N vocabulary: what
    * fraction of all corpus tokens the k most frequent words account
    * for, for every k ≤ N — the curve that sizes a tokenizer
    * vocabulary (pick the knee) and exposes template mass (a curve
    * that saturates in a handful of words means boilerplate).
    *
    * Scale shape: the word histogram is the one corpus-scale partial
    * agg; the rank cut is orderBy+limit (TakeOrderedAndProject — no
    * global sort materializes); the rank/cumulative window runs over
    * the ALREADY-LIMITED ≤N rows only, and the total is a 1-row
    * broadcast.
    */
  def coverageCurve(docs: DataFrame, topN: Int = 1000): DataFrame = {
    val hist = docs
      .filter(col("text").isNotNull)
      .select(explode(expr(WordsSql)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
    val tot = hist.agg(sum(col("freq")).as("__total"))
    val top = hist.orderBy(col("freq").desc, col("word")).limit(topN)
    import org.apache.spark.sql.expressions.Window
    val byFreq = Window.orderBy(col("freq").desc, col("word"))
    top
      .withColumn("rank", row_number().over(byFreq).cast("long"))
      .withColumn(
        "cum_tokens",
        sum(col("freq")).over(byFreq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .crossJoin(broadcast(tot))
      .select(
        col("rank"),
        col("word"),
        col("freq"),
        col("cum_tokens"),
        round(col("cum_tokens").cast("double") / col("__total"), 6).as("coverage")
      )
  }

  def corpusCoverage(spark: SparkSession, dir: String): DataFrame =
    coverageCurve(Tables.documents(spark, dir)).orderBy(col("rank"))

  /** Oracle: identical histogram, identical (freq desc, word) rank
    * order, cumulative sum over the same limited relation.
    */
  val corpusCoverageSql: String =
    """WITH w AS (
      |  SELECT u.w AS word
      |  FROM (SELECT string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ') AS ws
      |        FROM documents WHERE text IS NOT NULL) t, UNNEST(ws) AS u(w)
      |  WHERE LENGTH(u.w) > 0),
      |h AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY 1),
      |tot AS (SELECT SUM(freq) AS total FROM h),
      |top AS (SELECT word, freq FROM h ORDER BY freq DESC, word LIMIT 1000),
      |r AS (
      |  SELECT word, freq,
      |    CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS BIGINT) AS rank,
      |    CAST(SUM(freq) OVER (ORDER BY freq DESC, word
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      |  FROM top)
      |SELECT rank, word, freq, cum_tokens,
      |  ROUND(CAST(cum_tokens AS DOUBLE) / tot.total, 6) AS coverage
      |FROM r CROSS JOIN tot
      |ORDER BY rank""".stripMargin

  // -------------------------------------------------------------------
  // Source-pair Jensen–Shannon divergence
  // -------------------------------------------------------------------

  /** Pairwise Jensen–Shannon divergence between the unigram
    * distributions of every source pair (Lin 1991) — the corpus-mix
    * distance matrix: ~0 = two sources are the same distribution
    * (mirror/contamination suspects, cross-check dedup_matrix), large
    * = genuinely different registers. Computed as
    * JSD = H(m) − ½H(p) − ½H(q) over the pair's support union.
    *
    * Scale shape: the corpus collapses to the (source, word)
    * probability relation in one partial agg; the pair fan-out is
    * source²-cardinality × vocabulary (the dedup_matrix grain), joined
    * FULL OUTER on the word key per pair; entropies are DECIMAL term
    * sums of round-9 ln inputs — order-independent and engine-portable.
    */
  def sourceDivergence(docs: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    val hist = docs
      .filter(col("text").isNotNull)
      .select(col("source"), explode(expr(WordsSql)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("c"))
    val tot = hist.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val probs = hist
      .join(broadcast(tot), "source")
      .select(col("source"), col("word"), (col("c").cast("double") / col("n")).as("p"))
    val sources = probs.select(col("source")).distinct()
    val pairs = sources
      .select(col("source").as("source_a"))
      .crossJoin(broadcast(sources.select(col("source").as("source_b"))))
      .filter(col("source_a") < col("source_b"))
    // the pair list is the broadcast side — NEVER probs: the
    // vocabulary-grain relation must stay distributed (build-side
    // choice left to size estimates flips at toy scale and OOMs at
    // the design point; the vocabulary-grain PlanSpec sweep pins this)
    val left = probs
      .join(broadcast(pairs), col("source") === col("source_a"))
      .select(col("source_a"), col("source_b"), col("word"), col("p").as("pa"))
    val right = probs
      .join(broadcast(pairs), col("source") === col("source_b"))
      .select(col("source_a"), col("source_b"), col("word"), col("p").as("pb"))
    val sup = left.join(right, Seq("source_a", "source_b", "word"), "full_outer")
    val m = (coalesce(col("pa"), lit(0.0)) + coalesce(col("pb"), lit(0.0))) / 2.0
    def hTerm(c: Column): Column =
      when(c > 0, -c * round(log(c), 9)).otherwise(lit(0.0)).cast(dec)
    sup
      .groupBy(col("source_a"), col("source_b"))
      .agg(
        count(lit(1)).as("n_words_union"),
        sum(hTerm(m)).cast("double").as("__hm"),
        sum(hTerm(coalesce(col("pa"), lit(0.0)))).cast("double").as("__hp"),
        sum(hTerm(coalesce(col("pb"), lit(0.0)))).cast("double").as("__hq")
      )
      .select(
        col("source_a"),
        col("source_b"),
        col("n_words_union"),
        round(col("__hm") - lit(0.5) * col("__hp") - lit(0.5) * col("__hq"), 6).as("jsd")
      )
  }

  def corpusJsd(spark: SparkSession, dir: String): DataFrame =
    sourceDivergence(Tables.documents(spark, dir))
      .orderBy(col("source_a"), col("source_b"))

  /** Oracle: identical probability relation, FULL OUTER support union,
    * round-9 ln entropy terms through DECIMAL, pinned JSD combination.
    */
  val corpusJsdSql: String =
    """WITH w AS (
      |  SELECT source, u.w AS word
      |  FROM (SELECT source,
      |          string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ') AS ws
      |        FROM documents WHERE text IS NOT NULL) t, UNNEST(ws) AS u(w)
      |  WHERE LENGTH(u.w) > 0),
      |h AS (SELECT source, word, COUNT(*) AS c FROM w GROUP BY 1, 2),
      |tot AS (SELECT source, SUM(c) AS n FROM h GROUP BY 1),
      |probs AS (
      |  SELECT h.source, h.word, CAST(h.c AS DOUBLE) / tot.n AS p
      |  FROM h JOIN tot ON tot.source = h.source),
      |srcs AS (SELECT DISTINCT source FROM probs),
      |pairs AS (
      |  SELECT a.source AS source_a, b.source AS source_b
      |  FROM srcs a CROSS JOIN srcs b WHERE a.source < b.source),
      |l AS (
      |  SELECT p.source_a, p.source_b, pr.word, pr.p AS pa
      |  FROM pairs p JOIN probs pr ON pr.source = p.source_a),
      |r AS (
      |  SELECT p.source_a, p.source_b, pr.word, pr.p AS pb
      |  FROM pairs p JOIN probs pr ON pr.source = p.source_b),
      |sup AS (
      |  SELECT COALESCE(l.source_a, r.source_a) AS source_a,
      |    COALESCE(l.source_b, r.source_b) AS source_b,
      |    COALESCE(l.pa, 0.0) AS pa, COALESCE(r.pb, 0.0) AS pb
      |  FROM l FULL OUTER JOIN r
      |    ON r.source_a = l.source_a AND r.source_b = l.source_b AND r.word = l.word),
      |agg AS (
      |  SELECT source_a, source_b, COUNT(*) AS n_words_union,
      |    CAST(SUM(CAST(CASE WHEN (pa + pb) / 2.0 > 0
      |      THEN -((pa + pb) / 2.0) * ROUND(LN((pa + pb) / 2.0), 9) ELSE 0.0 END AS DECIMAL(27,10))) AS DOUBLE) AS hm,
      |    CAST(SUM(CAST(CASE WHEN pa > 0 THEN -pa * ROUND(LN(pa), 9) ELSE 0.0 END AS DECIMAL(27,10))) AS DOUBLE) AS hp,
      |    CAST(SUM(CAST(CASE WHEN pb > 0 THEN -pb * ROUND(LN(pb), 9) ELSE 0.0 END AS DECIMAL(27,10))) AS DOUBLE) AS hq
      |  FROM sup GROUP BY 1, 2)
      |SELECT source_a, source_b, n_words_union,
      |  ROUND(hm - 0.5 * hp - 0.5 * hq, 6) AS jsd
      |FROM agg
      |ORDER BY source_a, source_b""".stripMargin

  // -------------------------------------------------------------------
  // Lexical diversity per source
  // -------------------------------------------------------------------

  /** Per-source lexical-diversity report from the word frequency
    * spectrum: type/token counts, type-token ratio, Guiraud's R
    * (V/√N — the length-corrected TTR), Simpson's repeat rate
    * Σc(c−1)/(N(N−1)), and Yule's K = 10⁴·(Σc²−N)/N² — the standard
    * corpus-mix health constants (template-heavy or deduplicated-badly
    * sources show as low diversity / high K).
    *
    * Scale shape: corpus reduces to the (source, word) histogram in one
    * partial aggregation (map-side combined), then to source grain in a
    * second fully-algebraic agg over INTEGER sums — every derived ratio
    * is computed from those exact integers in one pinned double
    * expression order, so no data-scale relation survives the first
    * shuffle and the result is order-independent.
    */
  def lexicalDiversity(docs: DataFrame): DataFrame = {
    val hist = docs
      .filter(col("text").isNotNull)
      .select(col("source"), explode(expr(WordsSql)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("c"))
    hist
      .groupBy(col("source"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("__sc2"),
        sum(col("c") * (col("c") - lit(1L))).as("__scc1")
      )
      .select(
        col("source"),
        col("n_tokens"),
        col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
        round(col("n_types").cast("double") / sqrt(col("n_tokens").cast("double")), 6)
          .as("guiraud_r"),
        round(
          when(
            col("n_tokens") > 1,
            col("__scc1").cast("double") /
              (col("n_tokens").cast("double") * (col("n_tokens") - lit(1L)).cast("double"))
          ),
          9
        ).as("simpson"),
        round(
          lit(10000.0) * (col("__sc2") - col("n_tokens")).cast("double") /
            (col("n_tokens").cast("double") * col("n_tokens").cast("double")),
          6
        ).as("yule_k")
      )
  }

  def corpusDiversity(spark: SparkSession, dir: String): DataFrame =
    lexicalDiversity(Tables.documents(spark, dir)).orderBy(col("source"))

  /** Oracle: identical integer histogram moments, identical pinned
    * double expression order for every ratio.
    */
  val corpusDiversitySql: String =
    """WITH w AS (
      |  SELECT source, u.w AS word
      |  FROM (SELECT source,
      |          string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ') AS ws
      |        FROM documents WHERE text IS NOT NULL) t, UNNEST(ws) AS u(w)
      |  WHERE LENGTH(u.w) > 0),
      |h AS (SELECT source, word, COUNT(*) AS c FROM w GROUP BY 1, 2),
      |s AS (
      |  SELECT source,
      |    CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    COUNT(*) AS n_types,
      |    CAST(SUM(c * c) AS BIGINT) AS sc2,
      |    CAST(SUM(c * (c - 1)) AS BIGINT) AS scc1
      |  FROM h GROUP BY source)
      |SELECT source, n_tokens, n_types,
      |  ROUND(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
      |  ROUND(CAST(n_types AS DOUBLE) / SQRT(CAST(n_tokens AS DOUBLE)), 6) AS guiraud_r,
      |  ROUND(CASE WHEN n_tokens > 1
      |        THEN CAST(scc1 AS DOUBLE) /
      |             (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE)) END, 9) AS simpson,
      |  ROUND(10000.0 * CAST(sc2 - n_tokens AS DOUBLE) /
      |        (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6) AS yule_k
      |FROM s
      |ORDER BY source""".stripMargin

  // -------------------------------------------------------------------
  // Per-source out-of-vocabulary rate
  // -------------------------------------------------------------------

  /** Vocabulary size for the OOV screen — deliberately small relative
    * to the corpus vocabulary so the tail is non-empty (the tokenizer-
    * budget question is "what share of each source falls OUTSIDE a
    * capped vocab", and a vocab ≥ the corpus answers 0 everywhere).
    */
  val OovVocabN = 16

  /** Per-source out-of-vocabulary rate against the global top-N word
    * vocabulary: the share of a source's token occurrences (and of its
    * distinct word types) a capped tokenizer vocabulary would miss —
    * the per-source drill-down of [[coverageCurve]]'s global curve,
    * and the screen that catches a source whose register diverges from
    * the corpus the tokenizer was sized on.
    *
    * Scale shape: ONE corpus scan reduces to the (source, word) count
    * relation; the global vocab is a vocabulary-scale rollup cut to N
    * rows (freq desc, word — deterministic ties) and broadcast back as
    * a LEFT join flag; per-source rates are one more partial agg.
    */
  def oovRates(docs: DataFrame, topN: Int = OovVocabN): DataFrame = {
    val hist = docs
      .filter(col("text").isNotNull)
      .select(col("source"), explode(expr(WordsSql)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("c"))
    val vocab = hist
      .groupBy(col("word"))
      .agg(sum(col("c")).as("__freq"))
      .orderBy(col("__freq").desc, col("word"))
      .limit(topN)
      .select(col("word"), lit(true).as("__in"))
    hist
      .join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col("source"))
      .agg(
        sum(col("c")).as("n_tokens"),
        sum(when(col("__in").isNull, col("c")).otherwise(lit(0L))).as("oov_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__in").isNull, 1L).otherwise(lit(0L))).as("oov_types")
      )
      .select(
        col("source"),
        col("n_tokens"),
        col("oov_tokens"),
        round(col("oov_tokens").cast("double") / col("n_tokens").cast("double"), 6).as("oov_rate"),
        col("n_types"),
        col("oov_types")
      )
  }

  def corpusOov(spark: SparkSession, dir: String): DataFrame =
    oovRates(Tables.documents(spark, dir)).orderBy(col("source"))

  /** Per-document hapax legomena rate: the share of a document's
    * distinct word TYPES occurring exactly once within it, plus the
    * token share those hapaxes carry — the within-doc diversity tail
    * next to [[textRepetition]]'s duplication head (high = open
    * vocabulary or noise; near-zero = template text). All-integer
    * until the two final ratios.
    *
    * Scale shape: corpus → (doc, word) counts → one doc-grain
    * conditional agg; both keyed by doc_id, co-partitioned.
    */
  def hapaxRates(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), explode(expr(WordsSql)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("doc_id"), col("source"), col("word"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("doc_id"), col("source"))
      .agg(
        count(lit(1)).as("n_types"),
        sum(col("__c")).as("n_tokens"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("hapaxes")
      )
      .select(
        col("doc_id"),
        col("source"),
        col("n_types"),
        col("n_tokens"),
        col("hapaxes"),
        round(col("hapaxes").cast("double") / col("n_types").cast("double"), 6).as("hapax_type_rate"),
        round(col("hapaxes").cast("double") / col("n_tokens").cast("double"), 6).as("hapax_token_rate")
      )

  def corpusHapax(spark: SparkSession, dir: String): DataFrame =
    hapaxRates(Tables.documents(spark, dir))

  val corpusHapaxSql: String =
    """WITH w AS (
      |  SELECT doc_id, source, u.w AS word
      |  FROM (SELECT doc_id, source, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ') AS ws
      |        FROM documents WHERE text IS NOT NULL) t, UNNEST(ws) AS u(w)
      |  WHERE LENGTH(u.w) > 0),
      |h AS (SELECT doc_id, source, word, COUNT(*) AS c FROM w GROUP BY 1, 2, 3)
      |SELECT doc_id, source,
      |  COUNT(*) AS n_types,
      |  CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapaxes,
      |  ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
      |    AS hapax_type_rate,
      |  ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
      |    AS hapax_token_rate
      |FROM h
      |GROUP BY 1, 2
      |ORDER BY doc_id""".stripMargin

  val corpusOovSql: String =
    s"""WITH w AS (
       |  SELECT source, u.w AS word
       |  FROM (SELECT source, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |        FROM documents WHERE text IS NOT NULL) t, UNNEST(ws) AS u(w)
       |  WHERE LENGTH(u.w) > 0),
       |h AS (SELECT source, word, COUNT(*) AS c FROM w GROUP BY 1, 2),
       |vocab AS (
       |  SELECT word FROM (SELECT word, SUM(c) AS freq FROM h GROUP BY 1)
       |  ORDER BY freq DESC, word LIMIT $OovVocabN),
       |f AS (
       |  SELECT h.source, h.c, v.word IS NOT NULL AS inv
       |  FROM h LEFT JOIN vocab v ON v.word = h.word)
       |SELECT source,
       |  CAST(SUM(c) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN NOT inv THEN c ELSE 0 END) AS BIGINT) AS oov_tokens,
       |  ROUND(CAST(SUM(CASE WHEN NOT inv THEN c ELSE 0 END) AS DOUBLE) /
       |        CAST(SUM(c) AS DOUBLE), 6) AS oov_rate,
       |  COUNT(*) AS n_types,
       |  CAST(SUM(CASE WHEN NOT inv THEN 1 ELSE 0 END) AS BIGINT) AS oov_types
       |FROM f
       |GROUP BY 1
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // Readability (Flesch reading ease / Flesch–Kincaid grade)
  // ---------------------------------------------------------------------

  /** Per-document Flesch reading ease and Flesch–Kincaid grade — the
    * classic curation signal for audience targeting and quality
    * bucketing (Flesch 1948; Kincaid et al. 1975). Syllables are the
    * standard cheap proxy: maximal vowel-group runs `[aeiouy]+` over the
    * lowercased text (the same heuristic readability libraries use when
    * no pronunciation dictionary is available); sentences are terminal
    * punctuation runs `[.!?]+`, floored at 1 so headline-only fragments
    * still score.
    *
    * Scale shape: three codegen'd regexp counters per row, zero shuffle
    * — pipelines into the scan like every per-doc signal here.
    * Portability: counts are integers in both engines; the two ratios
    * and the affine formulas derive in one pinned double expression
    * order before the round-6.
    */
  def readability(docs: DataFrame): DataFrame = {
    val w = col("n_words").cast("double")
    val wps = w / col("n_sentences").cast("double")
    val spw = col("n_syllables").cast("double") / w
    docs
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        size(expr(WordsSql)).cast("long").as("n_words"),
        greatest(regexp_count(col("text"), lit("[.!?]+")).cast("long"), lit(1L))
          .as("n_sentences"),
        regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long").as("n_syllables")
      )
      .select(
        col("doc_id"),
        col("n_words"),
        col("n_sentences"),
        col("n_syllables"),
        round(wps, 6).as("words_per_sentence"),
        round(spw, 6).as("syllables_per_word"),
        round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6).as("flesch"),
        round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6).as("fk_grade")
      )
  }

  def textReadability(spark: SparkSession, dir: String): DataFrame =
    readability(Tables.documents(spark, dir))

  /** Readability oracle: identical counters (RE2 and Java regex agree on
    * these character-class patterns) and the same pinned formula order.
    */
  val textReadabilitySql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    len(string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ')) AS n_words,
      |    GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
      |    len(regexp_extract_all(LOWER(text), '[aeiouy]+')) AS n_syllables
      |  FROM documents WHERE text IS NOT NULL)
      |SELECT doc_id,
      |  CAST(n_words AS BIGINT) AS n_words,
      |  CAST(n_sentences AS BIGINT) AS n_sentences,
      |  CAST(n_syllables AS BIGINT) AS n_syllables,
      |  ROUND(CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE), 6) AS words_per_sentence,
      |  ROUND(CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS syllables_per_word,
      |  ROUND(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
      |    - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 6) AS flesch,
      |  ROUND(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
      |    + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) - 15.59, 6) AS fk_grade
      |FROM t
      |ORDER BY doc_id""".stripMargin
}
