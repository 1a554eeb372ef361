package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword search over the document corpus — the lexical
  * counterpart to the embedding ANN operators (Robertson & Zaragoza,
  * "The Probabilistic Relevance Framework: BM25 and Beyond", 2009).
  * A curation pipeline uses it to pull topic slices and to audit what
  * the corpus says about a query before/after filtering.
  *
  * Scale shape (100 TB corpus, small query workload):
  *  - the exploded word stream is filtered to the QUERY VOCABULARY in
  *    the same map-side projection that explodes it — words that match
  *    no query never reach a shuffle;
  *  - term frequencies shuffle keyed by (doc_id, term): uniform by
  *    construction, partial-aggregated map-side;
  *  - document frequencies and the corpus length stats are
  *    term-cardinality / single-row relations — broadcast;
  *  - the per-query top-k filter compiles to WindowGroupLimit, so each
  *    task keeps at most k candidates per query before the final
  *    shuffle (the ANN ranking shape).
  *
  * Engine portability of the score: tf/df/N/doc-length are exact
  * integers, the average document length is an exact-decimal-derived
  * double, the one transcendental (ln) is computed on identical
  * rational inputs in both engines and ROUNDed to 9 decimals before it
  * enters the score (a coarser grid than any libm ulp drift), and
  * per-term scores sum through DECIMAL so the total is independent of
  * aggregation order.
  */
object Search {

  val K1 = 1.2
  val B = 0.75

  /** Fixed query workload over the testdata vocabulary. */
  val Queries: Seq[(String, Seq[String])] = Seq(
    "q_spark_join" -> Seq("spark", "join"),
    "q_hash_scan" -> Seq("hash", "scan"),
    "q_win_filter" -> Seq("window", "filter", "group")
  )

  private val NormSql = "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"
  private val WordsSql = s"split($NormSql, ' ')"

  /** BM25 top-k per query: (query_id, rank, doc_id, score). */
  def bm25TopK(spark: SparkSession, docs: DataFrame, queries: Seq[(String, Seq[String])], k: Int): DataFrame = {
    import spark.implicits._
    val qterms = queries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query_id", "term")
    val vocab = queries.flatMap(_._2).distinct

    val d = docs.filter(col("text").isNotNull).select(col("doc_id"), expr(WordsSql).as("ws"))
    val stats = d.agg(
      count(lit(1)).as("n_docs"),
      (sum(size(col("ws")).cast(org.apache.spark.sql.types.DecimalType(27, 10))).cast("double") /
        count(lit(1))).as("avg_len")
    )
    val tf = d
      .select(col("doc_id"), size(col("ws")).as("n"), explode(col("ws")).as("term"))
      .filter(col("term").isin(vocab: _*))
      .groupBy(col("doc_id"), col("n"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val idf = round(log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 9)
    val termScore = idf * ((col("tf") * lit(K1 + 1.0)) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("n") / col("avg_len"))))

    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    tf
      .join(broadcast(dfc), "term")
      .join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), termScore.as("ts"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(
        round(sum(col("ts").cast(org.apache.spark.sql.types.DecimalType(27, 10))).cast("double"), 6)
          .as("score")
      )
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("doc_id"), col("score"))
  }

  // ---------------------------------------------------------------------
  // Fixed driver query + oracle
  // ---------------------------------------------------------------------

  val TopK = 10

  def bm25Search(spark: SparkSession, dir: String): DataFrame =
    bm25TopK(spark, Tables.documents(spark, dir), Queries, TopK)
      .orderBy(col("query_id"), col("rank"))

  val bm25SearchSql: String = {
    val qvals = Queries.flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }.mkString(", ")
    val vocab = Queries.flatMap(_._2).distinct.map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |  FROM documents WHERE text IS NOT NULL),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |         CAST(SUM(CAST(len(ws) AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS avg_len
       |  FROM d),
       |tf AS (
       |  SELECT doc_id, len(ws) AS n, u.term, COUNT(*) AS tf
       |  FROM d, UNNEST(ws) AS u(term)
       |  WHERE u.term IN ($vocab)
       |  GROUP BY 1, 2, 3),
       |dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |q(query_id, term) AS (VALUES $qvals),
       |scored AS (
       |  SELECT q.query_id, tf.doc_id,
       |    ROUND(LN(1.0 + (s.n_docs - dfc.df + 0.5) / (dfc.df + 0.5)), 9)
       |      * ((tf.tf * ${K1 + 1.0}) /
       |         (tf.tf + $K1 * (${1.0 - B} + $B * tf.n / s.avg_len))) AS ts
       |  FROM tf
       |  JOIN dfc USING (term)
       |  JOIN q ON q.term = tf.term
       |  CROSS JOIN stats s),
       |agg AS (
       |  SELECT query_id, doc_id,
       |    ROUND(CAST(SUM(CAST(ts AS DECIMAL(27,10))) AS DOUBLE), 6) AS score
       |  FROM scored GROUP BY 1, 2),
       |ranked AS (
       |  SELECT query_id, doc_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |  FROM agg)
       |SELECT query_id, rank, doc_id, score
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Hybrid search (reciprocal rank fusion)
  // ---------------------------------------------------------------------

  /** Hybrid retrieval by RECIPROCAL RANK FUSION (Cormack, Clarke &
    * Buettcher 2009): fuse a LEXICAL ranking (word-set Jaccard to the
    * query document) with a SEMANTIC ranking (embedding cosine) as
    * `rrf(d) = Σ_lists 1/(kRrf + rank_list(d))` — the standard way
    * production search stacks combine BM25-style and vector retrieval
    * without score calibration, because ranks are scale-free.
    *
    * Candidates are the docs∩embeddings pool; query docs are the first
    * `nQueries` of it. Scale shape: both rankings are query-broadcast
    * corpus scans (the declared-exact baseline shape of ann_bruteforce
    * — swap in the LSH/IVF rankers for the sub-scan path); each list is
    * cut to `kIn` per query by a WindowGroupLimit rank BEFORE fusion,
    * so fusion itself joins two (queries × kIn) relations — driver-size
    * inputs regardless of corpus size.
    *
    * Portability: ranks are exact ints; 1/(kRrf+rank) is an identical
    * rational on both engines; the two-term sum is order-safe IEEE;
    * ties on equal rrf break by doc_id.
    */
  def hybridTopK(
    docs: DataFrame,
    embeds: DataFrame,
    nQueries: Int,
    kIn: Int,
    kOut: Int,
    kRrf: Int = 60
  ): DataFrame = {
    // both sides corpus cardinality — merge-hinted so neither row-grain
    // relation is ever planned as a broadcast (toy-scale stats would)
    val corpus = docs
      .join(embeds.hint("merge"), docs("doc_id") === embeds("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
    // semantic list: cosine brute-force over the shared pool
    val sem = Similarity
      .bruteForceTopK(
        corpus.select(col("doc_id").as("vec_id"), col("embedding")),
        corpus.filter(col("doc_id") < nQueries).select(col("doc_id").as("vec_id"), col("embedding")),
        kIn
      )
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank").as("r_sem"))
    // lexical list: distinct-word Jaccard to the query doc, ranked;
    // only docs sharing >= 1 word are rankable (identical both engines)
    val words = corpus
      .select(col("doc_id"), explode(graft.functions.Shingling.wordShingles(Dedup.normText(col("text")), 1)).as("w"))
    val sizes = words.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val qwords = words
      .filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("w"))
    val inter = words
      .join(broadcast(qwords), Seq("w"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_inter"))
    val byQueryJ = Window.partitionBy(col("query_id")).orderBy(col("jac").desc, col("doc_id"))
    val lex = inter
      .join(sizes.select(col("doc_id"), col("n").as("nc")), "doc_id")
      .join(broadcast(sizes.select(col("doc_id").as("query_id"), col("n").as("nq"))), "query_id")
      .select(
        col("query_id"),
        col("doc_id"),
        (col("n_inter").cast("double") / (col("nc") + col("nq") - col("n_inter"))).as("jac")
      )
      .withColumn("r_lex", row_number().over(byQueryJ))
      .filter(col("r_lex") <= kIn)
      .select(col("query_id"), col("doc_id"), col("r_lex"))
    // fusion: full outer on the two driver-size lists
    val byQueryR = Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id"))
    lex
      .join(sem, Seq("query_id", "doc_id"), "full_outer")
      .select(
        col("query_id"),
        col("doc_id"),
        (coalesce(lit(1.0) / (col("r_lex") + kRrf), lit(0.0)) +
          coalesce(lit(1.0) / (col("r_sem") + kRrf), lit(0.0))).as("rrf")
      )
      .withColumn("rank", row_number().over(byQueryR))
      .filter(col("rank") <= kOut)
      .select(
        col("query_id"),
        col("rank").cast("long").as("rank"),
        col("doc_id"),
        round(col("rrf"), 6).as("rrf_score")
      )
  }

  def searchHybrid(spark: SparkSession, dir: String): DataFrame =
    hybridTopK(Tables.documents(spark, dir), Tables.embeddings(spark, dir), nQueries = 5, kIn = 20, kOut = 10)
      .orderBy(col("query_id"), col("rank"))

  val searchHybridSql: String =
    """WITH corpus AS (
      |  SELECT d.doc_id, d.text, CAST(e.embedding AS DOUBLE[]) AS v
      |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
      |n AS (
      |  SELECT doc_id, v, SQRT(list_dot_product(v, v)) AS nrm FROM corpus),
      |sem_scored AS (
      |  SELECT q.doc_id AS query_id, c.doc_id AS doc_id,
      |         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
      |  FROM n q JOIN n c ON q.doc_id < 5 AND q.doc_id <> c.doc_id),
      |sem AS (
      |  SELECT query_id, doc_id, rank AS r_sem FROM (
      |    SELECT query_id, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, doc_id) AS rank
      |    FROM sem_scored) r
      |  WHERE rank <= 20),
      |words AS (
      |  SELECT DISTINCT doc_id,
      |    UNNEST(string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ')) AS w
      |  FROM corpus),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
      |inter AS (
      |  SELECT q.doc_id AS query_id, c.doc_id, COUNT(*) AS n_inter
      |  FROM words c JOIN words q ON q.w = c.w AND q.doc_id < 5 AND c.doc_id <> q.doc_id
      |  GROUP BY 1, 2),
      |lex AS (
      |  SELECT query_id, doc_id, rank AS r_lex FROM (
      |    SELECT i.query_id, i.doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY i.query_id ORDER BY
      |        CAST(i.n_inter AS DOUBLE) / (sc.n + sq.n - i.n_inter) DESC, i.doc_id) AS rank
      |    FROM inter i
      |    JOIN sizes sc ON sc.doc_id = i.doc_id
      |    JOIN sizes sq ON sq.doc_id = i.query_id) r
      |  WHERE rank <= 20),
      |fused AS (
      |  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
      |         COALESCE(l.doc_id, s.doc_id) AS doc_id,
      |         COALESCE(1.0 / (l.r_lex + 60), 0.0) + COALESCE(1.0 / (s.r_sem + 60), 0.0) AS rrf
      |  FROM lex l FULL OUTER JOIN sem s
      |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id)
      |SELECT query_id, rank, doc_id, ROUND(rrf, 6) AS rrf_score FROM (
      |  SELECT query_id, doc_id, rrf,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank
      |  FROM fused) f
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Positional phrase search — exact "w1 w2 …" adjacency matching
    * over a positional inverted index, the IR primitive BM25's
    * bag-of-words scoring can't express.
    *
    * Scale shape: the postings explode filters to the QUERY WORDS in
    * the same map-side projection (non-query words never leave the
    * scan — the bm25 discipline); adjacency is a self-join of the two
    * tiny filtered postings lists keyed on (doc_id, pos) with the
    * second list's positions pre-shifted; hits partial-aggregate per
    * doc and the top-k is one ordered limit over doc-cardinality rows.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String], k: Int = 20): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two words")
    val words = docs
      .select(col("doc_id"), posexplode(split(expr(NormSql), " ")).as(Seq("pos", "word")))
    val first = words
      .filter(col("word") === phrase.head)
      .select(col("doc_id"), col("pos"))
    // a common word's posting list is corpus-OCCURRENCE scale — the
    // adjacency joins are merge-hinted so no posting relation is ever
    // planned as a broadcast
    val matched = phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (w, i)) =>
      acc.join(
        words.filter(col("word") === w).select(col("doc_id"), (col("pos") - i).as("pos")).hint("merge"),
        Seq("doc_id", "pos")
      )
    }
    matched
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("pos")).cast("long").as("first_pos"))
      .orderBy(col("n_hits").desc, col("doc_id"))
      .limit(k)
  }

  /** Fixed phrase for the driver query (two common corpus words, so
    * adjacency hits exist at every scale factor by chance alone).
    */
  val Phrase: Seq[String] = Seq("table", "scan")

  def searchPhrase(spark: SparkSession, dir: String): DataFrame =
    phraseSearch(Tables.documents(spark, dir), Phrase)

  val searchPhraseSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, u.i - 1 AS pos, ws[CAST(u.i AS INT)] AS word FROM (
       |    SELECT doc_id,
       |      string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |    FROM documents) t,
       |    UNNEST(range(1, len(ws) + 1)) AS u(i)),
       |m AS (
       |  SELECT a.doc_id, a.pos
       |  FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  WHERE a.word = '${Phrase.head}' AND b.word = '${Phrase(1)}')
       |SELECT doc_id, COUNT(*) AS n_hits, CAST(MIN(pos) AS BIGINT) AS first_pos
       |FROM m GROUP BY doc_id
       |ORDER BY n_hits DESC, doc_id
       |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // Fuzzy term lookup
  // ---------------------------------------------------------------------

  /** Edit-distance-bounded fuzzy term lookup: for each (possibly
    * misspelled) query term, the vocabulary words within Levenshtein
    * distance 1, with their document frequencies — the query-rewrite
    * front end a search pipeline runs before BM25 when the term has no
    * exact hit.
    *
    * Scale shape: the corpus collapses to its VOCABULARY (one map-side
    * partially-aggregated shuffle at term cardinality) before any
    * distance computation; the query terms broadcast, and the length
    * band |len(w) − len(q)| ≤ 1 prunes the nested-loop probe before
    * the Levenshtein kernel runs (an edit of distance 1 changes length
    * by at most 1). For a large query workload the same frame extends
    * to SymSpell-style deletion-neighborhood join keys; with a
    * handful of probe terms the broadcast band-NLJ is the right plan.
    *
    * Portability: Levenshtein is the standard DP edit distance in both
    * engines; counts are exact integers — no floats anywhere.
    */
  def fuzzyLookup(spark: SparkSession, docs: DataFrame, terms: Seq[String], maxDist: Int = 1): DataFrame = {
    import spark.implicits._
    val q = terms.toDF("query_term")
    val vocab = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode_outer(array_distinct(expr(WordsSql))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("df"))
    vocab
      .join(
        broadcast(q),
        abs(length(col("word")) - length(col("query_term"))) <= maxDist &&
          levenshtein(col("word"), col("query_term")) <= maxDist
      )
      .select(
        col("query_term"),
        col("word"),
        levenshtein(col("word"), col("query_term")).cast("long").as("dist"),
        col("df")
      )
      .orderBy(col("query_term"), col("dist"), col("df").desc, col("word"))
  }

  /** Fixed misspelled probes over the testdata vocabulary (one
    * substitution, one insertion, one deletion, one double-letter).
    */
  val FuzzyTerms: Seq[String] = Seq("spzrk", "joinn", "windw", "scann")

  def searchFuzzy(spark: SparkSession, dir: String): DataFrame =
    fuzzyLookup(spark, Tables.documents(spark, dir), FuzzyTerms)

  val searchFuzzySql: String = {
    val probes = FuzzyTerms.map(t => s"('$t')").mkString(", ")
    s"""WITH v AS (
       |  SELECT u.word, COUNT(*) AS df
       |  FROM (SELECT list_distinct(string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ')) AS ws
       |        FROM documents WHERE text IS NOT NULL) t,
       |       UNNEST(ws) AS u(word)
       |  GROUP BY 1),
       |q(query_term) AS (VALUES $probes)
       |SELECT query_term, word, CAST(levenshtein(word, query_term) AS BIGINT) AS dist, df
       |FROM v JOIN q
       |  ON ABS(LENGTH(word) - LENGTH(query_term)) <= 1
       | AND levenshtein(word, query_term) <= 1
       |ORDER BY query_term, dist, df DESC, word""".stripMargin
  }

  // ---------------------------------------------------------------------
  // More-like-this (TF-IDF cosine document similarity)
  // ---------------------------------------------------------------------

  /** More-like-this: for each of the first `nQueries` documents, the
    * top-k most similar documents by TF-IDF COSINE over the shared
    * vocabulary — the "related documents" retrieval primitive (Lucene's
    * MoreLikeThis, here as one inverted-index join instead of a
    * re-issued term query).
    *
    * Scale shape (100 TB corpus): term weights build in ONE
    * (doc, term)-keyed partial agg off the exploded scan; document
    * frequencies are a vocabulary-cardinality relation joined onto it;
    * per-doc norms are a doc-grain agg of the same weight stream. The
    * query side (nQueries docs × their vocabulary) is BROADCAST onto
    * the posting stream, so the dot products form only for (query,
    * doc) pairs sharing a term — never all pairs — and each group is
    * cut to k by a WindowGroupLimit rank before the final shuffle.
    *
    * Portability: tf/df/N are exact integers; idf rounds to 9 decimals
    * after its one LN; weights are exact double products of identical
    * inputs; dot products and squared norms sum through DECIMAL
    * (order-independent); the cosine divides in one pinned order
    * (dot / (nq · nd), rounded to 6) — bit-stable across engines.
    */
  def moreLikeThis(docs: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    val d = docs.filter(col("text").isNotNull).select(col("doc_id"), expr(WordsSql).as("ws"))
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val tf = d
      .select(col("doc_id"), explode(col("ws")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val weights = tf
      .join(dfc, "term")
      .crossJoin(broadcast(nDocs))
      .select(
        col("doc_id"),
        col("term"),
        (col("tf") * round(log(lit(1.0) + col("n_docs") / col("df")), 9)).as("w")
      )
    val norms = weights
      .groupBy(col("doc_id"))
      .agg(round(sqrt(sum((col("w") * col("w")).cast(dec)).cast("double")), 9).as("nrm"))
    val qw = weights
      .filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("term"), col("w").as("wq"))
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("doc_id"))
    weights
      .join(broadcast(qw), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum((col("w") * col("wq")).cast(dec)).cast("double").as("dot"))
      .join(norms.select(col("doc_id"), col("nrm").as("nd")), "doc_id")
      .join(broadcast(norms.select(col("doc_id").as("query_id"), col("nrm").as("nq"))), "query_id")
      .select(
        col("query_id"),
        col("doc_id"),
        round(col("dot") / (col("nq") * col("nd")), 6).as("cos")
      )
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("doc_id"), col("cos"))
  }

  def searchMlt(spark: SparkSession, dir: String): DataFrame =
    moreLikeThis(Tables.documents(spark, dir), nQueries = 3, k = 10)
      .orderBy(col("query_id"), col("rank"))

  val searchMltSql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))), ' ') AS ws
      |  FROM documents WHERE text IS NOT NULL),
      |nd AS (SELECT COUNT(*) AS n_docs FROM d),
      |tf AS (
      |  SELECT doc_id, u.term, COUNT(*) AS tf
      |  FROM d, UNNEST(ws) AS u(term)
      |  GROUP BY 1, 2),
      |dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |w AS (
      |  SELECT tf.doc_id, tf.term,
      |    tf.tf * ROUND(LN(1.0 + nd.n_docs / dfc.df), 9) AS w
      |  FROM tf JOIN dfc USING (term) CROSS JOIN nd),
      |norms AS (
      |  SELECT doc_id,
      |    ROUND(SQRT(CAST(SUM(CAST(w * w AS DECIMAL(27,10))) AS DOUBLE)), 9) AS nrm
      |  FROM w GROUP BY 1),
      |dots AS (
      |  SELECT q.doc_id AS query_id, c.doc_id,
      |    CAST(SUM(CAST(c.w * q.w AS DECIMAL(27,10))) AS DOUBLE) AS dot
      |  FROM w c JOIN w q ON q.term = c.term AND q.doc_id < 3 AND c.doc_id <> q.doc_id
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT query_id, dots.doc_id,
      |    ROUND(dot / (nq.nrm * nc.nrm), 6) AS cos
      |  FROM dots
      |  JOIN norms nc ON nc.doc_id = dots.doc_id
      |  JOIN norms nq ON nq.doc_id = dots.query_id),
      |ranked AS (
      |  SELECT query_id, doc_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, doc_id, cos
      |FROM ranked WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------------
  // Prefix autocomplete
  // ---------------------------------------------------------------------

  /** Prefix autocomplete: for each probe prefix, the top-k vocabulary
    * completions ranked by document frequency — the search-box suggest
    * primitive (Lucene's prefix query + popularity sort).
    *
    * Scale shape: the corpus collapses to its VOCABULARY (word,
    * document-frequency) in one partial agg off the per-doc distinct
    * word lists — the only data-scale pass. Prefix probes are a
    * driver-size literal relation broadcast onto that vocabulary; the
    * rank window then runs on prefix-filtered candidates only
    * (vocabulary cardinality × matching prefixes, never corpus scale).
    */
  def prefixSuggest(docs: DataFrame, prefixes: Seq[String], k: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val vocab = docs
      .filter(col("text").isNotNull)
      .select(explode(array_distinct(expr(WordsSql))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("df"))
    val probes = prefixes.toDF("prefix")
    val byPrefix = Window.partitionBy(col("prefix")).orderBy(col("df").desc, col("word"))
    vocab
      .join(broadcast(probes), col("word").startsWith(col("prefix")))
      .withColumn("rank", row_number().over(byPrefix))
      .filter(col("rank") <= k)
      .select(col("prefix"), col("rank").cast("long").as("rank"), col("word"), col("df"))
  }

  /** Fixed probe prefixes over the testdata vocabulary. */
  val SuggestPrefixes: Seq[String] = Seq("s", "jo", "wi", "b")

  def searchSuggest(spark: SparkSession, dir: String): DataFrame =
    prefixSuggest(Tables.documents(spark, dir), SuggestPrefixes, k = 10)
      .orderBy(col("prefix"), col("rank"))

  val searchSuggestSql: String = {
    val probes = SuggestPrefixes.map(p => s"('$p')").mkString(", ")
    s"""WITH v AS (
       |  SELECT u.word, COUNT(*) AS df
       |  FROM (SELECT list_distinct(string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ')) AS ws
       |        FROM documents WHERE text IS NOT NULL) t,
       |       UNNEST(ws) AS u(word)
       |  WHERE LENGTH(u.word) > 0
       |  GROUP BY 1),
       |q(prefix) AS (VALUES $probes),
       |ranked AS (
       |  SELECT q.prefix, v.word, v.df,
       |    ROW_NUMBER() OVER (PARTITION BY q.prefix ORDER BY v.df DESC, v.word) AS rank
       |  FROM v JOIN q ON starts_with(v.word, q.prefix))
       |SELECT prefix, rank, word, df
       |FROM ranked WHERE rank <= 10
       |ORDER BY prefix, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Substring (grep) search via a trigram inverted index
  // ---------------------------------------------------------------------

  /** Trigram candidate set for a literal substring pattern: documents
    * whose text contains EVERY trigram of the pattern — a superset of
    * the true matches (trigrams ignore adjacency), never a miss.
    *
    * Scale shape (the pg_trgm / Lucene-ngram plan): the pattern's
    * trigram set is a tiny LITERAL predicate pushed inside the one
    * corpus scan — the explode emits ONLY pattern-gram hits map-side,
    * so the sole shuffle is a (doc, gram)-keyed partial agg over rows
    * that already matched, not the full posting list. Against a
    * PRE-BUILT trigram index table the same plan is an index probe;
    * building inline costs one scan either way.
    */
  def trigramCandidates(docs: DataFrame, pattern: String): DataFrame = {
    require(pattern.length >= 3, "pattern must be at least one trigram long")
    val patGrams = pattern.sliding(3).toSeq.distinct
    docs
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        explode(
          expr("transform(sequence(1, greatest(length(text) - 2, 0)), i -> substring(text, i, 3))")
        ).as("gram")
      )
      .filter(col("gram").isin(patGrams: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("__ng"))
      .filter(col("__ng") === patGrams.size)
      .select(col("doc_id"))
  }

  /** Substring search: exact `contains(text, pattern)` matches with
    * non-overlapping occurrence counts, resolved through
    * [[trigramCandidates]] so the exact verify touches ONLY candidate
    * documents (a semi-join), never the corpus — same answer as the
    * naive full scan, index-probe cost profile.
    */
  def substringSearch(docs: DataFrame, pattern: String): DataFrame = {
    val m = pattern.length
    docs
      .join(trigramCandidates(docs, pattern), Seq("doc_id"), "left_semi")
      .filter(col("text").contains(pattern))
      .select(
        col("doc_id"),
        col("source"),
        ((length(col("text")) -
          length(expr(s"replace(text, '$pattern', '')"))) / m).cast("long").as("occurrences")
      )
  }

  val SubstringPattern = "merge part"

  def searchSubstring(spark: SparkSession, dir: String): DataFrame =
    substringSearch(Tables.documents(spark, dir), SubstringPattern)

  /** Oracle: the naive full-scan grep — the index path must return
    * exactly the scan's answer.
    */
  val searchSubstringSql: String =
    s"""SELECT doc_id, source,
       |  CAST((LENGTH(text) - LENGTH(REPLACE(text, '$SubstringPattern', ''))) // ${SubstringPattern.length} AS BIGINT) AS occurrences
       |FROM documents
       |WHERE text IS NOT NULL AND contains(text, '$SubstringPattern')
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Boolean retrieval (AND / NOT postings algebra)
  // ---------------------------------------------------------------------

  /** Fixed boolean workload: (query_id, must-terms, must-not-terms). */
  val BoolQueries: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("q_spark_join_not_slow", Seq("spark", "join"), Seq("slow")),
    ("q_table_scan_not_merge", Seq("table", "scan"), Seq("merge")),
    ("q_hash_pure", Seq("hash"), Seq("sort", "window"))
  )

  /** Boolean retrieval over the postings relation: documents containing
    * EVERY must-term and NONE of the must-not terms, scored by the
    * summed must-term frequency — the AND/NOT set algebra underneath
    * every search engine's filter syntax (`+spark +join -slow`).
    *
    * Scale shape: the exploded word stream filters to the combined
    * query vocabulary inside the scan projection (non-query words
    * never shuffle); term frequencies partial-aggregate on
    * (doc_id, term); the query spec is a broadcast literal relation,
    * so the AND/NOT evaluation is one more (query, doc)-keyed partial
    * agg — conjunction via distinct-must-count, negation via a
    * summed flag, no per-query rescans and no anti-join pass.
    */
  def booleanSearch(spark: SparkSession, docs: DataFrame, queries: Seq[(String, Seq[String], Seq[String])]): DataFrame = {
    import spark.implicits._
    val spec = queries
      .flatMap { case (q, must, not) => must.map((q, _, false)) ++ not.map((q, _, true)) }
      .toDF("query_id", "term", "neg")
    val nPos = queries.map { case (q, must, _) => (q, must.size.toLong) }.toDF("query_id", "__np")
    val vocab = queries.flatMap { case (_, m, n) => m ++ n }.distinct
    val tf = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(expr(WordsSql)).as("term"))
      .filter(col("term").isin(vocab: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    tf.join(broadcast(spec), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(
        count_distinct(when(!col("neg"), col("term"))).as("__pos"),
        sum(when(col("neg"), lit(1L)).otherwise(lit(0L))).as("__negs"),
        sum(when(!col("neg"), col("tf")).otherwise(lit(0L))).as("matched_tf")
      )
      .join(broadcast(nPos), "query_id")
      .filter(col("__pos") === col("__np") && col("__negs") === 0L)
      .select(col("query_id"), col("doc_id"), col("matched_tf"))
  }

  def searchBoolean(spark: SparkSession, dir: String): DataFrame =
    booleanSearch(spark, Tables.documents(spark, dir), BoolQueries)
      .orderBy(col("query_id"), col("doc_id"))

  // ---------------------------------------------------------------------
  // Proximity snippet extraction (minimum span containing both terms)
  // ---------------------------------------------------------------------

  /** Snippet terms and result budget for the fixed driver query. */
  val SnippetTerms: (String, String) = ("spark", "join")
  val SnippetK = 10

  /** Proximity snippets: for every document containing BOTH terms, the
    * closest co-occurrence — the (pos_a, pos_b) pair minimizing
    * |pos_a − pos_b| — ranked by tightness across the corpus. This is
    * the highlight-window primitive a search UI builds "…best matching
    * passage…" from, and the proximity re-ranker BM25 lacks (bag of
    * words can't tell "spark…join" in one phrase from opposite ends of
    * the document).
    *
    * Scale shape: the positional index filters to the two query terms
    * INSIDE the scan projection; the pair fan-out joins the two
    * position lists on the doc_id equi-key, so pairs are bounded by
    * tf_a × tf_b per document (query-term frequencies, not document
    * length); the argmin is one algebraic struct-min per doc; the
    * final top-k orders a doc-grain relation. Ties break to the
    * earliest (pos_a, pos_b).
    */
  def proximitySnippets(docs: DataFrame, termA: String, termB: String, k: Int): DataFrame = {
    val pos = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), posexplode(split(expr(NormSql), " ")).as(Seq("pos", "word")))
      .filter(col("word").isin(termA, termB))
    val pa = pos.filter(col("word") === termA).select(col("doc_id"), col("pos").as("__pa"))
    val pb = pos.filter(col("word") === termB).select(col("doc_id"), col("pos").as("__pb"))
    // term-posting relations are corpus-occurrence scale: merge-hinted
    pa.join(pb.hint("merge"), Seq("doc_id"))
      .groupBy(col("doc_id"))
      .agg(min(struct(abs(col("__pa") - col("__pb")).as("span"), col("__pa"), col("__pb"))).as("__best"))
      .select(
        col("doc_id"),
        col("__best.span").cast("long").as("span"),
        col("__best.__pa").cast("long").as("pos_a"),
        col("__best.__pb").cast("long").as("pos_b")
      )
      .orderBy(col("span"), col("doc_id"))
      .limit(k)
  }

  def searchSnippet(spark: SparkSession, dir: String): DataFrame =
    proximitySnippets(Tables.documents(spark, dir), SnippetTerms._1, SnippetTerms._2, SnippetK)
      .orderBy(col("span"), col("doc_id"))

  val searchSnippetSql: String = {
    val (ta, tb) = SnippetTerms
    s"""WITH w AS (
       |  SELECT doc_id, u.i - 1 AS pos, ws[CAST(u.i AS INT)] AS word FROM (
       |    SELECT doc_id,
       |      string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |    FROM documents WHERE text IS NOT NULL) t,
       |    UNNEST(range(1, len(ws) + 1)) AS u(i)),
       |pr AS (
       |  SELECT a.doc_id, ABS(a.pos - b.pos) AS span, a.pos AS pos_a, b.pos AS pos_b
       |  FROM (SELECT doc_id, pos FROM w WHERE word = '$ta') a
       |  JOIN (SELECT doc_id, pos FROM w WHERE word = '$tb') b ON b.doc_id = a.doc_id),
       |best AS (
       |  SELECT doc_id, span, pos_a, pos_b,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY span, pos_a, pos_b) AS rn
       |  FROM pr)
       |SELECT doc_id,
       |  CAST(span AS BIGINT) AS span,
       |  CAST(pos_a AS BIGINT) AS pos_a,
       |  CAST(pos_b AS BIGINT) AS pos_b
       |FROM best
       |WHERE rn = 1
       |ORDER BY span, doc_id
       |LIMIT $SnippetK""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Retrieval evaluation (precision@k / MRR vs conjunctive relevance)
  // ---------------------------------------------------------------------

  /** Ranking-quality evaluation of the BM25 engine: relevance = the
    * conjunctive match set (documents containing EVERY query term —
    * the labelless-corpus stand-in for judgments, exactly the
    * "known-item" protocol), scored per query with hits@k,
    * precision@k and MRR. The IR counterpart of ann_recall: the
    * lexical index needs an acceptance metric too.
    *
    * Scale shape: the relevance set reuses the boolean-conjunction
    * shape (one tf agg, distinct-must-count); the BM25 side is the
    * proven top-k pipeline (driver-size output); the join is
    * (query, doc)-keyed at k·queries cardinality, metrics one partial
    * agg per query.
    */
  /** A document is relevant to a query iff EVERY query term occurs at
    * least this often in it — the strong-match protocol that keeps the
    * judgment set selective on a small-vocabulary corpus (plain
    * conjunctive presence matches most documents and scores every
    * ranker 1.0).
    */
  val RelevanceMinTf = 3

  def rankEval(spark: SparkSession, docs: DataFrame, queries: Seq[(String, Seq[String])], k: Int): DataFrame = {
    import spark.implicits._
    val ranked = bm25TopK(spark, docs, queries, k)
      .select(col("query_id"), col("rank"), col("doc_id"))
    val spec = queries.flatMap { case (q, ts) => ts.map((q, _)) }.toDF("query_id", "term")
    val nPos = queries.map { case (q, ts) => (q, ts.size.toLong) }.toDF("query_id", "__np")
    val vocab = queries.flatMap(_._2).distinct
    val rel = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(expr(WordsSql)).as("term"))
      .filter(col("term").isin(vocab: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("__tf"))
      .filter(col("__tf") >= RelevanceMinTf)
      .join(broadcast(spec), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("__hits"))
      .join(broadcast(nPos), "query_id")
      .filter(col("__hits") === col("__np"))
      .select(col("query_id"), col("doc_id"))
    val relCounts = rel.groupBy(col("query_id")).agg(count(lit(1)).as("n_relevant"))
    ranked
      .join(rel.withColumn("__rel", lit(1L)), Seq("query_id", "doc_id"), "left")
      .groupBy(col("query_id"))
      .agg(
        sum(coalesce(col("__rel"), lit(0L))).as("hits_at_k"),
        min(when(col("__rel").isNotNull, col("rank"))).as("__first")
      )
      .join(broadcast(relCounts), Seq("query_id"), "left")
      .select(
        col("query_id"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        col("hits_at_k"),
        round(col("hits_at_k").cast("double") / lit(k.toDouble), 6).as("precision_at_k"),
        round(
          coalesce(lit(1.0) / col("__first").cast("double"), lit(0.0)),
          6
        ).as("mrr")
      )
  }

  def searchRankEval(spark: SparkSession, dir: String): DataFrame =
    rankEval(spark, Tables.documents(spark, dir), Queries, TopK)
      .orderBy(col("query_id"))

  val searchRankEvalSql: String = {
    val specVals = Queries.flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }.mkString(", ")
    val nposVals = Queries.map { case (q, ts) => s"('$q', ${ts.size})" }.mkString(", ")
    val vocab = Queries.flatMap(_._2).distinct.map(t => s"'$t'").mkString(", ")
    s"""WITH ranked AS ($bm25SearchSql),
       |w AS (
       |  SELECT doc_id, u.term
       |  FROM (SELECT doc_id, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |        FROM documents WHERE text IS NOT NULL) d,
       |       UNNEST(ws) AS u(term)
       |  WHERE u.term IN ($vocab)
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $RelevanceMinTf),
       |spec(query_id, term) AS (VALUES $specVals),
       |np(query_id, n_pos) AS (VALUES $nposVals),
       |rel AS (
       |  SELECT s.query_id, w.doc_id
       |  FROM w JOIN spec s ON s.term = w.term
       |  JOIN np ON np.query_id = s.query_id
       |  GROUP BY s.query_id, w.doc_id, np.n_pos
       |  HAVING COUNT(*) = np.n_pos),
       |rc AS (SELECT query_id, COUNT(*) AS n_relevant FROM rel GROUP BY 1),
       |j AS (
       |  SELECT r.query_id, r.rank,
       |    CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
       |  FROM ranked r LEFT JOIN rel ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id),
       |m AS (
       |  SELECT query_id,
       |    CAST(SUM(is_rel) AS BIGINT) AS hits_at_k,
       |    MIN(CASE WHEN is_rel = 1 THEN rank END) AS first_rel
       |  FROM j GROUP BY 1)
       |SELECT m.query_id,
       |  CAST(COALESCE(rc.n_relevant, 0) AS BIGINT) AS n_relevant,
       |  m.hits_at_k,
       |  ROUND(CAST(m.hits_at_k AS DOUBLE) / $TopK.0, 6) AS precision_at_k,
       |  ROUND(COALESCE(1.0 / CAST(m.first_rel AS DOUBLE), 0.0), 6) AS mrr
       |FROM m LEFT JOIN rc ON rc.query_id = m.query_id
       |ORDER BY m.query_id""".stripMargin
  }

  val searchBooleanSql: String = {
    val specVals = BoolQueries
      .flatMap { case (q, must, not) =>
        must.map(t => s"('$q', '$t', false)") ++ not.map(t => s"('$q', '$t', true)")
      }
      .mkString(", ")
    val nposVals = BoolQueries.map { case (q, m, _) => s"('$q', ${m.size})" }.mkString(", ")
    val vocab = BoolQueries.flatMap { case (_, m, n) => m ++ n }.distinct.map(t => s"'$t'").mkString(", ")
    s"""WITH tf AS (
       |  SELECT doc_id, u.term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |        FROM documents WHERE text IS NOT NULL) d,
       |       UNNEST(ws) AS u(term)
       |  WHERE u.term IN ($vocab)
       |  GROUP BY 1, 2),
       |spec(query_id, term, neg) AS (VALUES $specVals),
       |np(query_id, n_pos) AS (VALUES $nposVals),
       |ev AS (
       |  SELECT s.query_id, tf.doc_id,
       |    COUNT(DISTINCT CASE WHEN NOT s.neg THEN s.term END) AS pos,
       |    SUM(CASE WHEN s.neg THEN 1 ELSE 0 END) AS negs,
       |    CAST(SUM(CASE WHEN NOT s.neg THEN tf.tf ELSE 0 END) AS BIGINT) AS matched_tf
       |  FROM tf JOIN spec s ON s.term = tf.term
       |  GROUP BY 1, 2)
       |SELECT ev.query_id, ev.doc_id, ev.matched_tf
       |FROM ev JOIN np ON np.query_id = ev.query_id
       |WHERE ev.pos = np.n_pos AND ev.negs = 0
       |ORDER BY ev.query_id, ev.doc_id""".stripMargin
  }
}
