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
}
