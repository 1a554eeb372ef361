package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design (100 TB corpus, small-to-medium query set):
  *  - brute force: the QUERY SET is broadcast; the corpus is scanned
  *    once and never shuffled — each partition computes its local
  *    per-query top-k and only those tiny per-partition heads shuffle
  *    for the global top-k (TakeOrdered per query). Cost is one corpus
  *    scan regardless of k.
  *  - LSH: random-hyperplane signatures bucket the corpus (the bucket
  *    id is a codegen'd expression, derivable at write time for a
  *    bucket-partitioned layout); queries multiprobe their bucket plus
  *    all hamming-1 neighbors, so the scan touches only
  *    (planes+1)/2^planes of the corpus at the cost of some recall.
  */
object Similarity {

  /** Cast float[] embedding to double[] with its L2 norm precomputed. */
  private def prepped(emb: DataFrame, idOut: String, vOut: String, nOut: String): DataFrame =
    emb
      .select(
        col("vec_id").as(idOut),
        expr("transform(embedding, x -> cast(x as double))").as(vOut)
      )
      .withColumn(nOut, sqrt(expr(s"aggregate($vOut, 0.0D, (acc, x) -> acc + x * x)")))

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Queries are broadcast; the corpus is
    * scanned once.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = prepped(corpus, "neighbor_id", "vc", "nc")
    val q = prepped(queries, "query_id", "vq", "nq")
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn(
        "cosine",
        expr("aggregate(zip_with(vq, vc, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)") /
          (col("nq") * col("nc"))
      )
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** Random-hyperplane signature: bit p of the bucket id is the sign of
    * v · r_p, where r_p is a deterministic pseudo-random hyperplane
    * derived from xxhash64(p, i) mapped into [-1, 1]. Pure expression —
    * the corpus-side bucket id can be precomputed at ingest and used as
    * a partition key at scale.
    */
  def hyperplaneBucket(vCol: String, planes: Int): org.apache.spark.sql.Column =
    expr(
      s"aggregate(sequence(0, ${planes - 1}), 0L, (acc, p) -> acc | (CASE WHEN " +
        s"aggregate(zip_with($vCol, transform(sequence(0, size($vCol) - 1), i -> cast(pmod(xxhash64(p, i), 2000001) as double) / 1000000.0D - 1.0D), (x, r) -> x * r), " +
        "0.0D, (a, d) -> a + d) > 0.0D THEN shiftleft(1L, p) ELSE 0L END))"
    )

  /** LSH-bucketed ANN: corpus vectors live in their exact bucket;
    * queries probe their own bucket plus every bucket at hamming
    * distance 1, then rank candidates by exact cosine and keep top-k.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8): DataFrame = {
    val c = prepped(corpus, "neighbor_id", "vc", "nc")
      .withColumn("bucket", hyperplaneBucket("vc", planes))
    val q = prepped(queries, "query_id", "vq", "nq")
      .withColumn("__b0", hyperplaneBucket("vq", planes))
      .select(
        col("query_id"),
        col("vq"),
        col("nq"),
        explode(
          expr(s"concat(array(__b0), transform(sequence(0, ${planes - 1}), p -> __b0 ^ shiftleft(1L, p)))")
        ).as("bucket")
      )
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn(
        "cosine",
        expr("aggregate(zip_with(vq, vc, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)") /
          (col("nq") * col("nc"))
      )
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  // ---------------------------------------------------------------------
  // Fixed driver queries
  // ---------------------------------------------------------------------

  val QueryCount = 10
  val TopK = 5

  def annBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    bruteForceTopK(emb, emb.filter(col("vec_id") < QueryCount), TopK)
      .orderBy(col("query_id"), col("rank"))
  }

  val annBruteforceSql: String =
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
       |  FROM n q JOIN n c ON q.vec_id < $QueryCount AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_raw,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, ROUND(cos_raw, 6) AS cosine
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // planes sized for the testdata corpus density (2^4 buckets);
    // larger corpora raise planes to keep per-bucket candidate counts flat
    lshTopK(emb, emb.filter(col("vec_id") < QueryCount), TopK, planes = 4)
      .orderBy(col("query_id"), col("rank"))
  }
}
