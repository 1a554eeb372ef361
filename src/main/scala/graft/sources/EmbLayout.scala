package graft.sources

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The at-scale storage layout for an embedding corpus: parquet
  * partitioned by the LSH hyperplane bucket.
  *
  * The bucket id is a pure scan-side expression (signs of dot products
  * against literal hyperplanes — see [[Similarity.hyperplaneBucket]]),
  * so it is derivable AT WRITE TIME: each vector lands in the
  * directory of its own bucket once, and every later ANN probe becomes
  * partition pruning. A multi-probe query touches its base bucket plus
  * the `planes` hamming-1 neighbors — (planes+1) directories out of
  * 2^planes — so a top-k search over a 100 TB corpus lists and reads
  * ~3.5% of the files (planes = 8) before a single row is scored.
  * This is the embedding-table analog of [[TsLayout]]'s channel/day
  * pruning: the index IS the directory structure, no server, no
  * side-file.
  */
object EmbLayout {

  /** Plane count — matches [[Similarity.annLsh]]'s testdata sizing
    * (2^4 buckets for the testdata corpus density) so the layout-served
    * query is value-identical to the flat-table one; larger corpora
    * raise planes to keep per-bucket candidate counts flat, which
    * ALSO sharpens the pruning ratio ((planes+1)/2^planes directories
    * probed).
    */
  val Planes = 4

  /** One-time write: vectors land in their bucket's directory. One
    * writer task per partition dir (the bucket key is the repartition
    * key); files inside a bucket are sorted by vec_id for stable
    * row-group stats.
    */
  def write(emb: DataFrame, path: String, planes: Int = Planes, dim: Int = 64): Unit = {
    val hp = Similarity.hyperplanes(planes, dim)
    emb
      .withColumn("p_bucket", Similarity.hyperplaneBucket(col("embedding"), hp))
      .repartition(col("p_bucket"))
      .sortWithinPartitions(col("p_bucket"), col("vec_id"))
      .write
      .partitionBy("p_bucket")
      .mode("overwrite")
      .parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Written-once-per-JVM layout for a testdata dir — query-time
    * setup, not query work (the [[TsLayout.layoutFor]] discipline), so
    * benchmark reps measure the pruned read path.
    */
  private val layoutCache = scala.collection.concurrent.TrieMap[String, String]()

  def layoutFor(spark: SparkSession, dir: String): String =
    layoutCache.getOrElseUpdate(
      dir, {
        val path = CacheDirs.taggedCacheDir("target/emb_layout", dir).getAbsolutePath
        write(graft.Tables.embeddings(spark, dir), path)
        path
      }
    )

  /** The multi-probe top-k served FROM the layout: the query set's
    * base buckets are evaluated driver-side (a request-scale fetch —
    * one long per query, the BlobStore range-request shape), expanded
    * to the hamming-1 probe set, and pushed as a partition IN-filter,
    * so the corpus scan underneath [[Similarity.lshTopK]] reads ONLY
    * the probed directories. Results are identical to the flat-table
    * [[Similarity.annLsh]] by construction (the probe join re-applies
    * the same bucket-match predicate on the pruned rows); the oracle
    * is annLshSql verbatim, and SourcesSpec asserts the scan's
    * partition count.
    */
  def annLshLayout(spark: SparkSession, dir: String): DataFrame = {
    val path = layoutFor(spark, dir)
    val emb = graft.Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < Similarity.QueryCount)
    val hp = Similarity.hyperplanes(Planes, 64)
    // request-scale driver fetch: ≤ QueryCount base bucket ids
    val base = queries
      .select(Similarity.hyperplaneBucket(col("embedding"), hp).as("b"))
      .distinct()
      .collect()
      .map(_.getLong(0))
    val probes = base.flatMap(b => b +: (0 until Planes).map(p => b ^ (1L << p))).distinct.sorted
    val corpus = read(spark, path)
      .filter(col("p_bucket").isin(probes: _*))
      .select(col("vec_id"), col("embedding"))
    Similarity
      .lshTopK(corpus, queries, Similarity.TopK, planes = Planes)
      .orderBy(col("query_id"), col("rank"))
  }
}
