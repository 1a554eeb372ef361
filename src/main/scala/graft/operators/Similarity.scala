package graft.operators

import graft.Tables
import graft.functions.VectorMath
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * The cosine hot path is the custom codegen'd `VecDot` Catalyst
  * expression (graft.functions.VectorMath) reading the float32 arrays
  * directly — no interpreted higher-order lambdas, no cast
  * materialization.
  *
  * Scale design (100 TB corpus, small-to-medium query set):
  *  - brute force: the QUERY SET is broadcast; the corpus is scanned
  *    once and never shuffled — cost is one corpus scan regardless of k.
  *  - LSH: random-hyperplane signatures bucket the corpus (the bucket
  *    id is a scan-side expression, derivable at write time for a
  *    bucket-partitioned layout); queries multiprobe their bucket plus
  *    all hamming-1 neighbors, so the scan touches only
  *    (planes+1)/2^planes of the corpus at the cost of some recall.
  */
object Similarity {

  /** Keep the raw float[] embedding; precompute its L2 norm once. */
  private def prepped(emb: DataFrame, idOut: String, vOut: String, nOut: String): DataFrame =
    emb
      .select(col("vec_id").as(idOut), col("embedding").as(vOut))
      .withColumn(nOut, VectorMath.norm(col(vOut)))

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Queries are broadcast; the corpus is
    * scanned once.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = prepped(corpus, "neighbor_id", "vc", "nc")
    val q = prepped(queries, "query_id", "vq", "nq")
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorMath.cosine(col("vq"), col("vc"), col("nq"), col("nc")))
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        round(col("cosine"), 6).as("cosine")
      )
  }

  /** Maximum-inner-product top-k (MIPS) — the retrieval primitive for
    * un-normalized embedding families (recommendation scores,
    * dual-encoder logits) where magnitude carries signal and cosine is
    * the wrong order. Queries are broadcast; the corpus is scanned
    * once; each group is cut to k by a WindowGroupLimit rank before
    * the final shuffle — identical shape to the cosine baseline.
    *
    * Scale path (documented, same reduction the ANN family uses): MIPS
    * reduces to cosine ANN by augmenting every corpus vector with one
    * coordinate sqrt(M² − ‖x‖²) where M = max ‖x‖ (Bachrach et al.,
    * RecSys 2014; Shrivastava & Li, NeurIPS 2014) — after which the
    * existing LSH/IVF bucketed indexes apply unchanged, so the exact
    * scan here is the declared small-scale baseline, not the 100 TB
    * plan.
    */
  def mipsTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("vc"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("vq"))
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", VectorMath.dot(col("vq"), col("vc")))
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        round(col("score"), 6).as("score")
      )
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64 stream) built
    * driver-side and embedded as literals — the corpus-side bucket id is
    * then a pure codegen'd expression usable as a partition key at
    * ingest.
    */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    var state = seed
    def next(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Seq.fill(planes)(Seq.fill(dim)((next() >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0))
  }

  /** Random-hyperplane signature: bit p of the bucket id is the sign of
    * v · plane_p (codegen'd VecDot against literal plane vectors).
    */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, i) =>
        when(VectorMath.dot(v, typedlit(p)) > 0.0, lit(1L << i)).otherwise(lit(0L))
      }
      .reduce(_ bitwiseOR _)

  /** LSH-bucketed ANN: corpus vectors live in their exact bucket;
    * queries probe their own bucket plus every bucket at hamming
    * distance 1, then rank candidates by exact cosine and keep top-k.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8, dim: Int = 64): DataFrame = {
    // dim must cover the embedding length: VecDot loops over the
    // shorter array, so undersized hyperplanes would silently bucket on
    // a truncated dot product
    val hp = hyperplanes(planes, dim)
    val c = prepped(corpus, "neighbor_id", "vc", "nc")
      .withColumn("bucket", hyperplaneBucket(col("vc"), hp))
    val q0 = prepped(queries, "query_id", "vq", "nq")
      .withColumn("__b0", hyperplaneBucket(col("vq"), hp))
    val probes = col("__b0") +: (0 until planes).map(p => col("__b0").bitwiseXOR(lit(1L << p)))
    val q = q0.select(
      col("query_id"),
      col("vq"),
      col("nq"),
      explode(array(probes: _*)).as("bucket")
    )
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorMath.cosine(col("vq"), col("vc"), col("nq"), col("nc")))
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        round(col("cosine"), 6).as("cosine")
      )
  }

  /** Radius (threshold) retrieval — the dual of top-k: return EVERY
    * corpus vector within cosine >= tau of each query, mined through
    * the same multi-probe hyperplane buckets as [[lshTopK]]. The
    * retrieval mode RAG recall stages and near-duplicate lookups use
    * when "how many" is data-dependent.
    *
    * Same scale shape as lshTopK: queries broadcast with planes+1
    * probe buckets each, the corpus is scanned once and only
    * shared-bucket candidates are scored; multi-probe collisions
    * dedup AFTER the threshold cut, so the distinct runs on the
    * surviving pairs, not the candidate stream.
    */
  def lshRadius(
      corpus: DataFrame,
      queries: DataFrame,
      tau: Double,
      planes: Int = 8,
      dim: Int = 64
  ): DataFrame = {
    val hp = hyperplanes(planes, dim)
    val c = prepped(corpus, "neighbor_id", "vc", "nc")
      .withColumn("bucket", hyperplaneBucket(col("vc"), hp))
    val q0 = prepped(queries, "query_id", "vq", "nq")
      .withColumn("__b0", hyperplaneBucket(col("vq"), hp))
    val probes = col("__b0") +: (0 until planes).map(p => col("__b0").bitwiseXOR(lit(1L << p)))
    val q = q0.select(
      col("query_id"),
      col("vq"),
      col("nq"),
      explode(array(probes: _*)).as("bucket")
    )
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorMath.cosine(col("vq"), col("vc"), col("nq"), col("nc")))
      .filter(col("cosine") >= tau)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
      .distinct()
  }

  /** IVF-style ANN: a deterministic sample of corpus vectors serves as
    * the coarse quantizer ("centroids" — at scale these come from a
    * proper k-means job and are persisted as the index). Every corpus
    * vector is assigned to its nearest centroid in one codegen'd
    * projection (C vec_dot columns + argmax, no shuffle); queries probe
    * the `nProbe` nearest centroid lists and rank those candidates by
    * exact cosine. The scan touches ~nProbe/C of the corpus.
    */
  def ivfTopK(
    corpus: DataFrame,
    queries: DataFrame,
    k: Int,
    nCentroids: Int = 16,
    nProbe: Int = 4
  ): DataFrame = {
    // index build: deterministic hash-ranked sample as centroids
    // (ranked by md5 of the id string — a hash both engines derive
    // identically, keeping the whole index build oracle-reproducible)
    val centroids: Array[(Long, Seq[Double])] = corpus
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCentroids)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))

    def simStructs(v: Column): Seq[Column] = centroids.zipWithIndex.map { case ((_, cv), i) =>
      struct(VectorMath.dot(v, typedlit(cv)).as("sim"), lit(i).as("cid"))
    }

    val c = prepped(corpus, "neighbor_id", "vc", "nc")
      .withColumn("cid", greatest(simStructs(col("vc")): _*).getField("cid"))
    val q = prepped(queries, "query_id", "vq", "nq")
      .withColumn(
        "cid",
        explode(
          slice(reverse(array_sort(array(simStructs(col("vq")): _*))), 1, nProbe).getField("cid")
        )
      )
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorMath.cosine(col("vq"), col("vc"), col("nq"), col("nc")))
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        round(col("cosine"), 6).as("cosine")
      )
  }

  /** k-NN label vote: classify each query vector by the majority label
    * among its k exact nearest neighbors — the standard embedding-space
    * eval a pipeline runs over a labeled slice. Composes
    * [[bruteForceTopK]] (queries broadcast, corpus scanned once) with a
    * label join where the SMALL side is the neighbor list
    * (queries × k rows — broadcast), so the corpus-scale label catalog
    * is never shuffled. The label lookup is a SECOND scan of the
    * table, but a column-pruned one — parquet reads only
    * (vec_id, label), ~1% of the embedding-column bytes the first scan
    * pays (PlanSpec asserts the pruned ReadSchema) — kept in
    * preference to threading label through bruteForceTopK's ranking
    * columns. Ties break deterministically on (votes desc, label asc).
    */
  def knnLabelVote(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val nn = bruteForceTopK(emb, queries, k)
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("votes").desc, col("label"))
    emb
      .select(col("vec_id").as("neighbor_id"), col("label"))
      .join(broadcast(nn.select(col("query_id"), col("neighbor_id"))), "neighbor_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("__r", row_number().over(byQuery))
      .filter(col("__r") === 1)
      .select(col("query_id"), col("label").as("predicted_label"), col("votes"))
  }

  /** Hard-negative mining — the contrastive-training data step (DPR,
    * Karpukhin et al. 2020; ANCE, Xiong et al. 2021): for each query
    * vector, the k most-similar corpus vectors carrying a DIFFERENT
    * label. Those near-miss impostors are the negatives that actually
    * move a dual encoder; random negatives are trivially separable.
    *
    * Scale shape: identical to [[bruteForceTopK]] — queries broadcast,
    * corpus scanned once, the label-mismatch predicate applied BEFORE
    * the distance kernel (joins on label inequality, so excluded rows
    * never pay the dot product), per-query top-k cut by a
    * WindowGroupLimit rank before the final shuffle. The bucketed ANN
    * indexes (LSH/IVF) apply unchanged as the sub-scan path at 100 TB —
    * mine candidates from buckets, filter labels, rerank exactly.
    * Portability: the cosine is rounded to 9 BEFORE ranking (the
    * hubness discipline) so a last-ULP libm divergence cannot flip a
    * near-tie rank between engines; ties break on neighbor id.
    */
  def hardNegatives(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = emb
      .select(col("vec_id").as("negative_id"), col("embedding").as("vc"), col("label").as("negative_label"))
      .withColumn("nc", VectorMath.norm(col("vc")))
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("vq"), col("label").as("query_label"))
      .withColumn("nq", VectorMath.norm(col("vq")))
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("__cos").desc, col("negative_id"))
    c.join(
        broadcast(q),
        col("query_id") =!= col("negative_id") && col("negative_label") =!= col("query_label")
      )
      .withColumn("__cos", round(VectorMath.cosine(col("vq"), col("vc"), col("nq"), col("nc")), 9))
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("query_label"),
        col("rank").cast("long").as("rank"),
        col("negative_id"),
        col("negative_label"),
        round(col("__cos"), 6).as("cosine")
      )
  }

  /** Lloyd k-means over the embedding corpus — the clustering primitive
    * under corpus cartography, IVF index builds, and SemDeDup-style
    * semantic dedup. A FIXED number of iterations from a deterministic
    * seed keeps the whole trajectory engine-reproducible: init is the
    * md5-ranked sample ivfTopK already uses, assignment breaks distance
    * ties on the lower centroid id, and centroid updates are per-
    * dimension exact-decimal means — so every iteration's centroids
    * (and hence the final assignment) are bit-identical in both
    * engines.
    *
    * Scale shape: per iteration the corpus is SCANNED once and never
    * shuffled — assignment is a codegen'd projection against k literal
    * centroid vectors, and the update is a partial aggregation that
    * collapses to k·dim rows per task before the (k·dim)-key exchange.
    * The driver materializes k·dim doubles per round (the Lloyd
    * broadcast-update shape; same index-scale collect ivfTopK does).
    * Distance uses d² = v·v − 2·v·c + c·c so the per-row work is two
    * cached dot products per centroid.
    */
  /** (squared-distance, cid) argmin struct against literal centroids —
    * d² = v·v − 2·v·c + c·c with every dot product (and the driver-side
    * c·c fold) accumulating left-to-right like list_dot_product, ties
    * to the lower cid (least-struct order).
    */
  private def centroidStructs(v: Column, cents: Seq[(Int, Seq[Double])]): Seq[Column] =
    cents.map { case (cid, cv) =>
      val cc = cv.foldLeft(0.0)((acc, x) => acc + x * x)
      struct(
        (VectorMath.dot(v, v) - lit(2.0) * VectorMath.dot(v, typedlit(cv)) + lit(cc)).as("d"),
        lit(cid).as("cid")
      )
    }

  private def kmeansAssignStruct(v: Column, cents: Seq[(Int, Seq[Double])]): Column = {
    val structs = centroidStructs(v, cents)
    if (structs.size == 1) structs.head else least(structs: _*)
  }

  /** The Lloyd trajectory itself: returns the centroids after `iters`
    * fixed iterations from the md5-ranked deterministic init. Each
    * round is one corpus scan (assignment = literal-centroid
    * projection, update = k·dim-group partial aggregation) plus a
    * k·dim-row driver collect — the standard broadcast-update shape.
    *
    * Memoized per (session, input-plan semantic hash, k, iters): the
    * registry has SEVEN consumers of the same trajectory (kmeans /
    * outliers / silhouette / topics / nmi / ivf_kmeans / db_index),
    * and a real pipeline trains the cartography once. The cached
    * value is k·dim driver doubles — no executor-state lifecycle —
    * and the semantic hash covers LocalRelation data, so spec-local
    * inputs never collide; dead-session keys evict on access (the
    * minedJaccardFor discipline).
    */
  private val kmCentCache = scala.collection.concurrent
    .TrieMap[(SparkSession, Int, Int, Int), Seq[(Int, Seq[Double])]]()
  private val kmCentLock = new Object

  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    kmCentCache.keys.foreach { kk =>
      if (kk._1.sparkContext.isStopped) kmCentCache.remove(kk): Unit
    }
    val key = (emb.sparkSession, emb.queryExecution.analyzed.semanticHash(), k, iters)
    kmCentCache.getOrElse(
      key,
      kmCentLock.synchronized {
        kmCentCache.getOrElseUpdate(key, kmeansCentroidsUncached(emb, k, iters))
      }
    )
  }

  private def kmeansCentroidsUncached(emb: DataFrame, k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    val base = emb.select(col("vec_id"), col("embedding").as("v"))
    var cents: Seq[(Int, Seq[Double])] = emb
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .select(expr("transform(embedding, x -> cast(x as double))"))
      .collect()
      .toSeq
      .map(_.getSeq[Double](0))
      .zipWithIndex
      .map { case (v, i) => (i, v) }

    base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 1 to iters) {
        cents = base
          .withColumn("cid", kmeansAssignStruct(col("v"), cents).getField("cid"))
          .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy(col("cid"), col("dim"))
          .agg((sum(col("x").cast("double").cast(dec)).cast("double") / count(lit(1))).as("m"))
          .collect()
          .toSeq
          .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
          .groupBy(_._1)
          .toSeq
          .map { case (cid, rows) => (cid, rows.sortBy(_._2).map(_._3)) }
          .sortBy(_._1)
      }
    } finally base.unpersist()
    cents
  }

  def kmeansAssign(emb: DataFrame, k: Int = 8, iters: Int = 3): DataFrame = {
    val cents = kmeansCentroids(emb, k, iters)
    val fin = kmeansAssignStruct(col("v"), cents)
    emb
      .select(col("vec_id"), col("embedding").as("v"))
      .select(
        col("vec_id"),
        fin.getField("cid").cast("long").as("cluster"),
        round(fin.getField("d"), 6).as("dist2")
      )
  }

  // ---------------------------------------------------------------------
  // Fixed driver queries
  // ---------------------------------------------------------------------

  val QueryCount = 10
  val TopK = 5

  /** Memoized exact ground truth per (SparkSession, dir) — the
    * [[Dedup.minedJaccardFor]] discipline: the brute-force ranking is
    * consumed by the ann_bruteforce report AND all three recall
    * curves, and an eval suite computes its ground truth once. The
    * checkpointed relation is queries×k rows (driver-size); entries of
    * stopped contexts are evicted on access.
    */
  private val bfCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  private val bfLock = new Object

  private def bruteForceFor(spark: SparkSession, dir: String): DataFrame = {
    bfCache.keys.foreach { k =>
      if (k._1.sparkContext.isStopped) bfCache.remove(k): Unit
    }
    val key = (spark, Tables.canonDir(dir))
    bfCache.getOrElse(
      key,
      bfLock.synchronized {
        bfCache.getOrElseUpdate(
          key, {
            val emb = Tables.embeddings(spark, dir)
            bruteForceTopK(emb, emb.filter(col("vec_id") < QueryCount), TopK)
              .localCheckpoint()
          }
        )
      }
    )
  }

  def annBruteforce(spark: SparkSession, dir: String): DataFrame =
    bruteForceFor(spark, dir).orderBy(col("query_id"), col("rank"))

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

  /** Filtered vector search — top-k among neighbors sharing the
    * QUERY's label (the vector-database "metadata filter" feature:
    * per-request predicate + similarity in one pass). The label
    * equality joins BEFORE any dot product evaluates, so the distance
    * kernel only runs on predicate survivors; everything else is the
    * broadcast-queries / one-corpus-scan baseline shape. On the LSH
    * index path the same predicate composes as a post-probe filter.
    */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("vc"), col("label").as("__lc"))
      .withColumn("nc", VectorMath.norm(col("vc")))
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("vq"), col("label"))
      .withColumn("nq", VectorMath.norm(col("vq")))
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(
      broadcast(q),
      col("query_id") =!= col("neighbor_id") && col("__lc") === col("label")
    )
      .withColumn("cosine", VectorMath.cosine(col("vq"), col("vc"), col("nq"), col("nc")))
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        col("label"),
        round(col("cosine"), 6).as("cosine")
      )
  }

  def annFiltered(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    filteredTopK(emb, emb.filter(col("vec_id") < QueryCount), TopK)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Oracle: the brute-force cosine scan with the label predicate in
    * the join, identical rank tie-break.
    */
  val annFilteredSql: String =
    s"""WITH n AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
       |         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.label AS label,
       |         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
       |  FROM n q JOIN n c ON q.vec_id < $QueryCount AND q.vec_id <> c.vec_id
       |                   AND c.label = q.label),
       |ranked AS (
       |  SELECT query_id, neighbor_id, label, cos_raw,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, label, ROUND(cos_raw, 6) AS cosine
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  def annMips(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    mipsTopK(emb, emb.filter(col("vec_id") < QueryCount), TopK)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Oracle: identical double dot products (sequential per-row fold on
    * both sides), identical rank tie-break.
    */
  val annMipsSql: String =
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         list_dot_product(q.v, c.v) AS score_raw
       |  FROM n q JOIN n c ON q.vec_id < $QueryCount AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, score_raw,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score_raw DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, ROUND(score_raw, 6) AS score
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  /** Bucket id over norm-AUGMENTED vectors: corpus rows carry the extra
    * coordinate aug = sqrt(M² − ‖x‖²) (queries carry 0), so the
    * (dim+1)-coordinate hyperplane signs bucket by MIPS-compatible
    * angles — the Bachrach/Shrivastava-Li reduction the ann_mips
    * docstring promises, wired into the same plane machinery.
    */
  private def augBucket(v: Column, aug: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, i) =>
        when(
          VectorMath.dot(v, typedlit(p.init)) + aug * lit(p.last) > 0.0,
          lit(1L << i)
        ).otherwise(lit(0L))
      }
      .reduce(_ bitwiseOR _)

  /** Indexed MIPS: norm-augmentation reduces max-inner-product to an
    * angular problem, after which the LSH bucket/probe/rerank shape
    * applies unchanged — candidates from the probed buckets rank by
    * EXACT dot product, so the index only affects recall, never scores.
    * Scale shape identical to lshTopK: corpus bucketed in one map-side
    * pass (M is a 1-row broadcast), queries+probes broadcast, pairs
    * form only inside shared buckets.
    */
  def mipsLshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 4, dim: Int = 64): DataFrame = {
    val hp = hyperplanes(planes, dim + 1)
    val c0 = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("vc"))
      .withColumn("__n2", VectorMath.dot(col("vc"), col("vc")))
    val mrow = c0.agg(max(sqrt(col("__n2"))).as("__M"))
    val c = c0
      .crossJoin(broadcast(mrow))
      .withColumn("__aug", sqrt(greatest(col("__M") * col("__M") - col("__n2"), lit(0.0))))
      .withColumn("bucket", augBucket(col("vc"), col("__aug"), hp))
    val q0 = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("vq"))
      .withColumn("__b0", augBucket(col("vq"), lit(0.0), hp))
    val probes = col("__b0") +: (0 until planes).map(p => col("__b0").bitwiseXOR(lit(1L << p)))
    val q = q0.select(col("query_id"), col("vq"), explode(array(probes: _*)).as("bucket"))
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", VectorMath.dot(col("vq"), col("vc")))
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        round(col("score"), 6).as("score")
      )
  }

  def annMipsLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    mipsLshTopK(emb, emb.filter(col("vec_id") < QueryCount), TopK)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Oracle: identical augmented-plane literals, identical aug chain
    * (MAX norm → SQRT(GREATEST(M²−‖x‖², 0))), identical probe set and
    * exact-dot rerank.
    */
  val annMipsLshSql: String = {
    val planes = 4
    val hp = hyperplanes(planes, 65)
    def bucketExpr(v: String, aug: String): String =
      hp.zipWithIndex
        .map { case (p, i) =>
          val prefix = p.init.mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product($v, $prefix) + $aug * ${p.last} > 0.0 THEN ${1L << i} ELSE 0 END)"
        }
        .mkString("(", " + ", ")") // bits are disjoint: + == OR
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS n2
       |  FROM embeddings),
       |mm AS (SELECT MAX(SQRT(n2)) AS m FROM n),
       |c AS (
       |  SELECT vec_id AS neighbor_id, v,
       |    ${bucketExpr("v", "SQRT(GREATEST(mm.m * mm.m - n2, 0.0))")} AS bucket
       |  FROM n CROSS JOIN mm),
       |q0 AS (SELECT vec_id AS query_id, v AS vq, ${bucketExpr("v", "0.0")} AS b0
       |       FROM n WHERE vec_id < $QueryCount),
       |q AS (SELECT query_id, vq,
       |        UNNEST([b0${(0 until planes).map(p => s", xor(b0, ${1L << p})").mkString}]) AS bucket
       |      FROM q0),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id,
       |         list_dot_product(q.vq, c.v) AS score_raw
       |  FROM q JOIN c ON q.bucket = c.bucket AND q.query_id <> c.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, score_raw,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score_raw DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, ROUND(score_raw, 6) AS score
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin
  }

  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // planes sized for the testdata corpus density (2^4 buckets);
    // larger corpora raise planes to keep per-bucket candidate counts flat
    lshTopK(emb, emb.filter(col("vec_id") < QueryCount), TopK, planes = 4)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Fixed radius-retrieval threshold (≈ the q99 of the query-corpus
    * cosine distribution at the test scale factors, so hits exist but
    * stay data-dependent).
    */
  val RadiusTau = 0.25

  def annRadius(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    lshRadius(emb, emb.filter(col("vec_id") < QueryCount), RadiusTau, planes = 4)
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  /** Radius oracle: the annLshSql candidate CTEs with the threshold cut
    * on the RAW cosine (the value Spark filters) and a distinct over
    * the rounded survivors.
    */
  val annRadiusSql: String = {
    val planes = 4
    val hp = hyperplanes(planes, 64)
    def bucketExpr(v: String): String =
      hp.zipWithIndex
        .map { case (p, i) =>
          val lit = p.mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product($v, $lit) > 0.0 THEN ${1L << i} ELSE 0 END)"
        }
        .mkString("(", " + ", ")")
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |c AS (SELECT vec_id AS neighbor_id, v, nrm, ${bucketExpr("v")} AS bucket FROM n),
       |q0 AS (SELECT vec_id AS query_id, v AS vq, nrm AS nq, ${bucketExpr("v")} AS b0
       |       FROM n WHERE vec_id < $QueryCount),
       |q AS (SELECT query_id, vq, nq,
       |        UNNEST([b0${(0 until planes).map(p => s", xor(b0, ${1L << p})").mkString}]) AS bucket
       |      FROM q0),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id,
       |         list_dot_product(q.vq, c.v) / (q.nq * c.nrm) AS cos_raw
       |  FROM q JOIN c ON q.bucket = c.bucket AND q.query_id <> c.neighbor_id)
       |SELECT DISTINCT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine
       |FROM scored
       |WHERE cos_raw >= $RadiusTau
       |ORDER BY query_id, neighbor_id""".stripMargin
  }

  /** LSH oracle: the hyperplanes are driver-side constants, so the SQL
    * simply inlines them (shortest-repr double literals round-trip to
    * the identical binary64 in both parsers); bucket bits, the 1-bit
    * probe fan-out, and the cosine ranking mirror lshTopK. Probe
    * buckets are pairwise distinct, so no candidate dedup is needed on
    * either side.
    */
  val annLshSql: String = {
    val planes = 4
    val hp = hyperplanes(planes, 64)
    def bucketExpr(v: String): String =
      hp.zipWithIndex
        .map { case (p, i) =>
          val lit = p.mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product($v, $lit) > 0.0 THEN ${1L << i} ELSE 0 END)"
        }
        .mkString("(", " + ", ")") // bits are disjoint: + == OR
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |c AS (SELECT vec_id AS neighbor_id, v, nrm, ${bucketExpr("v")} AS bucket FROM n),
       |q0 AS (SELECT vec_id AS query_id, v AS vq, nrm AS nq, ${bucketExpr("v")} AS b0
       |       FROM n WHERE vec_id < $QueryCount),
       |q AS (SELECT query_id, vq, nq,
       |        UNNEST([b0${(0 until planes).map(p => s", xor(b0, ${1L << p})").mkString}]) AS bucket
       |      FROM q0),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id,
       |         list_dot_product(q.vq, c.v) / (q.nq * c.nrm) AS cos_raw
       |  FROM q JOIN c ON q.bucket = c.bucket AND q.query_id <> c.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_raw,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, ROUND(cos_raw, 6) AS cosine
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    ivfTopK(emb, emb.filter(col("vec_id") < QueryCount), TopK)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF oracle: rebuilds the same index the operator builds — centroid
    * sample ranked by md5 of the id string (engine-portable), argmax
    * centroid assignment with the (sim, cid) tie order of
    * greatest-struct, nProbe=4 query probes, cosine top-k.
    */
  val annIvfSql: String = {
    val nCentroids = 16
    val nProbe = 4
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |cent AS (
       |  SELECT v AS cv,
       |         ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
       |  FROM (SELECT * FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCentroids) s),
       |casg AS (
       |  SELECT neighbor_id, v, nrm, cid FROM (
       |    SELECT n.vec_id AS neighbor_id, n.v, n.nrm, cent.cid,
       |           ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |                              ORDER BY list_dot_product(n.v, cent.cv) DESC, cent.cid DESC) AS rn
       |    FROM n CROSS JOIN cent) a WHERE rn = 1),
       |qasg AS (
       |  SELECT query_id, vq, nq, cid FROM (
       |    SELECT n.vec_id AS query_id, n.v AS vq, n.nrm AS nq, cent.cid,
       |           ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |                              ORDER BY list_dot_product(n.v, cent.cv) DESC, cent.cid DESC) AS rn
       |    FROM n CROSS JOIN cent WHERE n.vec_id < $QueryCount) a WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id,
       |         list_dot_product(q.vq, c.v) / (q.nq * c.nrm) AS cos_raw
       |  FROM qasg q JOIN casg c ON q.cid = c.cid AND q.query_id <> c.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_raw,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, ROUND(cos_raw, 6) AS cosine
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin
  }

  val KmeansK = 8
  val KmeansIters = 3
  val KmeansDim = 64

  def embedKmeans(spark: SparkSession, dir: String): DataFrame =
    kmeansAssign(Tables.embeddings(spark, dir), KmeansK, KmeansIters)

  /** K-means trajectory as reusable oracle CTEs — md5-ranked init,
    * per-iteration argmin assignment (distance then cid, exactly the
    * least-struct order), per-dimension DECIMAL-mean centroid update
    * rebuilt as an ordered list, and the final assignment `kasg`.
    * Every double on the trajectory is identical across engines.
    */
  private[operators] val KmeansCtes: String = {
    def distExpr(v: String, c: String) =
      s"list_dot_product($v, $v) - 2.0 * list_dot_product($v, $c) + list_dot_product($c, $c)"
    val iterCtes = (1 to KmeansIters).map { i =>
      val prev = s"cent${i - 1}"
      s"""asg$i AS (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT n.vec_id, n.v, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
         |                         ORDER BY ${distExpr("n.v", "c.cv")}, c.cid) AS rn
         |    FROM n CROSS JOIN $prev c) a
         |  WHERE rn = 1),
         |cent$i AS (
         |  SELECT cid, list(m ORDER BY dim) AS cv FROM (
         |    SELECT cid, g.dim AS dim,
         |      CAST(SUM(CAST(v[CAST(g.dim AS INT)] AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS m
         |    FROM asg$i, generate_series(1, $KmeansDim) AS g(dim)
         |    GROUP BY 1, 2) t
         |  GROUP BY cid)""".stripMargin
    }
    s"""n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent0 AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
       |         v AS cv
       |  FROM (SELECT * FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $KmeansK) s),
       |${iterCtes.mkString(",\n")},
       |kasg AS (
       |  SELECT vec_id, cid, d FROM (
       |    SELECT n.vec_id, c.cid, ${distExpr("n.v", "c.cv")} AS d,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |                         ORDER BY ${distExpr("n.v", "c.cv")}, c.cid) AS rn
       |    FROM n CROSS JOIN cent$KmeansIters c) a
       |  WHERE rn = 1)""".stripMargin
  }

  val embedKmeansSql: String =
    s"""WITH $KmeansCtes
       |SELECT vec_id, CAST(cid AS BIGINT) AS cluster, ROUND(d, 6) AS dist2
       |FROM kasg
       |ORDER BY vec_id""".stripMargin

  /** Davies–Bouldin index over the k-means cells (Davies & Bouldin,
    * IEEE TPAMI 1979 — the third internal-validation lens beside
    * [[embedSilhouette]] (per-point separation) and [[clusterNmi]]
    * (external labels): per cluster, how does within-cluster scatter
    * compare against the gap to the MOST CONFUSABLE other cluster?
    * R_i = max_{j≠i} (S_i+S_j)/M_ij, DB = mean R_i — lower is better;
    * unlike silhouette it needs only k² centroid distances, so it is
    * THE cheap k-selection curve a pipeline sweeps before committing
    * a cartography run). Emits the per-cluster rows (n, S_i, R_i —
    * which other cluster crowds you) plus the one DB number.
    *
    * Scale shape: S_i is a k-row aggregate over the assignment
    * relation (the [[embedOutliers]] shape — corpus scanned once by
    * the shared Lloyd trajectory, never reshuffled); M_ij comes from
    * the k·dim DRIVER-side centroids with the same left-to-right dot
    * fold both engines use, shipped as a k²-row literal; everything
    * past the assignment is k-grain. Portability: member distances
    * enter as the assignment's round-6 dist2, √ rounds at 9 before
    * the DECIMAL sum, ratios round at 9 before the max, S/R at 6 and
    * DB at 6 at the end.
    */
  def dbIndex(emb: DataFrame, k: Int = KmeansK, iters: Int = KmeansIters): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    val cents = kmeansCentroids(emb, k, iters)
    def dotLR(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val mRows: Seq[(Long, Long, Double)] = for {
      (i, ci) <- cents
      (j, cj) <- cents if j != i
    } yield (
      i.toLong,
      j.toLong,
      math.sqrt(math.max(dotLR(ci, ci) - 2.0 * dotLR(ci, cj) + dotLR(cj, cj), 0.0))
    )
    val mDf = emb.sparkSession
      .range(1)
      .select(explode(typedlit(mRows)).as("p"))
      .select(col("p._1").as("__i"), col("p._2").as("__j"), col("p._3").as("__mij"))
    // assign against the SAME centroid set (one Lloyd trajectory, not
    // a second run through kmeansAssign)
    val fin = kmeansAssignStruct(col("v"), cents)
    val s = emb
      .select(col("vec_id"), col("embedding").as("v"))
      .select(
        fin.getField("cid").cast("long").as("cluster"),
        round(fin.getField("d"), 6).as("dist2")
      )
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n"),
        (sum(round(sqrt(col("dist2")), 9).cast(dec)).cast("double") / count(lit(1))).as("__si")
      )
    val r = mDf
      .join(s.select(col("cluster").as("__i"), col("__si").as("__sa")), Seq("__i"))
      .join(s.select(col("cluster").as("__j"), col("__si").as("__sb")), Seq("__j"))
      .groupBy(col("__i").as("cluster"))
      .agg(max(round((col("__sa") + col("__sb")) / col("__mij"), 9)).as("__r"))
    val db = r.agg(
      round(sum(col("__r").cast(dec)).cast("double") / count(lit(1)), 6).as("db_index")
    )
    s.join(r, Seq("cluster"))
      .crossJoin(broadcast(db))
      .select(
        col("cluster"),
        col("n"),
        round(col("__si"), 6).as("s_intra"),
        round(col("__r"), 6).as("r"),
        col("db_index")
      )
  }

  def clusterDbIndex(spark: SparkSession, dir: String): DataFrame =
    dbIndex(Tables.embeddings(spark, dir)).orderBy(col("cluster"))

  /** DB oracle: the proven k-means trajectory CTEs supply kasg and
    * cent3; identical √/ratio rounding and the same i-then-j sum.
    */
  val clusterDbIndexSql: String =
    s"""WITH $KmeansCtes,
       |s AS (
       |  SELECT cid, COUNT(*) AS n,
       |    CAST(SUM(CAST(ROUND(SQRT(ROUND(d, 6)), 9) AS DECIMAL(27,10))) AS DOUBLE)
       |      / COUNT(*) AS si
       |  FROM kasg GROUP BY cid),
       |m AS (
       |  SELECT a.cid AS i, b.cid AS j,
       |    SQRT(GREATEST(list_dot_product(a.cv, a.cv)
       |      - 2.0 * list_dot_product(a.cv, b.cv)
       |      + list_dot_product(b.cv, b.cv), 0.0)) AS mij
       |  FROM cent$KmeansIters a JOIN cent$KmeansIters b ON a.cid <> b.cid),
       |r AS (
       |  SELECT m.i AS cluster, MAX(ROUND((sa.si + sb.si) / m.mij, 9)) AS r
       |  FROM m JOIN s sa ON sa.cid = m.i JOIN s sb ON sb.cid = m.j
       |  GROUP BY 1),
       |db AS (
       |  SELECT ROUND(CAST(SUM(CAST(r AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*), 6) AS db_index
       |  FROM r)
       |SELECT CAST(s.cid AS BIGINT) AS cluster, s.n, ROUND(s.si, 6) AS s_intra,
       |  ROUND(r.r, 6) AS r, db.db_index
       |FROM s JOIN r ON r.cluster = s.cid CROSS JOIN db
       |ORDER BY cluster""".stripMargin

  /** Embedding-space outlier flags — the prototypicality gate that
    * prunes corrupt or off-manifold embeddings before they poison
    * nearest-neighbor mining: each vector's (already-deterministic)
    * squared distance to its k-means centroid is z-scored against its
    * OWN cluster's distance distribution, and vectors beyond
    * mean + 2·std are flagged.
    *
    * Scale shape: the cluster stats are a k-row aggregate over the
    * assignment relation (DECIMAL sums → order-independent), broadcast
    * back onto the assignment — the corpus is never reshuffled and the
    * flag is a map-side projection. Portability: stats run on the
    * round-6 distances the assignment already emits; std keeps round-9.
    */
  def embedOutliers(emb: DataFrame, k: Int = KmeansK, iters: Int = KmeansIters): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    val asg = kmeansAssign(emb, k, iters)
    val stats = asg
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("dist2").cast(dec)).as("s1"),
        sum((col("dist2") * col("dist2")).cast(dec)).as("s2")
      )
      .select(
        col("cluster"),
        col("n"),
        (col("s1").cast("double") / col("n")).as("__m1"),
        (col("s2").cast("double") / col("n")).as("__m2")
      )
      .select(
        col("cluster"),
        col("n"),
        col("__m1"),
        round(sqrt(greatest(col("__m2") - col("__m1") * col("__m1"), lit(0.0))), 9).as("__std")
      )
    asg
      .join(broadcast(stats), Seq("cluster"))
      .select(
        col("vec_id"),
        col("cluster"),
        col("dist2"),
        round((col("dist2") - col("__m1")) / nullif(col("__std"), lit(0.0)), 6).as("z"),
        (col("dist2") > col("__m1") + lit(2.0) * col("__std")).as("outlier")
      )
  }

  def embedOutliersQ(spark: SparkSession, dir: String): DataFrame =
    embedOutliers(Tables.embeddings(spark, dir))

  /** Oracle: the shared trajectory's final assignment with distances
    * rounded to 6 FIRST (the values the Spark assignment emits), then
    * identical per-cluster moment stats and the same z / flag math.
    */
  val embedOutliersSql: String =
    s"""WITH $KmeansCtes,
       |a AS (
       |  SELECT vec_id, CAST(cid AS BIGINT) AS cluster, ROUND(d, 6) AS dist2 FROM kasg),
       |st AS (
       |  SELECT cluster, COUNT(*) AS n,
       |    CAST(SUM(CAST(dist2 AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS m1,
       |    CAST(SUM(CAST(dist2 * dist2 AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS m2
       |  FROM a GROUP BY cluster),
       |stx AS (
       |  SELECT cluster, m1,
       |    ROUND(SQRT(GREATEST(m2 - m1 * m1, 0.0)), 9) AS sd
       |  FROM st)
       |SELECT a.vec_id, a.cluster, a.dist2,
       |  ROUND((a.dist2 - s.m1) / NULLIF(s.sd, 0.0), 6) AS z,
       |  (a.dist2 > s.m1 + 2.0 * s.sd) AS outlier
       |FROM a JOIN stx s ON s.cluster = a.cluster
       |ORDER BY a.vec_id""".stripMargin

  /** Lightweight-coreset sensitivity sampling over the shared k-means
    * trajectory (Bachem, Lucic & Krause, "Scalable k-means clustering
    * via lightweight coresets", KDD 2018): sampling probability
    * q(x) = ½·1/n + ½·d²(x)/Σd² with d² the squared distance to the
    * assigned centroid, importance weight w(x) = 1/(m·q(x)) — the
    * distance-biased subsample that preserves clustering cost, the
    * standard corpus-subselection step before an expensive training
    * pass. Emits the m HIGHEST-sensitivity points (deterministic:
    * round-9 q, vec_id tie-break) with their weights.
    *
    * Scale shape: the (n, Σd²) total is a broadcast 1-row relation;
    * q/w are a map-side projection over the assignment; selection is
    * a global top-m. The corpus is never reshuffled beyond the
    * trajectory's own scans.
    */
  def sampleCoreset(
    emb: DataFrame,
    m: Int = 64,
    k: Int = KmeansK,
    iters: Int = KmeansIters
  ): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    val asg = kmeansAssign(emb, k, iters)
    val tot = asg.agg(
      count(lit(1)).as("__n"),
      sum(col("dist2").cast(dec)).cast("double").as("__sd")
    )
    asg
      .crossJoin(broadcast(tot))
      .select(
        col("vec_id"),
        col("cluster"),
        col("dist2"),
        round(lit(0.5) / col("__n") + lit(0.5) * col("dist2") / col("__sd"), 9).as("q")
      )
      .withColumn("w", round(lit(1.0) / (lit(m) * col("q")), 6))
      .orderBy(col("q").desc, col("vec_id"))
      .limit(m)
  }

  // ---------------------------------------------------------------------
  // Farthest-point (k-center) diversity sampling
  // ---------------------------------------------------------------------

  val KcenterK = 8

  /** Farthest-point / greedy k-center sampling (Gonzalez 1985; the
    * 2-approximation to the k-center cover) — the DIVERSITY-first
    * curation sampler beside [[sampleCoreset]]'s importance sampler:
    * seed at a hash-pinned point, then repeatedly add the point
    * FARTHEST from everything selected so far. The emitted `dist2`
    * column is the k-center radius curve — the standard "how much
    * diversity does the next pick buy" acceptance plot.
    *
    * Scale shape: the Lloyd shape exactly — each of the k−1 rounds is
    * ONE corpus scan against ≤k LITERAL selected vectors (broadcast by
    * construction, no join) with a TakeOrderedAndProject top-1; the
    * corpus never shuffles. Portability: per-selected distances round
    * to 9 BEFORE the min/argmax (the kmeans ranking discipline), the
    * argmax tie-breaks on vec_id, and the oracle replays the identical
    * trajectory relationally (MATERIALIZED per-round picks).
    */
  /** Above this k the greedy loop stops embedding every selected
    * vector as plan literals (plan size O(k²·d)) and switches to a
    * broadcast selected-set relation — plan size O(k) (only the id
    * skip-list grows), values identical (same round-9 per-selected
    * distances, same min, same argmax tie-break).
    */
  val KcenterLiteralMax = 16

  def sampleKcenter(
    emb: DataFrame,
    k: Int = KcenterK,
    literalMax: Int = KcenterLiteralMax
  ): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = emb.sparkSession
    import spark.implicits._
    val seedOpt = emb
      .select(col("vec_id"), col("embedding"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(1)
      .collect()
      .headOption
    var selected = seedOpt.toVector.map(s => (s.getLong(0), s.getSeq[Float](1)))
    var out = seedOpt.toVector.map(s => (1L, s.getLong(0), Option.empty[Double]))
    var exhausted = selected.isEmpty
    for (r <- 2 to k if !exhausted) {
      val rest = emb.filter(!col("vec_id").isin(selected.map(_._1): _*))
      val bestOpt =
        if (k <= literalMax) {
          val dcols = selected.map { case (_, sv) =>
            val svd = sv.map(_.toDouble)
            val ss = svd.foldLeft(0.0)((a, x) => a + x * x)
            round(
              VectorMath.dot(col("embedding"), col("embedding")) -
                lit(2.0) * VectorMath.dot(col("embedding"), array(svd.map(lit(_)): _*)) +
                lit(ss),
              9
            )
          }
          val dmin = dcols.reduce((a, b) => least(a, b))
          rest
            .select(col("vec_id"), col("embedding"), dmin.as("__dmin"))
            .orderBy(col("__dmin").desc, col("vec_id"))
            .limit(1)
            .collect()
            .headOption
            .map(b => (b.getLong(0), b.getSeq[Float](1), b.getDouble(2)))
        } else {
          val selRel = broadcast(selected.toDF("sel_id", "sel_emb"))
          rest
            .crossJoin(selRel)
            .select(
              col("vec_id"),
              round(
                VectorMath.dot(col("embedding"), col("embedding")) -
                  lit(2.0) * VectorMath.dot(col("embedding"), col("sel_emb")) +
                  VectorMath.dot(col("sel_emb"), col("sel_emb")),
                9
              ).as("__d")
            )
            .groupBy(col("vec_id"))
            .agg(min(col("__d")).as("__dmin"))
            .orderBy(col("__dmin").desc, col("vec_id"))
            .limit(1)
            .collect()
            .headOption
            .map { b =>
              val ev = emb
                .filter(col("vec_id") === b.getLong(0))
                .select(col("embedding"))
                .collect()
                .head
                .getSeq[Float](0)
              (b.getLong(0), ev, b.getDouble(1))
            }
        }
      bestOpt match {
        case Some((id, ev, dm)) =>
          selected = selected :+ ((id, ev))
          out = out :+ ((r.toLong, id, Option(dm)))
        case None =>
          exhausted = true
      }
    }
    out.toDF("rank", "vec_id", "dist2")
  }

  def sampleKcenterQ(spark: SparkSession, dir: String): DataFrame =
    sampleKcenter(Tables.embeddings(spark, dir)).orderBy(col("rank"))

  /** Oracle: the identical greedy trajectory replayed relationally —
    * per round, the min of round-9 distances to every prior pick
    * (MATERIALIZED), argmax by (dmin DESC, vec_id).
    */
  val sampleKcenterSql: String = {
    def distExpr(x: String, s: String) =
      s"ROUND(list_dot_product($x, $x) - 2.0 * list_dot_product($x, $s) + list_dot_product($s, $s), 9)"
    val rounds = (2 to KcenterK).map { r =>
      val union = (1 until r).map(i => s"SELECT vec_id, v FROM ks$i").mkString(" UNION ALL ")
      s"""ks$r AS MATERIALIZED (
         |  SELECT vec_id, v, dmin FROM (
         |    SELECT x.vec_id, x.v, MIN(${distExpr("x.v", "s.v")}) AS dmin
         |    FROM kn x CROSS JOIN ($union) s
         |    WHERE x.vec_id NOT IN (SELECT vec_id FROM ($union))
         |    GROUP BY x.vec_id, x.v)
         |  ORDER BY dmin DESC, vec_id LIMIT 1)""".stripMargin
    }
    val finals = Seq(s"SELECT CAST(1 AS BIGINT) AS rank, vec_id, CAST(NULL AS DOUBLE) AS dist2 FROM ks1") ++
      (2 to KcenterK).map(r => s"SELECT CAST($r AS BIGINT) AS rank, vec_id, dmin AS dist2 FROM ks$r")
    s"""WITH kn AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |ks1 AS MATERIALIZED (
       |  SELECT vec_id, v FROM kn
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),
       |${rounds.mkString(",\n")}
       |${finals.mkString("\nUNION ALL\n")}
       |ORDER BY rank""".stripMargin
  }

  def sampleCoresetQ(spark: SparkSession, dir: String): DataFrame =
    sampleCoreset(Tables.embeddings(spark, dir))

  val sampleCoresetSql: String =
    s"""WITH $KmeansCtes,
       |a AS (
       |  SELECT vec_id, CAST(cid AS BIGINT) AS cluster, ROUND(d, 6) AS dist2 FROM kasg),
       |tot AS (
       |  SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(dist2 AS DECIMAL(27,10))) AS DOUBLE) AS sd
       |  FROM a),
       |qs AS (
       |  SELECT vec_id, cluster, dist2,
       |    ROUND(0.5 / n + 0.5 * dist2 / sd, 9) AS q
       |  FROM a, tot)
       |SELECT vec_id, cluster, dist2, q, ROUND(1.0 / (64 * q), 6) AS w
       |FROM qs
       |ORDER BY q DESC, vec_id
       |LIMIT 64""".stripMargin

  /** Simplified (centroid) silhouette per embedding — the standard
    * clustering-quality signal computed WITHOUT pairwise point
    * distances: a = squared distance to the assigned centroid, b =
    * squared distance to the nearest OTHER centroid, s = (b − a) /
    * max(a, b) ∈ [0, 1] here (a is the argmin, so b ≥ a). Near-zero
    * silhouette marks points on cluster boundaries — the vectors an
    * embedding-curation pass re-examines first; the per-cluster mean
    * is the usual "is k right" diagnostic. (The classic full
    * silhouette needs O(n²) pair distances; the centroid form is the
    * scalable standard.)
    *
    * Scale shape: one corpus scan, zero shuffles — all k centroid
    * distances evaluate in ONE codegen'd projection against literal
    * centroid vectors (the kmeansAssign shape), and the two smallest
    * come from sorting the k-element (d, cid) struct array in-row.
    * Portability: raw argmin/next distances feed the ratio, outputs
    * round to 6; the oracle reranks the identical trajectory's
    * distances with the same (d, cid) tie order.
    */
  def embedSilhouette(emb: DataFrame, k: Int = KmeansK, iters: Int = KmeansIters): DataFrame = {
    val cents = kmeansCentroids(emb, k, iters)
    val sorted = array_sort(array(centroidStructs(col("v"), cents): _*))
    emb
      .select(col("vec_id"), col("embedding").as("v"))
      .select(
        col("vec_id"),
        sorted.getItem(0).getField("cid").cast("long").as("cluster"),
        sorted.getItem(0).getField("d").as("__a"),
        sorted.getItem(1).getField("d").as("__b")
      )
      .select(
        col("vec_id"),
        col("cluster"),
        round(col("__a"), 6).as("dist2"),
        round(col("__b"), 6).as("dist2_next"),
        round(
          (col("__b") - col("__a")) / nullif(greatest(col("__a"), col("__b")), lit(0.0)),
          6
        ).as("silhouette")
      )
  }

  def embedSilhouetteQ(spark: SparkSession, dir: String): DataFrame =
    embedSilhouette(Tables.embeddings(spark, dir))

  /** Oracle: the shared trajectory's final centroids, reranked per
    * vector with the identical (d, cid) order; rn=1 is the kasg
    * assignment, rn=2 the nearest-other distance, ratio and rounds as
    * the operator.
    */
  val embedSilhouetteSql: String = {
    def distExpr(v: String, c: String) =
      s"list_dot_product($v, $v) - 2.0 * list_dot_product($v, $c) + list_dot_product($c, $c)"
    s"""WITH $KmeansCtes,
       |two AS (
       |  SELECT vec_id, cid, d, rn FROM (
       |    SELECT n.vec_id, c.cid, ${distExpr("n.v", "c.cv")} AS d,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |                         ORDER BY ${distExpr("n.v", "c.cv")}, c.cid) AS rn
       |    FROM n CROSS JOIN cent$KmeansIters c) a
       |  WHERE rn <= 2)
       |SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
       |  ROUND(a.d, 6) AS dist2, ROUND(b.d, 6) AS dist2_next,
       |  ROUND((b.d - a.d) / NULLIF(GREATEST(a.d, b.d), 0.0), 6) AS silhouette
       |FROM two a JOIN two b ON a.vec_id = b.vec_id AND b.rn = 2
       |WHERE a.rn = 1
       |ORDER BY a.vec_id""".stripMargin
  }

  /** Clustering-vs-labels external validation in ONE row — the eval a
    * pipeline runs before trusting a clustering for curation decisions:
    * normalized mutual information NMI = I(L;C)/√(H(L)·H(C))
    * (Strehl & Ghosh 2002), cluster purity, and the adjusted Rand
    * index (Hubert & Arabie 1985) between the k-means assignment and
    * the ground-truth label column, all derived from the SAME
    * label×cluster contingency table.
    *
    * Scale shape: label rides the assignment projection (no
    * corpus-grain join — the ann_knn_label lesson inverted), so the
    * only shuffle is the (label, cluster)-grain contingency partial
    * agg; margins, entropies and the pair combinatorics all run on
    * that ≤ L·k-row summary with broadcast margins. ARI's C(n,2) sums
    * route through DECIMAL (counts² overflows long at corpus scale).
    * Portability: each ln term is ROUND(·,9) before its DECIMAL sum
    * (the corpus_pmi/ts_mi discipline); ratios form on the raw sums,
    * outputs round to 6. The round-10 driver-red lesson: `mi`,
    * `h_label` and `h_cluster` are exact DECIMAL quantities, so their
    * final 6-round runs IN DECIMAL (BigDecimal HALF_UP and DuckDB's
    * decimal ROUND agree on every exact decimal — no double half-grid
    * to straddle), and every double-quotient output (`nmi`, `purity`,
    * `ari`) carries a `+ 0.0` guard so a tiny-negative round's −0.0
    * canonicalizes to +0.0 in both engines before hashing.
    */
  /** The label×cluster integer contingency table under the shared
    * k-means trajectory — factored out so clusterNmi and the
    * clusterNmiTwins pre-round audit view consume the EXACT same
    * relation.
    */
  private[operators] def nmiContingency(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val cents = kmeansCentroids(emb, k, iters)
    val fin = kmeansAssignStruct(col("v"), cents)
    emb
      .select(col("label"), col("embedding").as("v"))
      .select(col("label"), fin.getField("cid").cast("long").as("cluster"))
      .groupBy(col("label"), col("cluster"))
      .agg(count(lit(1)).as("nij"))
  }

  def clusterNmi(emb: DataFrame, k: Int = KmeansK, iters: Int = KmeansIters): DataFrame =
    clusterNmiWide(emb, k, iters)
      .drop("__nmi_q", "__ari_q", "__mi_q", "__hun_q", "__hvn_q")

  /** [[clusterNmi]] plus the UNROUNDED quotient twins of its
    * double-quantized ratio columns (`__nmi_q`/`__ari_q`) — consumed
    * by the pre-round straddle audit; the public operator drops them.
    */
  private[operators] def clusterNmiWide(
    emb: DataFrame,
    k: Int = KmeansK,
    iters: Int = KmeansIters
  ): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    val cont = nmiContingency(emb, k, iters)
    val tot = cont.agg(
      sum(col("nij")).as("n"),
      countDistinct(col("label")).as("n_labels"),
      countDistinct(col("cluster")).as("n_clusters")
    )
    val labm = cont.groupBy(col("label")).agg(sum(col("nij")).as("ai"))
    val clum = cont
      .groupBy(col("cluster"))
      .agg(sum(col("nij")).as("bj"), max(col("nij")).as("mx"))
    val miRow = cont
      .join(broadcast(labm), Seq("label"))
      .join(broadcast(clum), Seq("cluster"))
      .crossJoin(broadcast(tot.select(col("n"))))
      .agg(
        sum(
          round(
            (col("nij").cast("double") / col("n")) *
              log(
                col("n").cast("double") * col("nij") /
                  (col("ai").cast("double") * col("bj"))
              ),
            9
          ).cast(dec)
        ).as("mi_dec"),
        sum((col("nij") * (col("nij") - 1)).cast(dec)).cast("double").as("sij2")
      )
    val huRow = labm
      .crossJoin(broadcast(tot.select(col("n"))))
      .agg(
        sum(
          round(
            (col("ai").cast("double") / col("n")) * log(col("ai").cast("double") / col("n")),
            9
          ).cast(dec)
        ).as("hun_dec"),
        sum((col("ai") * (col("ai") - 1)).cast(dec)).cast("double").as("sa2")
      )
    val hvRow = clum
      .crossJoin(broadcast(tot.select(col("n"))))
      .agg(
        sum(
          round(
            (col("bj").cast("double") / col("n")) * log(col("bj").cast("double") / col("n")),
            9
          ).cast(dec)
        ).as("hvn_dec"),
        sum((col("bj") * (col("bj") - 1)).cast(dec)).cast("double").as("sb2"),
        sum(col("mx")).as("mxs")
      )
    val sij = col("sij2") / lit(2.0)
    val sa = col("sa2") / lit(2.0)
    val sb = col("sb2") / lit(2.0)
    val t = (col("n") * (col("n") - 1)).cast("double") / lit(2.0)
    val expI = sa * sb / t
    // Final quantization discipline (round-12): no ROUND(double-quotient,
    // n) survives in the projection. `purity` is a pure-integer HALF_UP
    // micro division routed through DECIMAL(38,0) (mxs·2e6 would wrap
    // BIGINT past ~4.6e12 rows — the dedup_substr_impact overflow
    // class). `nmi`/`ari`/`z`-style quotients have irrational (√) or
    // DECIMAL-38-overflowing exact forms (ARI's integer numerator is
    // T2·S2ij ≤ n⁴ — past 38 digits beyond ~1.8e9 vectors), so they
    // quantize by explicit FLOOR(q·1e6 + 0.5)/1e6 — the same IEEE
    // doubles in both engines, zero engine ROUND-mode dependence.
    val nmiq = col("mi_dec").cast("double") /
      nullif(sqrt(-col("hun_dec").cast("double") * -col("hvn_dec").cast("double")), lit(0.0))
    val ariq = (sij - expI) / nullif((sa + sb) / lit(2.0) - expI, lit(0.0))
    miRow
      .crossJoin(huRow)
      .crossJoin(hvRow)
      .crossJoin(tot)
      .select(
        col("n"),
        col("n_labels"),
        col("n_clusters"),
        round(col("mi_dec"), 6).cast("double").as("mi"),
        round(-col("hun_dec"), 6).cast("double").as("h_label"),
        round(-col("hvn_dec"), 6).cast("double").as("h_cluster"),
        (floor(nmiq * lit(1e6) + lit(0.5)) / lit(1e6) + lit(0.0)).as("nmi"),
        (expr("(cast(mxs as decimal(38,0)) * 2000000 + n) div (n * 2)").cast("double") /
          lit(1e6) + lit(0.0)).as("purity"),
        (floor(ariq * lit(1e6) + lit(0.5)) / lit(1e6) + lit(0.0)).as("ari"),
        nmiq.as("__nmi_q"),
        ariq.as("__ari_q"),
        col("mi_dec").cast("double").as("__mi_q"),
        (-col("hun_dec")).cast("double").as("__hun_q"),
        (-col("hvn_dec")).cast("double").as("__hvn_q")
      )
  }

  /** Pre-round twin frame for [[graft.StraddleAudit.auditTwins]]: the
    * raw nmi/ari quotients BEFORE their FLOOR micro quantization, plus
    * (round-13) the DECIMAL entropy intermediates mi_dec/hun_dec/
    * hvn_dec before their ROUND(·,6). The entropy finals round IN
    * DECIMAL — deterministic HALF_UP in both engines even at an exact
    * half — so a flagged straddle there would be benign; registering
    * them anyway completes the audit's coverage of every rounded final
    * in this query. purity keeps no twin — a pure DECIMAL-routed
    * HALF_UP integer division (the tsMkTwins rationale).
    */
  def clusterNmiTwins(spark: SparkSession, dir: String): DataFrame =
    clusterNmiWide(Tables.embeddings(spark, dir))
      .select(
        col("__nmi_q").as("nmi__s6"),
        col("__ari_q").as("ari__s6"),
        col("__mi_q").as("mi__s6"),
        col("__hun_q").as("h_label__s6"),
        col("__hvn_q").as("h_cluster__s6")
      )

  def clusterNmiQ(spark: SparkSession, dir: String): DataFrame =
    clusterNmi(Tables.embeddings(spark, dir))

  /** Oracle: the shared k-means trajectory, label joined back at
    * vec_id grain (value-identical to the engine's carried label),
    * then the identical contingency/margin/entropy/ARI algebra.
    */
  val clusterNmiSql: String =
    s"""WITH $KmeansCtes,
       |al AS (
       |  SELECT e.label, k.cid AS cluster
       |  FROM kasg k JOIN embeddings e ON k.vec_id = e.vec_id),
       |cont AS (
       |  SELECT label, cluster, COUNT(*) AS nij FROM al GROUP BY 1, 2),
       |tot AS (
       |  SELECT SUM(nij) AS n, COUNT(DISTINCT label) AS n_labels,
       |    COUNT(DISTINCT cluster) AS n_clusters
       |  FROM cont),
       |labm AS (SELECT label, SUM(nij) AS ai FROM cont GROUP BY 1),
       |clum AS (SELECT cluster, SUM(nij) AS bj, MAX(nij) AS mx FROM cont GROUP BY 1),
       |mi AS (
       |  SELECT
       |    SUM(CAST(ROUND((CAST(nij AS DOUBLE) / n) *
       |      LN(CAST(n AS DOUBLE) * nij / (CAST(ai AS DOUBLE) * bj)), 9)
       |      AS DECIMAL(27,10))) AS mi_dec,
       |    CAST(SUM(CAST(nij * (nij - 1) AS DECIMAL(27,10))) AS DOUBLE) AS sij2
       |  FROM cont
       |  JOIN labm USING (label) JOIN clum USING (cluster) CROSS JOIN tot),
       |hu AS (
       |  SELECT
       |    SUM(CAST(ROUND((CAST(ai AS DOUBLE) / n) *
       |      LN(CAST(ai AS DOUBLE) / n), 9) AS DECIMAL(27,10))) AS hun_dec,
       |    CAST(SUM(CAST(ai * (ai - 1) AS DECIMAL(27,10))) AS DOUBLE) AS sa2
       |  FROM labm CROSS JOIN tot),
       |hv AS (
       |  SELECT
       |    SUM(CAST(ROUND((CAST(bj AS DOUBLE) / n) *
       |      LN(CAST(bj AS DOUBLE) / n), 9) AS DECIMAL(27,10))) AS hvn_dec,
       |    CAST(SUM(CAST(bj * (bj - 1) AS DECIMAL(27,10))) AS DOUBLE) AS sb2,
       |    SUM(mx) AS mxs
       |  FROM clum CROSS JOIN tot)
       |SELECT CAST(n AS BIGINT) AS n, n_labels, n_clusters,
       |  CAST(ROUND(mi_dec, 6) AS DOUBLE) AS mi,
       |  CAST(ROUND(-hun_dec, 6) AS DOUBLE) AS h_label,
       |  CAST(ROUND(-hvn_dec, 6) AS DOUBLE) AS h_cluster,
       |  FLOOR(CAST(mi_dec AS DOUBLE) /
       |    NULLIF(SQRT(-CAST(hun_dec AS DOUBLE) * -CAST(hvn_dec AS DOUBLE)), 0.0)
       |    * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS nmi,
       |  CAST((CAST(mxs AS HUGEINT) * 2000000 + n) // (n * 2) AS DOUBLE) / 1000000.0
       |    + 0.0 AS purity,
       |  FLOOR((sij2 / 2.0 - (sa2 / 2.0) * (sb2 / 2.0) / (CAST(n * (n - 1) AS DOUBLE) / 2.0)) /
       |    NULLIF((sa2 / 2.0 + sb2 / 2.0) / 2.0 -
       |      (sa2 / 2.0) * (sb2 / 2.0) / (CAST(n * (n - 1) AS DOUBLE) / 2.0), 0.0)
       |    * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS ari
       |FROM mi CROSS JOIN hu CROSS JOIN hv CROSS JOIN tot""".stripMargin

  /** Cluster topic labeling — the BERTopic-style "describe" step after
    * embedding clustering: every k-means cell labeled by its top
    * class-TF-IDF words (count of the word inside the cluster, scaled
    * by ln(1 + K/df) where df is the number of clusters the word
    * appears in). The standard way to turn an opaque embedding
    * clustering into an auditable curation report.
    *
    * Scale shape: assignment is the literal-centroid projection (one
    * corpus scan per Lloyd iteration, corpus never shuffled); the
    * doc→cluster join happens at DOCUMENT granularity before the word
    * explode, so the join never sees word-occurrence scale; word
    * counts partial-aggregate on (cluster, word); df and the score
    * run at vocabulary scale; top-m per cluster is a rank Spark
    * rewrites to WindowGroupLimit. Portability: round-9 on the ln,
    * round-6 on the score.
    */
  def clusterTopics(docs: DataFrame, emb: DataFrame, topM: Int = 5): DataFrame = {
    val asg = kmeansAssign(emb, KmeansK, KmeansIters).select(col("vec_id"), col("cluster"))
    val normSql = "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"
    val dw = docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      // document and assignment relations are both corpus cardinality —
      // merge-hinted to keep the doc-grain join off the broadcast path
      .join(asg.hint("merge"), docs("doc_id") === asg("vec_id"))
      .select(col("cluster"), explode(split(expr(normSql), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val cw = dw.groupBy(col("cluster"), col("word")).agg(count(lit(1)).as("cnt"))
    val df = cw.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val sc = cw
      .join(df, Seq("word"))
      .withColumn(
        "score",
        round(col("cnt") * round(log(lit(1.0) + lit(KmeansK.toDouble) / col("df")), 9), 6)
      )
    val w = Window.partitionBy(col("cluster")).orderBy(col("score").desc, col("word"))
    sc.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topM)
      .select(col("cluster"), col("rk"), col("word"), col("cnt"), col("df"), col("score"))
  }

  def clusterTopicsQ(spark: SparkSession, dir: String): DataFrame =
    clusterTopics(Tables.documents(spark, dir), Tables.embeddings(spark, dir))
      .orderBy(col("cluster"), col("rk"))

  /** Oracle: the shared k-means trajectory CTEs, then the identical
    * doc-granular join → word explode → (cluster, word) counts → df →
    * c-TF-IDF score → per-cluster rank.
    */
  val clusterTopicsSql: String =
    s"""WITH $KmeansCtes,
       |dtext AS (
       |  SELECT k.cid AS cluster, d.text
       |  FROM kasg k JOIN documents d ON d.doc_id = k.vec_id
       |  WHERE d.text IS NOT NULL AND LENGTH(TRIM(d.text)) > 0),
       |dw AS (
       |  SELECT cluster,
       |    UNNEST(string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ')) AS word
       |  FROM dtext),
       |cw AS (
       |  SELECT cluster, word, COUNT(*) AS cnt FROM dw WHERE LENGTH(word) > 0 GROUP BY 1, 2),
       |dfreq AS (
       |  SELECT word, COUNT(*) AS df FROM cw GROUP BY 1),
       |sc AS (
       |  SELECT c.cluster, c.word, c.cnt, f.df,
       |    ROUND(c.cnt * ROUND(LN(1 + CAST($KmeansK AS DOUBLE) / f.df), 9), 6) AS score
       |  FROM cw c JOIN dfreq f ON f.word = c.word),
       |ranked AS (
       |  SELECT cluster, word, cnt, df, score,
       |    ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY score DESC, word) AS rk
       |  FROM sc)
       |SELECT CAST(cluster AS BIGINT) AS cluster, CAST(rk AS BIGINT) AS rk, word,
       |  cnt, df, score
       |FROM ranked
       |WHERE rk <= 5
       |ORDER BY cluster, rk""".stripMargin

  // ---------------------------------------------------------------------
  // Product quantization
  // ---------------------------------------------------------------------

  val PqSubspaces = 4
  val PqCentroids = 8
  val PqIters = 2

  /** The [[KmeansCtes]] trajectory generalized to a SLICE of the
    * embedding ([lo, hi], 1-based inclusive) with suffixed CTE names,
    * so several independent sub-quantizers can live in one oracle
    * query. Ends in `kasg$sfx` (vec_id, cid) and `cent$iters$sfx`
    * (cid, cv).
    */
  private[operators] def kmeansCtesSliced(
    sfx: String,
    lo: Int,
    hi: Int,
    k: Int,
    iters: Int
  ): String = {
    def distExpr(v: String, c: String) =
      s"list_dot_product($v, $v) - 2.0 * list_dot_product($v, $c) + list_dot_product($c, $c)"
    val dim = hi - lo + 1
    val iterCtes = (1 to iters).map { i =>
      val prev = s"cent${i - 1}$sfx"
      s"""asg$i$sfx AS (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT n.vec_id, n.v, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
         |                         ORDER BY ${distExpr("n.v", "c.cv")}, c.cid) AS rn
         |    FROM n$sfx n CROSS JOIN $prev c) a
         |  WHERE rn = 1),
         |cent$i$sfx AS (
         |  SELECT cid, list(m ORDER BY dim) AS cv FROM (
         |    SELECT cid, g.dim AS dim,
         |      CAST(SUM(CAST(v[CAST(g.dim AS INT)] AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS m
         |    FROM asg$i$sfx, generate_series(1, $dim) AS g(dim)
         |    GROUP BY 1, 2) t
         |  GROUP BY cid)""".stripMargin
    }
    s"""n$sfx AS (
       |  SELECT vec_id, (CAST(embedding AS DOUBLE[]))[$lo:$hi] AS v FROM embeddings),
       |cent0$sfx AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
       |         v AS cv
       |  FROM (SELECT * FROM n$sfx ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k) s),
       |${iterCtes.mkString(",\n")},
       |kasg$sfx AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT n.vec_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |                         ORDER BY ${distExpr("n.v", "c.cv")}, c.cid) AS rn
       |    FROM n$sfx n CROSS JOIN cent$iters$sfx c) a
       |  WHERE rn = 1)""".stripMargin
  }

  /** All `m` sub-quantizer codebooks trained in ONE Lloyd loop: per
    * iteration the corpus is scanned ONCE — every subspace's argmin
    * assignment is a column of the same codegen'd projection, the
    * exploded (subspace, cid, subdim) means reduce in one partial
    * aggregation, and one m·k·(dim/m)-row collect updates all
    * codebooks — where m independent [[kmeansCentroids]] calls would
    * scan the corpus m times per iteration. Each subspace's
    * trajectory (md5-ranked init rows, least-struct ties, decimal
    * means) is bit-identical to the per-subspace run, so the oracle
    * reproduces it subspace by subspace.
    */
  def pqCodebooks(
    corpus: DataFrame,
    m: Int,
    dim: Int,
    k: Int,
    iters: Int
  ): Seq[(Int, Seq[(Int, Seq[Double])])] = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    val subLen = dim / m
    def sub(c: Column, s: Int): Column = slice(c, s * subLen + 1, subLen)
    // init rows are ranked by vec_id hash only, so every subspace
    // samples the SAME rows — identical to the per-subspace init
    val initRows: Seq[Seq[Double]] = corpus
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .select(expr("transform(embedding, x -> cast(x as double))"))
      .collect()
      .toSeq
      .map(_.getSeq[Double](0))
    var books: Seq[Seq[(Int, Seq[Double])]] = (0 until m).map { s =>
      initRows.zipWithIndex.map { case (v, i) => (i, v.slice(s * subLen, s * subLen + subLen)) }
    }
    // subvectors materialize ONCE per row here (m slices); assignment
    // structs then reference plain columns — inlining the slice into
    // every centroid struct would blow the generated method up m·k·2×
    val base = corpus
      .select(col("vec_id") +: (0 until m).map(s => sub(col("embedding"), s).as(s"v$s")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 1 to iters) {
        val rows = base
          .select((0 until m).map { s =>
            struct(
              kmeansAssignStruct(col(s"v$s"), books(s)).getField("cid").as("cid"),
              col(s"v$s").as("sv")
            ).as(s"p$s")
          }: _*)
          .select(posexplode(array((0 until m).map(s => col(s"p$s")): _*)).as(Seq("s", "p")))
          .select(col("s"), col("p.cid").as("cid"), posexplode(col("p.sv")).as(Seq("subdim", "x")))
          .groupBy(col("s"), col("cid"), col("subdim"))
          .agg((sum(col("x").cast("double").cast(dec)).cast("double") / count(lit(1))).as("mn"))
          .collect()
          .toSeq
          .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
        books = (0 until m).map { s =>
          rows
            .filter(_._1 == s)
            .groupBy(_._2)
            .toSeq
            .map { case (cid, xs) => (cid, xs.sortBy(_._3).map(_._4)) }
            .sortBy(_._1)
        }
      }
    } finally base.unpersist()
    books.zipWithIndex.map { case (b, s) => (s, b) }
  }

  /** Product-quantization ANN (Jégou et al. 2011): the embedding is
    * split into `m` subspaces, each sub-quantized by an independent
    * deterministic k-means codebook; a corpus vector is ENCODED as m
    * small codes (m bytes at k ≤ 256 — a 512× compression of a 64-dim
    * float32 embedding, the index that fits in memory at 10⁹ vectors
    * when raw vectors cannot), and a query ranks candidates by
    * ASYMMETRIC DISTANCE: the sum over subspaces of the exact distance
    * from the query's sub-vector to the corpus code's centroid — one
    * lookup per subspace into the query's m×k distance table, never a
    * full-dimension vector op per candidate.
    *
    * Scale shape: codebooks are m·k·(dim/m) doubles (driver-built like
    * every index here, broadcast as literals); corpus encoding is a
    * codegen'd argmin projection (ONE scan, no shuffle — and at ingest
    * time the codes persist as the index); the query side broadcasts
    * per-query lookup tables, so the ADC scan is one pass over m-byte
    * codes with k·m distance evaluations per QUERY, not per candidate.
    */
  def pqTopK(
    corpus: DataFrame,
    queries: DataFrame,
    k: Int,
    m: Int = PqSubspaces,
    dim: Int = KmeansDim,
    kCent: Int = PqCentroids,
    iters: Int = PqIters,
    precomputedBooks: Option[Seq[(Int, Seq[(Int, Seq[Double])])]] = None
  ): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val subLen = dim / m
    def sub(c: Column, s: Int): Column = slice(c, s * subLen + 1, subLen)
    val books = precomputedBooks.getOrElse(pqCodebooks(corpus, m, dim, kCent, iters))
    // corpus → m argmin codes (pure projection against literal books);
    // subvectors project once per row, then the code structs reference
    // plain columns (slice inlined per centroid would bloat codegen)
    val subCols = (0 until m).map(s => sub(col("embedding"), s).as(s"v$s"))
    val coded = corpus
      .select(col("vec_id").as("neighbor_id") +: subCols: _*)
      .select(
        col("neighbor_id") +:
          books.map { case (s, cents) =>
            kmeansAssignStruct(col(s"v$s"), cents).getField("cid").as(s"c$s")
          }: _*
      )
    // query → per-subspace distance tables (k entries each, evaluated
    // once per query); ADC = Σ_s lut_s[code_s], left-to-right
    val withLuts = queries
      .select(col("vec_id").as("query_id") +: subCols: _*)
      .select(
        col("query_id") +:
          books.map { case (s, cents) =>
            array(cents.map { case (_, cv) =>
              val cc = cv.foldLeft(0.0)((acc, x) => acc + x * x)
              val qs = col(s"v$s")
              VectorMath.dot(qs, qs) - lit(2.0) * VectorMath.dot(qs, typedlit(cv)) + lit(cc)
            }: _*).as(s"lut$s")
          }: _*
      )
    val adist = (0 until m)
      .map(s => element_at(col(s"lut$s"), col(s"c$s").cast("int") + 1))
      .reduce(_ + _)
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("adist"), col("neighbor_id"))
    coded
      .join(broadcast(withLuts), col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        round(col("adist"), 6).as("adist")
      )
  }

  /** Memoized PQ codebooks per (SparkSession, dir) — the index-build
    * (an iterative driver-side trajectory of sliced k-means collects)
    * is paid once; ann_pq and ann_recall_pq both rank against the
    * SAME index, exactly as a production eval would.
    */
  private val pqBookCache = scala.collection.concurrent
    .TrieMap[(SparkSession, String), Seq[(Int, Seq[(Int, Seq[Double])])]]()
  private val pqBookLock = new Object

  private def pqBooksFor(spark: SparkSession, dir: String): Seq[(Int, Seq[(Int, Seq[Double])])] = {
    pqBookCache.keys.foreach { k =>
      if (k._1.sparkContext.isStopped) pqBookCache.remove(k): Unit
    }
    val key = (spark, Tables.canonDir(dir))
    pqBookCache.getOrElse(
      key,
      pqBookLock.synchronized {
        pqBookCache.getOrElseUpdate(
          key,
          pqCodebooks(Tables.embeddings(spark, dir), PqSubspaces, KmeansDim, PqCentroids, PqIters)
        )
      }
    )
  }

  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    pqTopK(
      emb,
      emb.filter(col("vec_id") < QueryCount),
      TopK,
      precomputedBooks = Some(pqBooksFor(spark, dir))
    ).orderBy(col("query_id"), col("rank"))
  }

  /** m independent sliced-kmeans trajectories; corpus codes from
    * kasg_s, ADC summed left-to-right over subspaces like the Spark
    * plan.
    */
  val annPqSql: String = {
    val subLen = KmeansDim / PqSubspaces
    val ctes = (0 until PqSubspaces)
      .map(s => kmeansCtesSliced(s"_s$s", s * subLen + 1, (s + 1) * subLen, PqCentroids, PqIters))
      .mkString(",\n")
    val dists = (0 until PqSubspaces).map { s =>
      s"""(list_dot_product(q.v_s$s, q.v_s$s)
         |   - 2.0 * list_dot_product(q.v_s$s, cb$s.cv)
         |   + list_dot_product(cb$s.cv, cb$s.cv))""".stripMargin
    }
    val qCols = (0 until PqSubspaces).map(s => s"n_s$s.v AS v_s$s").mkString(", ")
    val qJoins = (1 until PqSubspaces)
      .map(s => s"JOIN n_s$s ON n_s$s.vec_id = n_s0.vec_id")
      .mkString("\n       |  ")
    val cJoins = (0 until PqSubspaces)
      .map(s => s"JOIN kasg_s$s k$s ON k$s.vec_id = c.vec_id JOIN cent${PqIters}_s$s cb$s ON cb$s.cid = k$s.cid")
      .mkString("\n       |  ")
    s"""WITH $ctes,
       |q AS (
       |  SELECT n_s0.vec_id AS query_id, $qCols
       |  FROM n_s0 $qJoins
       |  WHERE n_s0.vec_id < $QueryCount),
       |c AS (SELECT vec_id FROM embeddings),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    ${dists.map(d => s"($d)").mkString(" + ")} AS adist
       |  FROM q CROSS JOIN c
       |  $cJoins
       |  WHERE q.query_id <> c.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, ROUND(adist, 6) AS adist
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // IVFADC: coarse IVF cells + PQ asymmetric distance inside them
  // ---------------------------------------------------------------------

  /** IVFADC top-k (Jégou, Douze & Schmid 2011 §IV — the composition
    * their system actually ships, and the canonical billion-scale ANN
    * shape): a coarse inverted-file quantizer restricts each query to
    * `nProbe` of `nCentroids` cells, and candidates inside the probed
    * cells are ranked by the PQ asymmetric distance — [[ivfTopK]]'s
    * candidate pruning under [[pqTopK]]'s compressed scoring, sharing
    * BOTH existing index builds (the hash-ranked coarse centroids and
    * the deterministic sliced-k-means codebooks).
    *
    * Scale shape: the index constants stay driver-sized (nCentroids
    * coarse vectors + m·kCent sub-centroids); the corpus is coded in
    * ONE projection (coarse cell + m PQ codes — at ingest these
    * persist as the index and the raw vectors never rejoin the scan);
    * queries ship as a broadcast (LUT array per subspace, one row per
    * probed cell), so the only join is broadcast-hash on the cell id
    * — cell restriction cuts the scored pairs by ~nProbe/nCentroids
    * versus ann_pq at identical ADC cost per candidate, which is the
    * entire point of the composition. Portability: coarse assignment
    * uses the exact (dot desc, cid desc) struct-greatest ivfTopK
    * pins; ADC sums subspace terms left-to-right like pqTopK; final
    * adist rounds at 6.
    */
  def ivfPqTopK(
    corpus: DataFrame,
    queries: DataFrame,
    k: Int,
    nCentroids: Int = 16,
    nProbe: Int = 4,
    m: Int = PqSubspaces,
    dim: Int = KmeansDim,
    kCent: Int = PqCentroids,
    iters: Int = PqIters,
    precomputedBooks: Option[Seq[(Int, Seq[(Int, Seq[Double])])]] = None
  ): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val subLen = dim / m
    def sub(c: Column, s: Int): Column = slice(c, s * subLen + 1, subLen)
    val books = precomputedBooks.getOrElse(pqCodebooks(corpus, m, dim, kCent, iters))
    val centroids: Array[Seq[Double]] = corpus
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCentroids)
      .select(expr("transform(embedding, x -> cast(x as double))"))
      .collect()
      .map(_.getSeq[Double](0))
    def simStructs(v: Column): Seq[Column] = centroids.zipWithIndex.map { case (cv, i) =>
      struct(VectorMath.dot(v, typedlit(cv)).as("sim"), lit(i).as("cid"))
    }
    val subCols = (0 until m).map(s => sub(col("embedding"), s).as(s"v$s"))
    val coded = corpus
      .select(col("vec_id").as("neighbor_id") +: col("embedding").as("__e") +: subCols: _*)
      .select(
        col("neighbor_id") +:
          greatest(simStructs(col("__e")): _*).getField("cid").as("cid") +:
          books.map { case (s, cents) =>
            kmeansAssignStruct(col(s"v$s"), cents).getField("cid").as(s"c$s")
          }: _*
      )
    val withLuts = queries
      .select(col("vec_id").as("query_id") +: col("embedding").as("__e") +: subCols: _*)
      .select(
        col("query_id") +:
          slice(reverse(array_sort(array(simStructs(col("__e")): _*))), 1, nProbe)
            .getField("cid").as("__cids") +:
          books.map { case (s, cents) =>
            array(cents.map { case (_, cv) =>
              val cc = cv.foldLeft(0.0)((acc, x) => acc + x * x)
              val qs = col(s"v$s")
              VectorMath.dot(qs, qs) - lit(2.0) * VectorMath.dot(qs, typedlit(cv)) + lit(cc)
            }: _*).as(s"lut$s")
          }: _*
      )
      .withColumn("cid", explode(col("__cids")))
      .drop("__cids")
    val adist = (0 until m)
      .map(s => element_at(col(s"lut$s"), col(s"c$s").cast("int") + 1))
      .reduce(_ + _)
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("adist"), col("neighbor_id"))
    coded
      .join(broadcast(withLuts), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        round(col("adist"), 6).as("adist")
      )
  }

  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    ivfPqTopK(
      emb,
      emb.filter(col("vec_id") < QueryCount),
      TopK,
      precomputedBooks = Some(pqBooksFor(spark, dir))
    ).orderBy(col("query_id"), col("rank"))
  }

  /** IVFADC oracle: the coarse cent/casg/qasg CTEs from annIvfSql
    * composed with annPqSql's sliced-kmeans codebook joins — the ADC
    * sum restricted to probed cells.
    */
  val annIvfPqSql: String = {
    val nCentroids = 16
    val nProbe = 4
    val subLen = KmeansDim / PqSubspaces
    val ctes = (0 until PqSubspaces)
      .map(s => kmeansCtesSliced(s"_s$s", s * subLen + 1, (s + 1) * subLen, PqCentroids, PqIters))
      .mkString(",\n")
    val dists = (0 until PqSubspaces).map { s =>
      s"""(list_dot_product(q.v_s$s, q.v_s$s)
         |   - 2.0 * list_dot_product(q.v_s$s, cb$s.cv)
         |   + list_dot_product(cb$s.cv, cb$s.cv))""".stripMargin
    }
    val qCols = (0 until PqSubspaces).map(s => s"n_s$s.v AS v_s$s").mkString(", ")
    val qJoins = (1 until PqSubspaces)
      .map(s => s"JOIN n_s$s ON n_s$s.vec_id = n_s0.vec_id")
      .mkString("\n       |  ")
    val cJoins = (0 until PqSubspaces)
      .map(s =>
        s"JOIN kasg_s$s k$s ON k$s.vec_id = c.neighbor_id JOIN cent${PqIters}_s$s cb$s ON cb$s.cid = k$s.cid"
      )
      .mkString("\n       |  ")
    s"""WITH $ctes,
       |nv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (
       |  SELECT v AS cv,
       |         ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
       |  FROM (SELECT * FROM nv ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCentroids) s),
       |casg AS (
       |  SELECT neighbor_id, cell FROM (
       |    SELECT nv.vec_id AS neighbor_id, cent.cid AS cell,
       |           ROW_NUMBER() OVER (PARTITION BY nv.vec_id
       |                              ORDER BY list_dot_product(nv.v, cent.cv) DESC, cent.cid DESC) AS rn
       |    FROM nv CROSS JOIN cent) a WHERE rn = 1),
       |qasg AS (
       |  SELECT query_id, cell FROM (
       |    SELECT nv.vec_id AS query_id, cent.cid AS cell,
       |           ROW_NUMBER() OVER (PARTITION BY nv.vec_id
       |                              ORDER BY list_dot_product(nv.v, cent.cv) DESC, cent.cid DESC) AS rn
       |    FROM nv CROSS JOIN cent WHERE nv.vec_id < $QueryCount) a WHERE rn <= $nProbe),
       |q AS (
       |  SELECT n_s0.vec_id AS query_id, $qCols
       |  FROM n_s0 $qJoins
       |  WHERE n_s0.vec_id < $QueryCount),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id,
       |    ${dists.map(d => s"($d)").mkString(" + ")} AS adist
       |  FROM q
       |  JOIN qasg ON qasg.query_id = q.query_id
       |  JOIN casg c ON c.cell = qasg.cell AND q.query_id <> c.neighbor_id
       |  $cJoins),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, ROUND(adist, 6) AS adist
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Scalar quantization
  // ---------------------------------------------------------------------

  /** Scalar-quantized ANN — the OTHER classical compression axis to
    * [[pqTopK]]'s vector quantization: every dimension is snapped to
    * one of 256 uniform grid points between the corpus-wide per-dim
    * min and max (int8 codes — an 8× compression of a float64 / 4× of
    * a float32 store), the shortlist is ranked by cosine against the
    * DEQUANTIZED grid points, and the final top-k is an exact rerank
    * of the shortlist against the raw vectors (the standard
    * retrieve-then-rerank contract, so quantization error costs
    * recall only inside the shortlist margin, never ranking error in
    * the emitted rows).
    *
    * Scale shape: the quantizer is 2·dim doubles (one dim-row
    * aggregate, collected like every index constant here and embedded
    * as literals); encoding is a one-pass scan projection (at ingest
    * the codes persist as the index — here the dequantized grid point
    * is fused into the same projection and its norm is stored, the
    * SQ analog of pq's stored codes); the shortlist pass scans codes
    * with the broadcast query set; the rerank joins the raw corpus to
    * the query-cardinality shortlist by a broadcast semi-probe — a
    * candidate point-fetch, not a second full pair product.
    * Portability: grid arithmetic is pinned to one expression order
    * (code = floor((x−mn)/sc + 0.5), dq = mn + sc·code, both engines),
    * so every approx score, the shortlist cut, and the exact rerank
    * see bit-identical doubles.
    */
  def sqTopK(
    corpus: DataFrame,
    queries: DataFrame,
    k: Int,
    dim: Int = KmeansDim,
    shortlistFactor: Int = 4
  ): DataFrame = {
    val statRows = corpus
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect()
    val mn = Array.ofDim[Double](dim)
    val sc = Array.ofDim[Double](dim)
    statRows.foreach { r =>
      val i = r.getInt(0)
      mn(i) = r.getFloat(1).toDouble
      sc(i) = (r.getFloat(2).toDouble - r.getFloat(1).toDouble) / 255.0
    }
    val mnLit = typedlit(mn.toSeq)
    val scLit = typedlit(sc.toSeq)
    def dqElem(x: Column, i: Column): Column = {
      val m = element_at(mnLit, (i + lit(1)).cast("int"))
      val s = element_at(scLit, (i + lit(1)).cast("int"))
      val code = when(s === 0.0, lit(0.0))
        .otherwise(floor((x.cast("double") - m) / s + lit(0.5)))
      m + s * code
    }
    val c = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("vc"))
      .withColumn("dq", transform(col("vc"), (x, i) => dqElem(x, i)))
      .withColumn("ndq", VectorMath.norm(col("dq")))
    val q = prepped(queries, "query_id", "vq", "nq")
    val byApprox = Window.partitionBy(col("query_id")).orderBy(col("approx").desc, col("neighbor_id"))
    val short = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("approx", VectorMath.cosine(col("vq"), col("dq"), col("nq"), col("ndq")))
      .withColumn("__rk", row_number().over(byApprox))
      .filter(col("__rk") <= shortlistFactor * k)
      .select(col("query_id"), col("vq"), col("nq"), col("neighbor_id"))
    // exact rerank: point-fetch the raw candidate vectors
    val cTrue = prepped(corpus, "neighbor_id", "vt", "nt")
    val byExact = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    cTrue
      .join(broadcast(short), Seq("neighbor_id"))
      .withColumn("cosine", VectorMath.cosine(col("vq"), col("vt"), col("nq"), col("nt")))
      .withColumn("rank", row_number().over(byExact))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        round(col("cosine"), 6).as("cosine")
      )
  }

  def annSq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    sqTopK(emb, emb.filter(col("vec_id") < QueryCount), TopK)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-dim min/max grid rebuilt relationally; the same pinned
    * code/dequantize arithmetic, shortlist cut, and exact rerank.
    */
  val annSqSql: String =
    s"""WITH st AS (
       |  SELECT g.dim AS dim,
       |    CAST(MIN(e.embedding[CAST(g.dim AS INT)]) AS DOUBLE) AS mn,
       |    (CAST(MAX(e.embedding[CAST(g.dim AS INT)]) AS DOUBLE)
       |       - CAST(MIN(e.embedding[CAST(g.dim AS INT)]) AS DOUBLE)) / 255.0 AS sc
       |  FROM embeddings e, generate_series(1, $KmeansDim) AS g(dim)
       |  GROUP BY 1),
       |grid AS (
       |  SELECT list(mn ORDER BY dim) AS mnl, list(sc ORDER BY dim) AS scl FROM st),
       |c AS (
       |  SELECT vec_id AS neighbor_id,
       |    list_transform(range(1, $KmeansDim + 1), i ->
       |      grid.mnl[i] + grid.scl[i] *
       |        (CASE WHEN grid.scl[i] = 0.0 THEN 0.0
       |              ELSE FLOOR((CAST(embedding[CAST(i AS INT)] AS DOUBLE) - grid.mnl[i])
       |                         / grid.scl[i] + 0.5) END)) AS dq
       |  FROM embeddings, grid),
       |cn AS (
       |  SELECT neighbor_id, dq, SQRT(list_dot_product(dq, dq)) AS ndq FROM c),
       |q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS vq,
       |    SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nq
       |  FROM embeddings WHERE vec_id < $QueryCount),
       |short AS (
       |  SELECT query_id, vq, nq, neighbor_id FROM (
       |    SELECT q.query_id, q.vq, q.nq, cn.neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |                         ORDER BY list_dot_product(q.vq, cn.dq) / (q.nq * cn.ndq) DESC,
       |                                  cn.neighbor_id) AS rk
       |    FROM q CROSS JOIN cn WHERE q.query_id <> cn.neighbor_id) a
       |  WHERE rk <= ${4 * TopK}),
       |exact AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    list_dot_product(s.vq, CAST(e.embedding AS DOUBLE[]))
       |      / (s.nq * SQRT(list_dot_product(CAST(e.embedding AS DOUBLE[]),
       |                                      CAST(e.embedding AS DOUBLE[])))) AS cos_raw
       |  FROM short s JOIN embeddings e ON e.vec_id = s.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_raw,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
       |  FROM exact)
       |SELECT query_id, rank, neighbor_id, ROUND(cos_raw, 6) AS cosine
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): k-means
    * clusters are the BLOCKING key — near-duplicate pairs are mined by
    * exact cosine only WITHIN a cluster, shrinking the pair product
    * from n² to Σ|cluster|². Emits verified pairs
    * (cluster, vec_a, vec_b, cosine ≥ τ); survivor selection composes
    * downstream exactly like the other pair-mining dedups (feed
    * [[Dedup.connectedComponents]] or keep min vec_id per pair).
    *
    * Scale shape: assignment is the kmeansAssign projection (corpus
    * never shuffled); the pair join shuffles keyed by (cluster, block).
    * At the design point k grows with the corpus (~√n clusters —
    * SemDeDup runs 50k clusters on web scale), keeping clusters
    * bounded — but k-means reliably produces mega-cells on exactly the
    * near-duplicate-heavy corpora SemDeDup targets, so the quadratic
    * guard cannot be left to k alone. This composes the counted-bucket
    * discipline of [[Dedup.lshCandidates]] BEFORE any pair forms:
    *
    *  1. cell sizes are counted (algebraic agg, k rows, broadcast);
    *  2. a cell over `maxCell` rows is sub-split by the
    *     [[hyperplaneBucket]] signature (the dedup_embed_blocked
    *     machinery) at an adaptive width — ceil(log2(size/maxCell))
    *     bits, capped at `subPlanes` — so a cell 2× over the cap
    *     splits in half while a web-scale mega-cell fans out to
    *     2^subPlanes blocks;
    *  3. (cluster, block) sizes are re-counted and blocks STILL over
    *     `maxCell` (identical-direction mass no hyperplane separates)
    *     are dropped by semi-join, same boilerplate guard as LSH
    *     buckets.
    *
    * The worst pair bucket is therefore maxCell² by construction.
    * Recall inside an oversize cell is traded for the bound —
    * cross-block pairs are skipped, mirroring the blocked embed
    * dedup's contract; cells under the cap are mined exactly (block
    * is constant 0 and step 3 admits them whole).
    */
  def semanticDedup(
    emb: DataFrame,
    k: Int = 8,
    iters: Int = 3,
    tau: Double = 0.4,
    maxCell: Long = 100000L,
    subPlanes: Int = 16,
    dim: Int = KmeansDim
  ): DataFrame = {
    require(maxCell > 0 && subPlanes > 0 && subPlanes < 63, s"bad cap ($maxCell, $subPlanes)")
    val asg = kmeansAssign(emb, k, iters).select(col("vec_id"), col("cluster"))
    val p0 = prepped(emb, "vec_id", "v", "nrm").join(asg, "vec_id")
    val cellSizes = p0.groupBy(col("cluster")).agg(count(lit(1)).as("__cellSz"))
    val hp = hyperplanes(subPlanes, dim)
    val width = least(
      lit(subPlanes),
      greatest(
        lit(1),
        ceil(log(2.0, col("__cellSz").cast("double") / lit(maxCell.toDouble))).cast("int")
      )
    )
    val p = p0
      .join(broadcast(cellSizes), "cluster")
      .withColumn("__w", width)
      .withColumn(
        "block",
        when(
          col("__cellSz") > maxCell,
          hyperplaneBucket(col("v"), hp)
            .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), __w) - 1"))
        ).otherwise(lit(0L))
      )
      .select(col("cluster"), col("block"), col("vec_id"), col("v"), col("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ≤ k + (oversize cells)·2^subPlanes rows — broadcast admission
    val admissible = p
      .groupBy(col("cluster"), col("block"))
      .agg(count(lit(1)).as("__blkSz"))
      .filter(col("__blkSz") <= maxCell)
      .select(col("cluster"), col("block"))
    val m = p.join(broadcast(admissible), Seq("cluster", "block"), "left_semi")
    val a = m.select(col("cluster"), col("block"), col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = m.select(col("cluster"), col("block"), col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("cluster", "block"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", VectorMath.cosine(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= tau)
      .select(col("cluster"), col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cosine"))
  }

  def dedupSemantic(spark: SparkSession, dir: String): DataFrame =
    semanticDedup(Tables.embeddings(spark, dir))

  /** The kmeans trajectory CTEs + within-cluster cosine pairs, the
    * same raw-threshold-then-round contract as the embed dedup oracle.
    */
  val dedupSemanticSql: String =
    s"""WITH $KmeansCtes,
       |p AS (
       |  SELECT k.vec_id, k.cid, n.v, SQRT(list_dot_product(n.v, n.v)) AS nrm
       |  FROM kasg k JOIN n USING (vec_id))
       |SELECT a.cid AS cluster, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
       |FROM p a JOIN p b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
       |ORDER BY vec_a, vec_b""".stripMargin

  /** IVF ANN over a PROPER k-means coarse quantizer — the index build
    * ivfTopK's docstring promises at scale, composed from
    * [[kmeansCentroids]]: corpus vectors live in their euclid-argmin
    * cell, queries probe the nProbe nearest cells BY THE SAME metric,
    * candidates rank by exact cosine. Same scan economics as ivfTopK
    * (~nProbe/k of the corpus), better cell balance than the sampled
    * quantizer.
    */
  def ivfKmeansTopK(
    corpus: DataFrame,
    queries: DataFrame,
    k: Int,
    kClusters: Int = 8,
    iters: Int = 3,
    nProbe: Int = 2
  ): DataFrame = {
    val cents = kmeansCentroids(corpus, kClusters, iters)
    def cellStructs(v: Column): Column = array(centroidStructs(v, cents): _*)
    val c = prepped(corpus, "neighbor_id", "vc", "nc")
      .withColumn("cid", kmeansAssignStruct(col("vc"), cents).getField("cid"))
    val q = prepped(queries, "query_id", "vq", "nq")
      .withColumn(
        "cid",
        explode(slice(array_sort(cellStructs(col("vq"))), 1, nProbe).getField("cid"))
      )
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorMath.cosine(col("vq"), col("vc"), col("nq"), col("nc")))
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        round(col("cosine"), 6).as("cosine")
      )
  }

  def annIvfKmeans(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    ivfKmeansTopK(emb, emb.filter(col("vec_id") < QueryCount), TopK)
      .orderBy(col("query_id"), col("rank"))
  }

  /** The kmeans trajectory CTEs (kasg = corpus cell assignment) plus
    * the ivf probe/rank shape with euclid-ordered probes.
    */
  val annIvfKmeansSql: String = {
    val nProbe = 2
    s"""WITH $KmeansCtes,
       |c AS (
       |  SELECT k.vec_id AS neighbor_id, k.cid, n.v,
       |         SQRT(list_dot_product(n.v, n.v)) AS nrm
       |  FROM kasg k JOIN n USING (vec_id)),
       |q AS (
       |  SELECT vec_id AS query_id, v AS vq, nrm AS nq, cid FROM (
       |    SELECT n.vec_id, n.v,
       |      SQRT(list_dot_product(n.v, n.v)) AS nrm, cent.cid,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
       |        list_dot_product(n.v, n.v) - 2.0 * list_dot_product(n.v, cent.cv)
       |          + list_dot_product(cent.cv, cent.cv), cent.cid) AS rn
       |    FROM n CROSS JOIN cent$KmeansIters cent
       |    WHERE n.vec_id < $QueryCount) a
       |  WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id,
       |         list_dot_product(q.vq, c.v) / (q.nq * c.nrm) AS cos_raw
       |  FROM q JOIN c ON q.cid = c.cid AND q.query_id <> c.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_raw,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, ROUND(cos_raw, 6) AS cosine
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin
  }

  /** The full semantic-dedup PIPELINE ending: verified within-cluster
    * pairs grouped into connected components (the same bounded-round
    * min-label propagation dedup_clusters uses) with one survivor per
    * component — what a user actually deletes on.
    */
  def dedupSemanticClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup
      .clustersWithSurvivors(
        semanticDedup(Tables.embeddings(spark, dir))
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      )
      .select(col("doc_id").as("vec_id"), col("cluster"), col("survivor"))

  /** Semantic pair CTEs + recursive transitive closure (the
    * dedup_clusters oracle shape over the kmeans blocking).
    */
  val dedupSemanticClustersSql: String =
    s"""WITH RECURSIVE $KmeansCtes,
       |p AS (
       |  SELECT k.vec_id, k.cid, n.v, SQRT(list_dot_product(n.v, n.v)) AS nrm
       |  FROM kasg k JOIN n USING (vec_id)),
       |vpairs AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM p a JOIN p b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4),
       |cedges AS (
       |  SELECT va AS u, vb AS v FROM vpairs
       |  UNION
       |  SELECT vb AS u, va AS v FROM vpairs),
       |reach(u, v) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM cedges) nn
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN cedges e ON e.u = r.v)
       |SELECT u AS vec_id, MIN(v) AS cluster, u = MIN(v) AS survivor
       |FROM reach GROUP BY u
       |ORDER BY vec_id""".stripMargin

  def annKnnLabel(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    knnLabelVote(emb, emb.filter(col("vec_id") < QueryCount), TopK)
      .orderBy(col("query_id"))
  }

  /** Same ranked-neighbor CTEs as the bruteforce oracle, extended with
    * a label join and a deterministic (votes desc, label asc) vote.
    */
  val annKnnLabelSql: String =
    s"""WITH n AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
       |         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS label,
       |         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
       |  FROM n q JOIN n c ON q.vec_id < $QueryCount AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, label,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
       |  FROM scored),
       |votes AS (
       |  SELECT query_id, label, COUNT(*) AS votes
       |  FROM ranked WHERE rank <= $TopK
       |  GROUP BY query_id, label),
       |picked AS (
       |  SELECT query_id, label, votes,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS r
       |  FROM votes)
       |SELECT query_id, label AS predicted_label, votes
       |FROM picked WHERE r = 1
       |ORDER BY query_id""".stripMargin

  def trainNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    hardNegatives(emb, emb.filter(col("vec_id") < QueryCount), TopK)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hard-negative oracle: the bruteforce ranked CTEs restricted to
    * label-mismatched candidates, ranking on the same round-9 cosine.
    */
  val trainNegativesSql: String =
    s"""WITH n AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
       |         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, q.label AS query_label,
       |         c.vec_id AS negative_id, c.label AS negative_label,
       |         ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 9) AS cos9
       |  FROM n q JOIN n c
       |    ON q.vec_id < $QueryCount AND q.vec_id <> c.vec_id AND c.label <> q.label),
       |ranked AS (
       |  SELECT query_id, query_label, negative_id, negative_label, cos9,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos9 DESC, negative_id) AS rank
       |  FROM scored)
       |SELECT query_id, query_label, rank, negative_id, negative_label,
       |  ROUND(cos9, 6) AS cosine
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------------
  // ANN quality evaluation (recall@k vs the exact baseline)
  // ---------------------------------------------------------------------

  /** Recall@k of the LSH index against the exact brute-force top-k —
    * THE acceptance metric for any approximate index (how much of the
    * true neighborhood the bucketed search recovers). Every ANN
    * deployment gates index parameters (planes, probes, nlist) on
    * this number over a held-out query set before trusting the
    * sub-scan path.
    *
    * Scale shape: both rankings are already query-set-size relations
    * (queries × k rows — driver-size regardless of corpus size), so
    * the hit join and per-query rollup are trivially broadcastable;
    * the expensive parts (one exact scan, one bucketed probe) are the
    * operators under test, each in their own proven plan shape.
    * Portability: hits are exact id-match counts; recall divides by
    * the constant k in one pinned order.
    */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val bf = bruteForceFor(spark, dir).select(col("query_id"), col("neighbor_id"))
    val ls = annLsh(spark, dir)
      .select(col("query_id").as("__q"), col("neighbor_id").as("__n"))
    bf.join(
        broadcast(ls),
        col("query_id") === col("__q") && col("neighbor_id") === col("__n"),
        "left_outer"
      )
      .groupBy(col("query_id"))
      .agg(count(col("__n")).as("n_hit"))
      .select(
        col("query_id"),
        col("n_hit"),
        lit(TopK.toLong).as("k"),
        round(col("n_hit") / lit(TopK.toDouble), 6).as("recall")
      )
      .orderBy(col("query_id"))
  }

  /** Recall oracle: the two component pipelines verbatim as nested
    * CTEs (each already proven hash-green on its own), joined on
    * (query, neighbor) id pairs.
    */
  val annRecallSql: String =
    s"""WITH bf AS ($annBruteforceSql),
       |lsh AS ($annLshSql)
       |SELECT bf.query_id, COUNT(lsh.neighbor_id) AS n_hit,
       |  CAST($TopK AS BIGINT) AS k,
       |  ROUND(COUNT(lsh.neighbor_id) / CAST($TopK AS DOUBLE), 6) AS recall
       |FROM bf LEFT JOIN lsh
       |  ON lsh.query_id = bf.query_id AND lsh.neighbor_id = bf.neighbor_id
       |GROUP BY bf.query_id
       |ORDER BY bf.query_id""".stripMargin

  /** Recall@k of the IVF index against the same exact baseline — the
    * second index-acceptance metric: LSH and IVF trade recall
    * differently (probe count vs cell count), and tuning either needs
    * its own curve. Same join shape as [[annRecall]]: two driver-size
    * (queries × k) rankings, co-keyed.
    */
  def annRecallIvf(spark: SparkSession, dir: String): DataFrame = {
    val bf = bruteForceFor(spark, dir).select(col("query_id"), col("neighbor_id"))
    val iv = annIvf(spark, dir)
      .select(col("query_id").as("__q"), col("neighbor_id").as("__n"))
    bf.join(
        broadcast(iv),
        col("query_id") === col("__q") && col("neighbor_id") === col("__n"),
        "left_outer"
      )
      .groupBy(col("query_id"))
      .agg(count(col("__n")).as("n_hit"))
      .select(
        col("query_id"),
        col("n_hit"),
        lit(TopK.toLong).as("k"),
        round(col("n_hit") / lit(TopK.toDouble), 6).as("recall")
      )
      .orderBy(col("query_id"))
  }

  /** Recall@k of the PQ index against the exact baseline — the third
    * acceptance curve: PQ's loss is QUANTIZATION (ADC distance error),
    * not candidate pruning, so its recall curve moves with codebook
    * count/size rather than probe count; a pipeline choosing an index
    * wants all three curves side by side.
    */
  def annRecallPq(spark: SparkSession, dir: String): DataFrame = {
    val bf = bruteForceFor(spark, dir).select(col("query_id"), col("neighbor_id"))
    val pq = annPq(spark, dir)
      .select(col("query_id").as("__q"), col("neighbor_id").as("__n"))
    bf.join(
        broadcast(pq),
        col("query_id") === col("__q") && col("neighbor_id") === col("__n"),
        "left_outer"
      )
      .groupBy(col("query_id"))
      .agg(count(col("__n")).as("n_hit"))
      .select(
        col("query_id"),
        col("n_hit"),
        lit(TopK.toLong).as("k"),
        round(col("n_hit") / lit(TopK.toDouble), 6).as("recall")
      )
      .orderBy(col("query_id"))
  }

  val annRecallPqSql: String =
    s"""WITH bf AS ($annBruteforceSql),
       |pq AS ($annPqSql)
       |SELECT bf.query_id, COUNT(pq.neighbor_id) AS n_hit,
       |  CAST($TopK AS BIGINT) AS k,
       |  ROUND(COUNT(pq.neighbor_id) / CAST($TopK AS DOUBLE), 6) AS recall
       |FROM bf LEFT JOIN pq
       |  ON pq.query_id = bf.query_id AND pq.neighbor_id = bf.neighbor_id
       |GROUP BY bf.query_id
       |ORDER BY bf.query_id""".stripMargin

  /** Recall@k of the SQ index against the exact baseline — the fourth
    * acceptance curve, completing the family (LSH = pruning loss, IVF
    * = cell-pruning loss, PQ = distance-quantization loss): SQ's only
    * loss channel is the SHORTLIST MARGIN, because the emitted top-k
    * is an exact rerank of raw vectors — a true neighbor is missed
    * only when per-dim grid snapping pushes it below the
    * shortlistFactor·k cut. The curve therefore reads as a direct
    * check on the 256-point grid resolution and the shortlist factor,
    * and a deployment tunes exactly those two knobs against it.
    * Same scale shape as [[annRecall]]: both rankings are driver-size
    * (queries × k) relations, hit join broadcast, rollup per query.
    */
  def annRecallSq(spark: SparkSession, dir: String): DataFrame = {
    val bf = bruteForceFor(spark, dir).select(col("query_id"), col("neighbor_id"))
    val sq = annSq(spark, dir)
      .select(col("query_id").as("__q"), col("neighbor_id").as("__n"))
    bf.join(
        broadcast(sq),
        col("query_id") === col("__q") && col("neighbor_id") === col("__n"),
        "left_outer"
      )
      .groupBy(col("query_id"))
      .agg(count(col("__n")).as("n_hit"))
      .select(
        col("query_id"),
        col("n_hit"),
        lit(TopK.toLong).as("k"),
        round(col("n_hit") / lit(TopK.toDouble), 6).as("recall")
      )
      .orderBy(col("query_id"))
  }

  val annRecallSqSql: String =
    s"""WITH bf AS ($annBruteforceSql),
       |sq AS ($annSqSql)
       |SELECT bf.query_id, COUNT(sq.neighbor_id) AS n_hit,
       |  CAST($TopK AS BIGINT) AS k,
       |  ROUND(COUNT(sq.neighbor_id) / CAST($TopK AS DOUBLE), 6) AS recall
       |FROM bf LEFT JOIN sq
       |  ON sq.query_id = bf.query_id AND sq.neighbor_id = bf.neighbor_id
       |GROUP BY bf.query_id
       |ORDER BY bf.query_id""".stripMargin

  /** Recall@k of the composed IVF+PQ index (IVFADC) against the exact
    * baseline — the FIFTH acceptance curve, for the one index shape
    * that actually ships at billion scale: its loss channel is the SUM
    * of IVF's cell pruning and PQ's distance quantization, so its
    * curve is what a deployment tunes nprobe AND codebook size
    * against, and it must sit at-or-below both parents' curves. Same
    * driver-size join shape as the other four.
    */
  def annRecallIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val bf = bruteForceFor(spark, dir).select(col("query_id"), col("neighbor_id"))
    val ip = annIvfPq(spark, dir)
      .select(col("query_id").as("__q"), col("neighbor_id").as("__n"))
    bf.join(
        broadcast(ip),
        col("query_id") === col("__q") && col("neighbor_id") === col("__n"),
        "left_outer"
      )
      .groupBy(col("query_id"))
      .agg(count(col("__n")).as("n_hit"))
      .select(
        col("query_id"),
        col("n_hit"),
        lit(TopK.toLong).as("k"),
        round(col("n_hit") / lit(TopK.toDouble), 6).as("recall")
      )
      .orderBy(col("query_id"))
  }

  val annRecallIvfPqSql: String =
    s"""WITH bf AS ($annBruteforceSql),
       |ip AS ($annIvfPqSql)
       |SELECT bf.query_id, COUNT(ip.neighbor_id) AS n_hit,
       |  CAST($TopK AS BIGINT) AS k,
       |  ROUND(COUNT(ip.neighbor_id) / CAST($TopK AS DOUBLE), 6) AS recall
       |FROM bf LEFT JOIN ip
       |  ON ip.query_id = bf.query_id AND ip.neighbor_id = bf.neighbor_id
       |GROUP BY bf.query_id
       |ORDER BY bf.query_id""".stripMargin

  // ---------------------------------------------------------------------
  // Hubness screen (kNN in-degree over the LSH-bucketed graph)
  // ---------------------------------------------------------------------

  /** Hubness screen: the in-degree of every vector in the
    * bucket-restricted k-nearest-neighbor graph — the classic
    * high-dimensional pathology metric (Radovanović et al., JMLR
    * 2010): "hub" vectors that appear in a disproportionate share of
    * other points' neighbor lists degrade every kNN-based downstream
    * (dedup, retrieval, kNN-label) and usually indicate anisotropy the
    * [[embedDebias]] rank-1 removal fixes. Orphans (in-degree 0) mark
    * the opposite failure: points no one retrieves.
    *
    * Scale shape: each vector lives in ONE hyperplane bucket; the kNN
    * candidates come from the counted-cap admitted self-join
    * ([[admittedBlocks]] — pairs bounded by maxBucket² per block even
    * on adversarial all-identical buckets, the [[semanticDedup]]
    * discipline); the per-vector top-k is a block-bounded rank;
    * in-degree is one partial agg. The corpus never crosses an
    * exchange at pair grain.
    */
  /** The counted-cap admitted relation under [[bucketedKnn]] — the
    * [[semanticDedup]] discipline applied to the hyperplane buckets:
    *
    *  1. bucket sizes are counted (algebraic agg, ≤ 2^planes rows,
    *     broadcast);
    *  2. a bucket over `maxBucket` rows is sub-split by FRESH
    *     hyperplane bits (an offset slice of the generator — reusing
    *     the bucketing planes would make the extra bits constant
    *     within a bucket) at adaptive width ceil(log2(size/max)),
    *     capped at `subPlanes`;
    *  3. (bucket, block) sizes are re-counted and blocks STILL over
    *     the cap (identical-direction mass no hyperplane separates)
    *     are dropped by semi-join — their members leave the graph
    *     (orphans downstream), the documented degradation.
    *
    * The worst self-join key is therefore maxBucket² by construction;
    * buckets under the cap are admitted whole (block = 0) and the
    * graph is unchanged.
    */
  private[graft] def admittedBlocks(
    emb: DataFrame,
    planes: Int,
    dim: Int,
    maxBucket: Long,
    subPlanes: Int,
    seed: Long = 42L
  ): DataFrame = {
    val hp = hyperplanes(planes, dim, seed)
    val hpSub = hyperplanes(planes + subPlanes, dim, seed).drop(planes)
    val v0 = prepped(emb, "vec_id", "v", "n")
      .withColumn("bucket", hyperplaneBucket(col("v"), hp))
    val sizes = v0.groupBy(col("bucket")).agg(count(lit(1)).as("__bSz"))
    val width = least(
      lit(subPlanes),
      greatest(
        lit(1),
        ceil(log(2.0, col("__bSz").cast("double") / lit(maxBucket.toDouble))).cast("int")
      )
    )
    val v = v0
      .join(broadcast(sizes), "bucket")
      .withColumn("__w", width)
      .withColumn(
        "block",
        when(
          col("__bSz") > maxBucket,
          hyperplaneBucket(col("v"), hpSub)
            .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), __w) - 1"))
        ).otherwise(lit(0L))
      )
      .select(col("bucket"), col("block"), col("vec_id"), col("v"), col("n"))
    val admissible = v
      .groupBy(col("bucket"), col("block"))
      .agg(count(lit(1)).as("__blkSz"))
      .filter(col("__blkSz") <= maxBucket)
      .select(col("bucket"), col("block"))
    v.join(broadcast(admissible), Seq("bucket", "block"), "left_semi")
  }

  /** Bucket-restricted kNN graph (src, dst, round-9 cosine) — the
    * shared candidate kernel under [[hubnessScreen]] and [[lofScreen]].
    * Candidates come from the [[admittedBlocks]] relation, so one hot
    * hyperplane bucket (boilerplate/all-identical embeddings) costs at
    * most maxBucket² pairs instead of going quadratic. Both self-join
    * sides are CORPUS cardinality — merge-hinted so toy-scale stats
    * never plan them as broadcasts (the (bucket, block) key
    * co-partitions the join; at the design point neither side fits a
    * broadcast). The cosine is rounded to 9 BEFORE ranking (the repo's
    * ranking discipline): a last-ULP accumulation-order difference
    * between VecDot and the oracle's list_dot_product could otherwise
    * flip a near-tie rank, moving the k-cut and every downstream flag.
    */
  private[graft] def bucketedKnn(
    emb: DataFrame,
    k: Int,
    planes: Int,
    dim: Int,
    maxBucket: Long = 100000L,
    subPlanes: Int = 16,
    seed: Long = 42L
  ): DataFrame = {
    require(maxBucket > 0 && subPlanes > 0 && subPlanes < 63, s"bad cap ($maxBucket, $subPlanes)")
    val m = admittedBlocks(emb, planes, dim, maxBucket, subPlanes, seed)
    val a = m.select(col("bucket"), col("block"), col("vec_id").as("__src"), col("v").as("__va"), col("n").as("__na"))
    val b = m.select(col("bucket"), col("block"), col("vec_id").as("__dst"), col("v").as("__vb"), col("n").as("__nb"))
    val bySrc = Window.partitionBy(col("__src")).orderBy(col("__cos").desc, col("__dst"))
    a.join(b.hint("merge"), Seq("bucket", "block"))
      .filter(col("__src") =!= col("__dst"))
      .withColumn("__cos", round(VectorMath.cosine(col("__va"), col("__vb"), col("__na"), col("__nb")), 9))
      .withColumn("__rk", row_number().over(bySrc))
      .filter(col("__rk") <= k)
      .select(col("__src"), col("__dst"), col("__cos"))
  }

  // The default-parameter kNN mine (k=5, planes=4, dim=64) feeds THREE
  // registry consumers (embed_hubness, embed_lof, ann_graph's view A)
  // and ann_graph's second view (seed 7) — mine once per
  // (session, dir, seed) and share the checkpointed edge relation
  // (the minedJaccardFor / trainedFor discipline).
  private val knnCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String, Long, Int), DataFrame]()
  private val knnLock = new Object

  private[graft] def knnFor(
    spark: SparkSession,
    dir: String,
    seed: Long = 42L,
    planes: Int = 4
  ): DataFrame = {
    knnCache.keys.foreach { k =>
      if (k._1.sparkContext.isStopped) knnCache.remove(k): Unit
    }
    val key = (spark, Tables.canonDir(dir), seed, planes)
    knnCache.getOrElse(
      key,
      knnLock.synchronized {
        knnCache.getOrElseUpdate(
          key,
          bucketedKnn(Tables.embeddings(spark, dir), 5, planes, 64, seed = seed)
            .localCheckpoint()
        )
      }
    )
  }

  // the graph-ANN long-range view (half-sampled coarse mine) — its own
  // memo since its (sample, k, planes) differ from every knnFor key
  private val coarseKnnCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()

  private[graft] def coarseKnnFor(spark: SparkSession, dir: String): DataFrame = {
    coarseKnnCache.keys.foreach { k =>
      if (k._1.sparkContext.isStopped) coarseKnnCache.remove(k): Unit
    }
    val key = (spark, Tables.canonDir(dir))
    coarseKnnCache.getOrElse(
      key,
      knnLock.synchronized {
        coarseKnnCache.getOrElseUpdate(
          key,
          bucketedKnn(
            graphCoarseHalf(Tables.embeddings(spark, dir)),
            GraphCoarseK,
            GraphCoarsePlanes,
            64,
            seed = GraphSeedC
          ).localCheckpoint()
        )
      }
    )
  }

  def hubnessScreen(
    emb: DataFrame,
    k: Int = 5,
    planes: Int = 4,
    dim: Int = 64,
    maxBucket: Long = 100000L,
    subPlanes: Int = 16,
    mined: Option[DataFrame] = None
  ): DataFrame = {
    val v = prepped(emb, "vec_id", "v", "n")
    val knn = mined
      .getOrElse(bucketedKnn(emb, k, planes, dim, maxBucket, subPlanes))
      .select(col("__src"), col("__dst"))
    val inDeg = knn.groupBy(col("__dst").as("vec_id")).agg(count(lit(1)).as("in_degree"))
    val d = coalesce(col("in_degree"), lit(0L))
    v.select(col("vec_id"))
      .join(inDeg.hint("merge"), Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        d.as("in_degree"),
        (d >= 2L * k).as("hub"),
        (d === 0L).as("orphan")
      )
  }

  def embedHubness(spark: SparkSession, dir: String): DataFrame =
    hubnessScreen(Tables.embeddings(spark, dir), mined = Some(knnFor(spark, dir)))

  val embedHubnessSql: String = {
    val k = 5
    val planes = 4
    val hp = hyperplanes(planes, 64)
    def bucketExpr(v: String): String =
      hp.zipWithIndex
        .map { case (p, i) =>
          val lit = p.mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product($v, $lit) > 0.0 THEN ${1L << i} ELSE 0 END)"
        }
        .mkString("(", " + ", ")")
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |bk AS (SELECT vec_id, v, nrm, ${bucketExpr("v")} AS bucket FROM n),
       |scored AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |         ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 9) AS cos_raw
       |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT src, dst,
       |         ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_raw DESC, dst) AS rk
       |  FROM scored),
       |knn AS (SELECT src, dst FROM ranked WHERE rk <= $k),
       |deg AS (SELECT dst AS vec_id, COUNT(*) AS in_degree FROM knn GROUP BY 1)
       |SELECT n.vec_id,
       |  CAST(COALESCE(deg.in_degree, 0) AS BIGINT) AS in_degree,
       |  COALESCE(deg.in_degree, 0) >= ${2 * k} AS hub,
       |  COALESCE(deg.in_degree, 0) = 0 AS orphan
       |FROM n LEFT JOIN deg ON deg.vec_id = n.vec_id
       |ORDER BY n.vec_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Local outlier factor (density-ratio outliers over the bucketed kNN)
  // ---------------------------------------------------------------------

  /** Local outlier factor (Breunig et al., SIGMOD 2000) over the same
    * bucket-restricted kNN graph as [[hubnessScreen]] — the DENSITY-
    * RATIO outlier screen that catches what [[embedOutliers]]'
    * global-distance z-score cannot: a point at the edge of a sparse
    * region scores normal there but outlier-high when its neighbors
    * are mutually far denser than it is. LOF(a) = mean(lrd(b)) /
    * lrd(a) over a's neighbors; ≈1 inlier, >1.5 flagged.
    *
    * Scale shape: candidates come from the shared bucket-keyed
    * self-join (Σ bucket²-bounded, merge-hinted); EVERYTHING after is
    * kNN-graph grain (n·k rows) — k-distance one src-keyed agg,
    * reachability one dst-keyed equi-join, lrd one src-keyed agg, the
    * final ratio two more id-keyed joins. The corpus never moves at
    * pair grain and nothing is collected.
    *
    * Portability: distances are 1 − round-9 cosines (identical IEEE
    * subtraction); reach/lrd sums route through DECIMAL; lrd and the
    * final ratio derive in one pinned double order before the round-6.
    * Degenerate zero-distance neighborhoods (exact duplicates) yield
    * NULL lrd via NULLIF in both engines and propagate to NULL lof.
    */
  def lofScreen(
    emb: DataFrame,
    k: Int = 5,
    planes: Int = 4,
    dim: Int = 64,
    maxBucket: Long = 100000L,
    subPlanes: Int = 16,
    mined: Option[DataFrame] = None
  ): DataFrame = {
    val dec3810 = org.apache.spark.sql.types.DecimalType(38, 10)
    val knn = mined
      .getOrElse(bucketedKnn(emb, k, planes, dim, maxBucket, subPlanes))
      .select(col("__src"), col("__dst"), (lit(1.0) - col("__cos")).as("__d"))
    val kdist = knn.groupBy(col("__src").as("__kv")).agg(max(col("__d")).as("__kd"))
    val reach = knn
      .join(kdist.hint("merge"), col("__dst") === col("__kv"))
      .select(col("__src"), col("__dst"), greatest(col("__d"), col("__kd")).as("__r"))
    val lrd = reach
      .groupBy(col("__src"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("__r").cast(dec3810)).cast("double").as("__sr")
      )
      .select(
        col("__src").as("__lv"),
        (col("__n").cast("double") / nullif(col("__sr"), lit(0.0))).as("__lrd")
      )
    val lofNum = reach
      .join(
        lrd.select(col("__lv").as("__bv"), col("__lrd").as("__lrdb")).hint("merge"),
        col("__dst") === col("__bv")
      )
      .groupBy(col("__src"))
      .agg(
        count(lit(1)).as("n_nn"),
        sum(col("__lrdb").cast(dec3810)).cast("double").as("__sl")
      )
    val lofExpr = col("__sl") / col("n_nn").cast("double") / col("__lrd")
    val scored = lofNum
      .join(lrd.hint("merge"), col("__src") === col("__lv"))
      .select(
        col("__src").as("vec_id"),
        col("n_nn"),
        round(lofExpr, 6).as("lof"),
        coalesce(lofExpr > 1.5, lit(false)).as("outlier")
      )
    emb
      .select(col("vec_id"))
      .join(scored.hint("merge"), Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        coalesce(col("n_nn"), lit(0L)).as("n_nn"),
        col("lof"),
        coalesce(col("outlier"), lit(false)).as("outlier")
      )
  }

  def embedLof(spark: SparkSession, dir: String): DataFrame =
    lofScreen(Tables.embeddings(spark, dir), mined = Some(knnFor(spark, dir)))

  val embedLofSql: String = {
    val k = 5
    val planes = 4
    val hp = hyperplanes(planes, 64)
    def bucketExpr(v: String): String =
      hp.zipWithIndex
        .map { case (p, i) =>
          val lit = p.mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product($v, $lit) > 0.0 THEN ${1L << i} ELSE 0 END)"
        }
        .mkString("(", " + ", ")")
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |bk AS (SELECT vec_id, v, nrm, ${bucketExpr("v")} AS bucket FROM n),
       |scored AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |         ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 9) AS cos9
       |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |knn AS (
       |  SELECT src, dst, 1.0 - cos9 AS d FROM (
       |    SELECT src, dst, cos9,
       |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos9 DESC, dst) AS rk
       |    FROM scored) r
       |  WHERE rk <= $k),
       |kdist AS (SELECT src AS kv, MAX(d) AS kd FROM knn GROUP BY 1),
       |reach AS (
       |  SELECT knn.src, knn.dst, GREATEST(knn.d, kdist.kd) AS r
       |  FROM knn JOIN kdist ON kdist.kv = knn.dst),
       |lrd AS (
       |  SELECT src AS lv,
       |    CAST(COUNT(*) AS DOUBLE)
       |      / NULLIF(CAST(SUM(CAST(r AS DECIMAL(38,10))) AS DOUBLE), 0.0) AS lrd
       |  FROM reach GROUP BY 1),
       |num AS (
       |  SELECT reach.src, COUNT(*) AS n_nn,
       |    CAST(SUM(CAST(b.lrd AS DECIMAL(38,10))) AS DOUBLE) AS sl
       |  FROM reach JOIN lrd b ON b.lv = reach.dst
       |  GROUP BY 1),
       |fin AS (
       |  SELECT num.src AS vec_id, num.n_nn,
       |    ROUND(num.sl / CAST(num.n_nn AS DOUBLE) / a.lrd, 6) AS lof,
       |    COALESCE(num.sl / CAST(num.n_nn AS DOUBLE) / a.lrd > 1.5, FALSE) AS outlier
       |  FROM num JOIN lrd a ON a.lv = num.src)
       |SELECT n.vec_id,
       |  CAST(COALESCE(fin.n_nn, 0) AS BIGINT) AS n_nn,
       |  fin.lof,
       |  COALESCE(fin.outlier, FALSE) AS outlier
       |FROM n LEFT JOIN fin ON fin.vec_id = n.vec_id
       |ORDER BY n.vec_id""".stripMargin
  }

  val annRecallIvfSql: String =
    s"""WITH bf AS ($annBruteforceSql),
       |ivf AS ($annIvfSql)
       |SELECT bf.query_id, COUNT(ivf.neighbor_id) AS n_hit,
       |  CAST($TopK AS BIGINT) AS k,
       |  ROUND(COUNT(ivf.neighbor_id) / CAST($TopK AS DOUBLE), 6) AS recall
       |FROM bf LEFT JOIN ivf
       |  ON ivf.query_id = bf.query_id AND ivf.neighbor_id = bf.neighbor_id
       |GROUP BY bf.query_id
       |ORDER BY bf.query_id""".stripMargin

  // ---------------------------------------------------------------------
  // Graph-based ANN (beam search over the bucketed kNN graph)
  // ---------------------------------------------------------------------

  val GraphK = 5
  val GraphBeam = 24
  val GraphHops = 5
  val GraphEntryCount = 16
  val GraphSeedB = 7L

  /** The long-range view: a third kNN mine under FEWER hyperplanes
    * (2 → 4 big buckets) over a deterministic HALF-SAMPLE of the
    * corpus (md5 leading hex < '8' — both engines replay it
    * identically), keeping 8 edges per node. Bigger buckets connect
    * vectors the two fine views keep apart — the NSW long-link
    * ingredient — and the half-sample prices the view at (n/2)²/4 =
    * n²/16 scored pairs, exactly ONE fine view, so the three-view mine
    * is 1.5× the round-12 two-view mine. Measured at sf0.1 (GraphTune):
    * recall@5 0.60 (two views) → 0.90 (this config; full-corpus coarse
    * at 3× mine cost reads 0.86-0.94 — the half-sample keeps nearly
    * all of the win at half the added cost). Edge retention (k=8) is
    * free — the window rank scores the same pairs either way.
    */
  val GraphSeedC = 13L
  val GraphCoarsePlanes = 2
  val GraphCoarseK = 8

  /** The coarse view's corpus half-sample: md5 leading hex digit in
    * 0-7 — portable across engines (`substr(md5(CAST(vec_id AS
    * VARCHAR)), 1, 1) < '8'` on the oracle side).
    */
  private[graft] def graphCoarseHalf(emb: DataFrame): DataFrame =
    emb.filter(substring(md5(col("vec_id").cast("string")), 1, 1) < "8")

  /** Graph-ANN beam search — the navigable-small-world retrieval idea
    * behind NSW/HNSW (Malkov & Yashunin 2014/2018), expressed
    * Spark-first: greedy BEAM descent over the SAME bucket-capped kNN
    * graph the hubness/LOF screens mine, as a fixed unroll of
    * frontier-join hops (the pagerank/closeness loop discipline
    * applied to retrieval). Entries are pinned hash-ranked nodes
    * (md5 of the id — a deterministic pseudo-random sample both
    * engines replay identically); each hop expands the beam's
    * out-edges, dedups, rescores candidates against the query with the
    * exact cosine, and keeps the top `beam`; the final beam reranks to
    * top-k excluding self.
    *
    * Scale shape: the graph is mined once at bucket-capped cost
    * ([[bucketedKnn]] — never quadratic); each hop joins the
    * (|Q|·beam)-row frontier (query-set grain, corpus-independent)
    * against the src-keyed edge relation and rescores by an 8-byte
    * vec_id join back to the corpus — no corpus scan after the mine,
    * and hop/beam are constants so the plan is a flat 3-hop unroll.
    * Portability: cosines round to 9 BEFORE every rank (the
    * bucketedKnn discipline) and the OUTPUT cosine is that same
    * grid-9 value — no second rounding to straddle.
    */
  def graphBeamTopK(
    emb: DataFrame,
    queries: DataFrame,
    k: Int,
    graphK: Int = GraphK,
    beam: Int = GraphBeam,
    hops: Int = GraphHops,
    entries: Int = GraphEntryCount,
    planes: Int = 4,
    dim: Int = 64,
    minedViews: Option[Seq[DataFrame]] = None
  ): DataFrame = {
    // MULTI-VIEW NSW-style graph: a single LSH-bucketed kNN mine only
    // has INTRA-bucket edges, so true neighbors hashed into other
    // buckets are unreachable at any beam budget. A second mine under
    // an independently-seeded hyperplane set cuts the space differently
    // — its edges cross the first view's bucket boundaries — and the
    // union plus reverse links (bidirectional, as NSW keeps them) makes
    // the graph navigable from sparse entries. A third, COARSER view
    // (fewer hyperplanes → bigger buckets → longer edges) supplies the
    // NSW long-range links that let the beam cross the space in few
    // hops. Measured at sf0.1: recall@5 0.12 (one view, out-edges) →
    // 0.16 (+reverse) → 0.60 (+second view) → see annRecallGraph for
    // the current three-view figure — still bucket-capped/linear.
    val mined = minedViews
      .getOrElse(
        Seq(
          bucketedKnn(emb, graphK, planes, dim),
          bucketedKnn(emb, graphK, planes, dim, seed = GraphSeedB),
          bucketedKnn(graphCoarseHalf(emb), GraphCoarseK, GraphCoarsePlanes, dim, seed = GraphSeedC)
        )
      )
      .reduce(_ union _)
    // the edge relation is THE INDEX — materialize it once (eager
    // localCheckpoint) so the fixed hop unroll replays a flat scan per
    // hop instead of re-planning two mines × two window ranks each
    // time (at deployment scale the index persists to storage; this is
    // the in-session equivalent, the pagerank loop discipline)
    val knn = mined
      .select(col("__src").as("__gsrc"), col("__dst").as("__gdst"))
      .union(mined.select(col("__dst").as("__gsrc"), col("__src").as("__gdst")))
      .distinct()
      .localCheckpoint(true)
    val c = prepped(emb, "__cid", "__vc", "__nc")
    val q = prepped(queries, "query_id", "__vq", "__nq")
    val ent = emb
      .select(col("vec_id").as("__cand"))
      .orderBy(md5(col("__cand").cast("string")), col("__cand"))
      .limit(entries)
    val byQ = Window.partitionBy(col("query_id")).orderBy(col("__cos9").desc, col("__cand"))
    def beamScore(cand: DataFrame): DataFrame =
      cand
        .join(c, col("__cand") === col("__cid"))
        .join(broadcast(q), Seq("query_id"))
        .withColumn(
          "__cos9",
          round(VectorMath.cosine(col("__vq"), col("__vc"), col("__nq"), col("__nc")), 9)
        )
        .withColumn("__rk", row_number().over(byQ))
        .filter(col("__rk") <= beam)
        .select(col("query_id"), col("__cand"), col("__cos9"))
    // per-hop eager checkpoint keeps the unrolled plan FLAT (frontier
    // is |Q|·beam rows — driver-trivial to materialize; without it the
    // lineage nests a window rank + two joins per hop)
    var frontier =
      beamScore(q.select(col("query_id")).crossJoin(broadcast(ent))).localCheckpoint(true)
    for (_ <- 1 to hops) {
      val expanded = frontier
        .select(col("query_id"), col("__cand"))
        .join(knn, col("__cand") === col("__gsrc"))
        .select(col("query_id"), col("__gdst").as("__cand"))
      val cands = frontier.select(col("query_id"), col("__cand")).union(expanded).distinct()
      frontier = beamScore(cands).localCheckpoint(true)
    }
    frontier
      .filter(col("__cand") =!= col("query_id"))
      .withColumn("rank", row_number().over(byQ).cast("long"))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("rank"),
        col("__cand").as("neighbor_id"),
        col("__cos9").as("cosine")
      )
  }

  // the beam result feeds both ann_graph and ann_recall_graph — pay
  // the two-view mine + beam once per (session, dir), the
  // bruteForceFor discipline (queries × k rows: driver-trivial to pin)
  private val graphCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  private val graphLock = new Object

  private def graphTopKFor(spark: SparkSession, dir: String): DataFrame = {
    graphCache.keys.foreach { k =>
      if (k._1.sparkContext.isStopped) graphCache.remove(k): Unit
    }
    val key = (spark, Tables.canonDir(dir))
    graphCache.getOrElse(
      key,
      graphLock.synchronized {
        graphCache.getOrElseUpdate(
          key, {
            val emb = Tables.embeddings(spark, dir)
            graphBeamTopK(
              emb,
              emb.filter(col("vec_id") < QueryCount),
              TopK,
              minedViews = Some(
                Seq(
                  knnFor(spark, dir),
                  knnFor(spark, dir, GraphSeedB),
                  coarseKnnFor(spark, dir)
                )
              )
            ).localCheckpoint()
          }
        )
      }
    )
  }

  def annGraph(spark: SparkSession, dir: String): DataFrame =
    graphTopKFor(spark, dir).orderBy(col("query_id"), col("rank"))

  /** Oracle: the kNN-graph mine (the embed_hubness CTEs), hash-pinned
    * entries, and the beam unrolled hop by hop with the identical
    * round-9 scoring and (cos9 DESC, cand) tie-break.
    *
    * Bucket-size bound (embedHubnessSql convention, shared by all
    * mined-kNN oracles): the SQL mines each view with a plain
    * `a.bucket = b.bucket` self-join, while the engine routes through
    * [[admittedBlocks]] (maxBucket=100000 cap + subPlanes
    * sub-splitting). The two mine the SAME graph iff every one of the
    * 16 LSH buckets per view holds ≤ 100000 vectors — true by a wide
    * margin at every driver SF (sf0.1 ≈ 6k vectors TOTAL). At a scale
    * where a single bucket exceeds the cap the engine's block split
    * kicks in and this oracle stops being value-exact by design; the
    * engine side is the scale path.
    */
  val annGraphSql: String = {
    def bucketExpr(v: String, seed: Long, planes: Int = 4): String =
      hyperplanes(planes, 64, seed).zipWithIndex
        .map { case (p, i) =>
          val l = p.mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product($v, $l) > 0.0 THEN ${1L << i} ELSE 0 END)"
        }
        .mkString("(", " + ", ")")
    val hopCtes = (1 to GraphHops)
      .map { h =>
        s"""c$h AS (
           |  SELECT DISTINCT query_id, cand FROM (
           |    SELECT query_id, cand FROM b${h - 1}
           |    UNION ALL
           |    SELECT b.query_id, g.dst AS cand
           |    FROM b${h - 1} b JOIN knn g ON g.src = b.cand)),
           |f$h AS (
           |  SELECT query_id, cand, cos9,
           |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos9 DESC, cand) AS rk
           |  FROM (
           |    SELECT x.query_id, x.cand,
           |      ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 9) AS cos9
           |    FROM c$h x JOIN n c ON c.vec_id = x.cand JOIN q ON q.query_id = x.query_id)),
           |b$h AS (SELECT query_id, cand, cos9 FROM f$h WHERE rk <= $GraphBeam)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |bk AS (SELECT vec_id, v, nrm, ${bucketExpr("v", 42L)} AS bucket FROM n),
       |gsc AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |         ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 9) AS cos_raw
       |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |grk AS (
       |  SELECT src, dst,
       |         ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_raw DESC, dst) AS rk
       |  FROM gsc),
       |bk2 AS (SELECT vec_id, v, nrm, ${bucketExpr("v", GraphSeedB)} AS bucket FROM n),
       |gsc2 AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |         ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 9) AS cos_raw
       |  FROM bk2 a JOIN bk2 b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |grk2 AS (
       |  SELECT src, dst,
       |         ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_raw DESC, dst) AS rk
       |  FROM gsc2),
       |bk3 AS (
       |  SELECT vec_id, v, nrm,
       |    ${bucketExpr("v", GraphSeedC, GraphCoarsePlanes)} AS bucket
       |  FROM n WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '8'),
       |gsc3 AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |         ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 9) AS cos_raw
       |  FROM bk3 a JOIN bk3 b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |grk3 AS (
       |  SELECT src, dst,
       |         ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_raw DESC, dst) AS rk
       |  FROM gsc3),
       |kout AS (
       |  SELECT src, dst FROM grk WHERE rk <= $GraphK
       |  UNION ALL
       |  SELECT src, dst FROM grk2 WHERE rk <= $GraphK
       |  UNION ALL
       |  SELECT src, dst FROM grk3 WHERE rk <= $GraphCoarseK),
       |knn AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM kout
       |    UNION ALL
       |    SELECT dst AS src, src AS dst FROM kout)),
       |ent AS (
       |  SELECT vec_id AS cand FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $GraphEntryCount),
       |q AS (SELECT vec_id AS query_id, v, nrm FROM n WHERE vec_id < $QueryCount),
       |f0 AS (
       |  SELECT query_id, cand, cos9,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos9 DESC, cand) AS rk
       |  FROM (
       |    SELECT q.query_id, e.cand,
       |      ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 9) AS cos9
       |    FROM q CROSS JOIN ent e JOIN n c ON c.vec_id = e.cand)),
       |b0 AS (SELECT query_id, cand, cos9 FROM f0 WHERE rk <= $GraphBeam),
       |$hopCtes
       |SELECT query_id, rank, cand AS neighbor_id, cos9 AS cosine
       |FROM (
       |  SELECT query_id, cand, cos9,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos9 DESC, cand) AS rank
       |  FROM b$GraphHops WHERE cand <> query_id)
       |WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Recall@k of the graph-ANN beam against the exact baseline — the
    * acceptance curve for the navigable-graph index member, beside the
    * LSH/IVF/PQ/SQ curves. Same driver-size (queries × k) join shape
    * as [[annRecall]].
    */
  def annRecallGraph(spark: SparkSession, dir: String): DataFrame = {
    val bf = bruteForceFor(spark, dir).select(col("query_id"), col("neighbor_id"))
    val gr = annGraph(spark, dir)
      .select(col("query_id").as("__q"), col("neighbor_id").as("__n"))
    bf.join(
        broadcast(gr),
        col("query_id") === col("__q") && col("neighbor_id") === col("__n"),
        "left_outer"
      )
      .groupBy(col("query_id"))
      .agg(count(col("__n")).as("n_hit"))
      .select(
        col("query_id"),
        col("n_hit"),
        lit(TopK.toLong).as("k"),
        round(col("n_hit") / lit(TopK.toDouble), 6).as("recall")
      )
      .orderBy(col("query_id"))
  }

  val annRecallGraphSql: String =
    s"""WITH bf AS ($annBruteforceSql),
       |gr AS ($annGraphSql)
       |SELECT bf.query_id, COUNT(gr.neighbor_id) AS n_hit,
       |  CAST($TopK AS BIGINT) AS k,
       |  ROUND(COUNT(gr.neighbor_id) / CAST($TopK AS DOUBLE), 6) AS recall
       |FROM bf LEFT JOIN gr
       |  ON gr.query_id = bf.query_id AND gr.neighbor_id = bf.neighbor_id
       |GROUP BY bf.query_id
       |ORDER BY bf.query_id""".stripMargin

  // ---------------------------------------------------------------------
  // MMR diversification rerank
  // ---------------------------------------------------------------------

  val MmrPool = 10
  val MmrK = 5
  val MmrLambda = 0.7

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein, SIGIR
    * 1998) — the diversification post-processor every RAG retrieval
    * stack runs between ANN top-N and the context window: greedily
    * re-pick m of the top-N candidates maximizing
    * λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s), so near-duplicate
    * hits stop crowding out coverage. The per-query twin of
    * [[sampleKcenter]]'s corpus-level diversity pass.
    *
    * Scale shape: the candidate pool is the ann top-N — a
    * (queries×N)-row relation, driver-size regardless of corpus — so
    * the candidate-pair similarity matrix (≤ N² per query) and the m
    * greedy rounds are query-set-grain joins; the only corpus-scale
    * work is the ONE exact scan producing the pool (the
    * ann_bruteforce shape; an index pool composes identically). Each
    * round eagerly checkpoints (the pagerank discipline) so the fixed
    * unroll stays flat. Portability: sims round to 9 before anything
    * ranks; the marginal score ranks as the same IEEE double in both
    * engines (products of identical grid-9 inputs, cand tie-break) and
    * OUTPUTS through the FLOOR(q·1e6+0.5)/1e6 idiom.
    */
  def mmrRerank(
    emb: DataFrame,
    queries: DataFrame,
    pool: Int = MmrPool,
    m: Int = MmrK,
    lambda: Double = MmrLambda
  ): DataFrame = {
    val c = prepped(emb, "__cid", "__vc", "__nc")
    val q = prepped(queries, "query_id", "__vq", "__nq")
    val byQsim = Window.partitionBy(col("query_id")).orderBy(col("sim9").desc, col("__cand"))
    val byQsimC = Window.partitionBy(col("query_id")).orderBy(col("sim9").desc, col("__cid"))
    val cands = c
      .join(broadcast(q), col("query_id") =!= col("__cid"))
      .withColumn(
        "sim9",
        round(VectorMath.cosine(col("__vq"), col("__vc"), col("__nq"), col("__nc")), 9)
      )
      .withColumn("__rk", row_number().over(byQsimC))
      .filter(col("__rk") <= pool)
      .select(col("query_id"), col("__cid").as("__cand"), col("sim9"), col("__vc"), col("__nc"))
      .localCheckpoint(true)
    val a = cands.select(col("query_id"), col("__cand").as("__a"), col("__vc").as("__va"), col("__nc").as("__na"))
    val b = cands.select(col("query_id"), col("__cand").as("__b"), col("__vc").as("__vb"), col("__nc").as("__nb"))
    val csim = a
      .join(b, Seq("query_id"))
      .filter(col("__a") =!= col("__b"))
      .select(
        col("query_id"),
        col("__a"),
        col("__b"),
        round(VectorMath.cosine(col("__va"), col("__vb"), col("__na"), col("__nb")), 9).as("cs9")
      )
      .localCheckpoint(true)
    val pool0 = cands.select(col("query_id"), col("__cand"), col("sim9"))
    var selected = pool0
      .withColumn("__rk", row_number().over(byQsim))
      .filter(col("__rk") === 1)
      .select(col("query_id"), col("__cand"), lit(1L).as("rank"), col("sim9"),
        col("sim9").as("__mmrq"))
      .localCheckpoint(true)
    for (r <- 2 to m) {
      val rem = pool0.join(
        selected.select(col("query_id"), col("__cand")),
        Seq("query_id", "__cand"),
        "left_anti"
      )
      val maxSel = rem
        .join(
          csim.join(
            selected.select(col("query_id"), col("__cand").as("__b")),
            Seq("query_id", "__b")
          ).select(col("query_id"), col("__a").as("__cand"), col("cs9")),
          Seq("query_id", "__cand")
        )
        .groupBy(col("query_id"), col("__cand"), col("sim9"))
        .agg(max(col("cs9")).as("__ms"))
      val byScore = Window
        .partitionBy(col("query_id"))
        .orderBy(col("__mmr").desc, col("__cand"))
      val pick = maxSel
        .withColumn("__mmr", lit(lambda) * col("sim9") - lit(1.0 - lambda) * col("__ms"))
        .withColumn("__rk", row_number().over(byScore))
        .filter(col("__rk") === 1)
        .select(col("query_id"), col("__cand"), lit(r.toLong).as("rank"), col("sim9"),
          col("__mmr").as("__mmrq"))
      selected = selected.union(pick).localCheckpoint(true)
    }
    selected.select(
      col("query_id"),
      col("rank"),
      col("__cand").as("neighbor_id"),
      col("sim9").as("relevance"),
      (floor(col("__mmrq") * lit(1e6) + lit(0.5)) / lit(1e6) + lit(0.0)).as("mmr")
    )
  }

  def annMmr(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    mmrRerank(emb, emb.filter(col("vec_id") < QueryCount))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Oracle: the exact top-N pool + candidate-pair sims as CTEs, then
    * the m greedy rounds unrolled with the identical λ-marginal argmax
    * and (score DESC, cand) tie-break.
    */
  val annMmrSql: String = {
    val rounds = (2 to MmrK).map { r =>
      val selU = (1 until r).map(i => s"SELECT query_id, cand, rank, sim9, mmrq FROM msel$i").mkString(" UNION ALL ")
      s"""msel$r AS MATERIALIZED (
         |  SELECT query_id, cand, CAST($r AS BIGINT) AS rank, sim9, mmr AS mmrq FROM (
         |    SELECT x.query_id, x.cand, x.sim9,
         |      $MmrLambda * x.sim9 - ${1.0 - MmrLambda} * MAX(cs.cs9) AS mmr,
         |      ROW_NUMBER() OVER (PARTITION BY x.query_id
         |        ORDER BY $MmrLambda * x.sim9 - ${1.0 - MmrLambda} * MAX(cs.cs9) DESC, x.cand) AS rk
         |    FROM mpool x
         |    JOIN mcsim cs ON cs.query_id = x.query_id AND cs.a = x.cand
         |      AND cs.b IN (SELECT cand FROM ($selU) s WHERE s.query_id = x.query_id)
         |    WHERE x.cand NOT IN (SELECT cand FROM ($selU) s WHERE s.query_id = x.query_id)
         |    GROUP BY x.query_id, x.cand, x.sim9)
         |  WHERE rk = 1)""".stripMargin
    }
    val finals = (1 to MmrK).map(i => s"SELECT query_id, rank, cand, sim9, mmrq FROM msel$i")
    s"""WITH mn AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |mq AS (SELECT vec_id AS query_id, v, nrm FROM mn WHERE vec_id < $QueryCount),
       |mpool AS MATERIALIZED (
       |  SELECT query_id, cand, sim9 FROM (
       |    SELECT q.query_id, c.vec_id AS cand,
       |      ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 9) AS sim9,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 9) DESC, c.vec_id) AS rk
       |    FROM mq q JOIN mn c ON c.vec_id <> q.query_id)
       |  WHERE rk <= $MmrPool),
       |mcsim AS MATERIALIZED (
       |  SELECT p.query_id, p.cand AS a, p2.cand AS b,
       |    ROUND(list_dot_product(ca.v, cb.v) / (ca.nrm * cb.nrm), 9) AS cs9
       |  FROM mpool p
       |  JOIN mpool p2 ON p2.query_id = p.query_id AND p2.cand <> p.cand
       |  JOIN mn ca ON ca.vec_id = p.cand
       |  JOIN mn cb ON cb.vec_id = p2.cand),
       |msel1 AS MATERIALIZED (
       |  SELECT query_id, cand, CAST(1 AS BIGINT) AS rank, sim9, sim9 AS mmrq FROM (
       |    SELECT query_id, cand, sim9,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim9 DESC, cand) AS rk
       |    FROM mpool)
       |  WHERE rk = 1),
       |${rounds.mkString(",\n")}
       |SELECT query_id, rank, cand AS neighbor_id, sim9 AS relevance,
       |  FLOOR(mmrq * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS mmr
       |FROM (${finals.mkString(" UNION ALL ")})
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Top principal component (power iteration)
  // ---------------------------------------------------------------------

  /** Top principal component of the (mean-centered) embedding table by
    * POWER ITERATION — the embedding-diagnostics primitive behind
    * whitening, anisotropy measurement ("all my embeddings point one
    * way"), and rank-1 debiasing. `v ← normalize(Σ_i x̃_i (x̃_i·v))`
    * for a fixed iteration count from the deterministic uniform start
    * `1/√d`.
    *
    * Scale shape — the Lloyd-loop discipline of [[deterministicKmeans]]:
    * each iteration is ONE corpus scan computing, map-side in a single
    * projection, the row's score (codegen'd VecDot against the literal
    * direction, minus the literal μ·v) alongside its posexploded
    * (dim, value) pairs; the only shuffle is the d-key partial agg
    * (d·partitions rows). The corpus is never shuffled, never joined.
    * Driver holds d-sized vectors only (the centroid-collect shape).
    *
    * Portability: per-dim sums route through DECIMAL (order-free);
    * dot products are left-to-right (VecDot == list_dot_product, and
    * the driver folds μ·v in the same order); the norm is an ordered
    * d-element fold on BOTH engines (fixed order, not order-free —
    * deterministic because the order is pinned); sqrt is
    * correctly-rounded IEEE. The whole trajectory is bit-identical,
    * so the oracle simply unrolls the same iterations as CTEs.
    */
  /** The raw power-iteration result: (µ exact-decimal mean, final
    * unnormalized update s, final norm) — the shared kernel under
    * [[topPrincipalComponent]] and [[debiasTop]].
    */
  private def powerIteration(embeds: DataFrame, iters: Int): (Array[Double], Array[Double], Double) = {
    require(iters > 0, s"iters must be positive, got $iters")
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    val e = embeds
      .select(col("vec_id"), col("embedding").cast("array<double>").as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val d = e.select(size(col("x"))).first().getInt(0)
      // mean per dimension: exact-decimal sum / count (matches the
      // oracle's DECIMAL route bit for bit)
      val mu: Array[Double] = e
        .select(posexplode(col("x")).as(Seq("d", "val")))
        .groupBy(col("d"))
        .agg((sum(col("val").cast(dec)).cast("double") / count(lit(1))).as("m"))
        .orderBy(col("d"))
        .select(col("m"))
        .collect()
        .map(_.getDouble(0))
      def orderedFold(xs: Array[Double]): Double = {
        // left-to-right, matching list_reduce / list_dot_product
        var acc = 0.0; var i = 0
        while (i < xs.length) { acc += xs(i); i += 1 }
        acc
      }
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      var lastS = Array.empty[Double]
      var lastNorm = 0.0
      var i = 0
      while (i < iters) {
        val muDotV = orderedFold(mu.zip(v).map { case (a, b) => a * b })
        val s = e
          .select(
            (VectorMath.dot(col("x"), typedlit(v)) - lit(muDotV)).as("score"),
            posexplode(col("x")).as(Seq("d", "val"))
          )
          .groupBy(col("d"))
          .agg(
            sum(((col("val") - element_at(typedlit(mu), col("d") + 1)) * col("score")).cast(dec))
              .cast("double")
              .as("s")
          )
          .orderBy(col("d"))
          .select(col("s"))
          .collect()
          .map(_.getDouble(0))
        lastNorm = math.sqrt(orderedFold(s.map(z => z * z)))
        v = s.map(_ / lastNorm)
        lastS = s
        i += 1
      }
      (mu, lastS, lastNorm)
    } finally e.unpersist(false)
  }

  /** Spark round(x, 6) semantics on the driver: HALF_UP on the
    * canonical decimal rendering — so locally-built outputs are
    * bit-identical to the expression route.
    */
  private def round6(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue

  def topPrincipalComponent(embeds: DataFrame, iters: Int = 8): DataFrame = {
    val (_, s, norm) = powerIteration(embeds, iters)
    val spark = embeds.sparkSession
    import spark.implicits._
    s.toSeq.zipWithIndex
      .map { case (z, d) => (d.toLong, round6(z / norm)) }
      .toDF("dim", "loading")
  }

  /** Memoized (µ, published u₁) per (SparkSession, dir) — the
    * [[Dedup.minedJaccardFor]] discipline: embed_pca and embed_debias
    * are two REPORTS over one shared power-iteration result, computed
    * once per session/data directory (a production diagnostics suite
    * runs the iteration once and serves every consumer). Entries of
    * stopped contexts are evicted on access; driver memory per entry
    * is two d-element arrays.
    */
  private val pcaCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), (Array[Double], Array[Double])]()
  private val pcaLock = new Object

  private def pcaFor(spark: SparkSession, dir: String): (Array[Double], Array[Double]) = {
    pcaCache.keys.foreach { k =>
      if (k._1.sparkContext.isStopped) pcaCache.remove(k): Unit
    }
    val key = (spark, Tables.canonDir(dir))
    pcaCache.getOrElse(
      key,
      pcaLock.synchronized {
        pcaCache.getOrElseUpdate(
          key, {
            val (mu, s, norm) = powerIteration(Tables.embeddings(spark, dir), iters = 8)
            (mu, s.map(z => round6(z / norm)))
          }
        )
      }
    )
  }

  def embedPca(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pcaFor(spark, dir)._2.toSeq.zipWithIndex
      .map { case (l, d) => (d.toLong, l) }
      .toDF("dim", "loading")
  }

  /** All-but-the-Top rank-1 debias report (Mu & Viswanath 2018): how
    * much of each embedding lies along the corpus's dominant
    * direction — `score = (x − µ)·u₁` — and the centered norm left
    * after removing it. Anisotropic embedding tables ("everything
    * points one way") wreck cosine retrieval; this is the standard
    * post-processing diagnostic/fix, with u₁ from the SAME power
    * iteration [[embedPca]] publishes.
    *
    * Scale shape: the component and mean are d-row / d-element driver
    * values (the sanctioned collect shape) broadcast into a single
    * map-side projection over the corpus — one scan, zero shuffles
    * beyond the mean's partial agg. Portability: u₁ is the ROUNDED
    * published loading vector (identical in both engines by
    * embedPca's own oracle), µ the exact-decimal mean; every dot is a
    * left-to-right fold and the residual norm uses the
    * ‖xc‖² − score² identity in one pinned expression order, guarded
    * at zero before the sqrt.
    */
  /** The one-scan debias projection given the (µ, u₁) driver vectors. */
  private def debiasProjection(embeds: DataFrame, mu: Array[Double], u: Array[Double]): DataFrame = {
    def fold(xs: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < xs.length) { acc += xs(i); i += 1 }
      acc
    }
    val muDotU = fold(mu.zip(u).map { case (a, b) => a * b })
    val muDotMu = fold(mu.map(m => m * m))
    val x = col("__x")
    val sc = VectorMath.dot(x, typedlit(u.toSeq)) - lit(muDotU)
    val xxc = VectorMath.dot(x, x) - lit(2.0) * VectorMath.dot(x, typedlit(mu.toSeq)) + lit(muDotMu)
    embeds
      .select(col("vec_id"), col("embedding").cast("array<double>").as("__x"))
      .withColumn("__sc", sc)
      .withColumn("__xxc", xxc)
      .select(
        col("vec_id"),
        round(col("__sc"), 6).as("score"),
        round(sqrt(greatest(col("__xxc"), lit(0.0))), 6).as("norm_centered"),
        round(sqrt(greatest(col("__xxc") - col("__sc") * col("__sc"), lit(0.0))), 6)
          .as("resid_norm")
      )
  }

  def debiasTop(embeds: DataFrame, iters: Int = 8): DataFrame = {
    val (mu, s, norm) = powerIteration(embeds, iters)
    debiasProjection(embeds, mu, s.map(z => round6(z / norm)))
  }

  def embedDebias(spark: SparkSession, dir: String): DataFrame = {
    // the shared memoized (µ, u₁): debias is a single corpus scan on
    // top of the iteration embed_pca already paid for
    val (mu, u) = pcaFor(spark, dir)
    debiasProjection(Tables.embeddings(spark, dir), mu, u)
  }

  /** Embedding-table isotropy report in ONE row (Mu & Viswanath 2018 /
    * Ethayarajh 2019 — "does everything point one way?"): the two
    * anisotropy ratios that decide whether cosine retrieval over this
    * table is trustworthy. `mean_share` = ‖µ‖²/E‖x‖² (how much of the
    * average vector is the common offset); `lambda1_share` =
    * E[((x−µ)·u₁)²]/E‖x−µ‖² (how much centered variance the top
    * principal direction owns — λ₁/trace). Isotropic tables sit near
    * (0, 1/d); an anisotropic one is what [[embedDebias]] then fixes,
    * so this is its acceptance metric.
    *
    * Scale shape: (µ, u₁) are the SAME memoized d-element driver
    * vectors embed_pca/embed_debias already share — the report is one
    * corpus scan folding three dots per row into a single partial
    * agg: zero shuffles past the final 1-row reduce. Portability:
    * ‖µ‖² folds left-to-right driver-side (= the oracle's
    * list_reduce), dots are the shared VectorMath fold, sums route
    * through DECIMAL(27,10), ratios round at 6.
    */
  def embedIsotropy(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    val (mu, u) = pcaFor(spark, dir)
    def fold(xs: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < xs.length) { acc += xs(i); i += 1 }
      acc
    }
    val muDotU = fold(mu.zip(u).map { case (a, b) => a * b })
    val muDotMu = fold(mu.map(m => m * m))
    val x = col("__x")
    val sc = VectorMath.dot(x, typedlit(u.toSeq)) - lit(muDotU)
    val xx = VectorMath.dot(x, x)
    val xxc = xx - lit(2.0) * VectorMath.dot(x, typedlit(mu.toSeq)) + lit(muDotMu)
    Tables.embeddings(spark, dir)
      .select(col("embedding").cast("array<double>").as("__x"))
      .select(sc.as("__sc"), xx.as("__xx"), xxc.as("__xxc"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__xx").cast(dec)).cast("double").as("__sxx"),
        sum(col("__xxc").cast(dec)).cast("double").as("__sxxc"),
        sum((col("__sc") * col("__sc")).cast(dec)).cast("double").as("__ssc2")
      )
      .select(
        col("n"),
        round(lit(muDotMu) / (col("__sxx") / col("n")), 6).as("mean_share"),
        round(col("__ssc2") / col("__sxxc"), 6).as("lambda1_share"),
        round(sqrt(col("__sxxc") / col("n")), 6).as("avg_cnorm")
      )
  }

  /** Isotropy oracle: the debias proj CTE extended with ‖x‖², the same
    * DECIMAL sums and the list_reduce ‖µ‖² fold.
    */
  lazy val embedIsotropySql: String =
    s"""WITH pc AS ($embedPcaSql),
       |u AS (SELECT list(loading ORDER BY dim) AS u FROM pc),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
       |vals AS (
       |  SELECT vec_id, CAST(i.i - 1 AS INT) AS d, x[i.i] AS val
       |  FROM e, UNNEST(range(1, len(x) + 1)) AS i(i)),
       |mu AS (
       |  SELECT d, CAST(SUM(CAST(val AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS m
       |  FROM vals GROUP BY d),
       |mulist AS (SELECT list(m ORDER BY d) AS m FROM mu),
       |proj AS (
       |  SELECT e.vec_id,
       |    list_dot_product(e.x, u.u) - list_dot_product(ml.m, u.u) AS sc,
       |    list_dot_product(e.x, e.x) AS xx,
       |    list_dot_product(e.x, e.x) - 2.0 * list_dot_product(e.x, ml.m)
       |      + list_dot_product(ml.m, ml.m) AS xxc
       |  FROM e CROSS JOIN u CROSS JOIN mulist ml),
       |s AS (
       |  SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(xx AS DECIMAL(27,10))) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(xxc AS DECIMAL(27,10))) AS DOUBLE) AS sxxc,
       |    CAST(SUM(CAST(sc * sc AS DECIMAL(27,10))) AS DOUBLE) AS ssc2
       |  FROM proj),
       |m2 AS (SELECT list_dot_product(m, m) AS mm FROM mulist)
       |SELECT s.n,
       |  ROUND(m2.mm / (s.sxx / s.n), 6) AS mean_share,
       |  ROUND(s.ssc2 / s.sxxc, 6) AS lambda1_share,
       |  ROUND(SQRT(s.sxxc / s.n), 6) AS avg_cnorm
       |FROM s CROSS JOIN m2""".stripMargin

  /** Debias oracle: the embedPca pipeline nested verbatim as a CTE
    * (already hash-proven) supplies u₁; µ rebuilds through the same
    * DECIMAL route; the projection mirrors the engine expression for
    * expression. (lazy: embedPcaSql initializes later in the file.)
    */
  lazy val embedDebiasSql: String =
    s"""WITH pc AS ($embedPcaSql),
       |u AS (SELECT list(loading ORDER BY dim) AS u FROM pc),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
       |vals AS (
       |  SELECT vec_id, CAST(i.i - 1 AS INT) AS d, x[i.i] AS val
       |  FROM e, UNNEST(range(1, len(x) + 1)) AS i(i)),
       |mu AS (
       |  SELECT d, CAST(SUM(CAST(val AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS m
       |  FROM vals GROUP BY d),
       |mulist AS (SELECT list(m ORDER BY d) AS m FROM mu),
       |proj AS (
       |  SELECT e.vec_id,
       |    list_dot_product(e.x, u.u) - list_dot_product(ml.m, u.u) AS sc,
       |    list_dot_product(e.x, e.x) - 2.0 * list_dot_product(e.x, ml.m)
       |      + list_dot_product(ml.m, ml.m) AS xxc
       |  FROM e CROSS JOIN u CROSS JOIN mulist ml)
       |SELECT vec_id,
       |  ROUND(sc, 6) AS score,
       |  ROUND(SQRT(GREATEST(xxc, 0.0)), 6) AS norm_centered,
       |  ROUND(SQRT(GREATEST(xxc - sc * sc, 0.0)), 6) AS resid_norm
       |FROM proj
       |ORDER BY vec_id""".stripMargin

  /** Power-iteration oracle: the same trajectory unrolled — DECIMAL
    * per-dim sums, left-to-right dots, ordered-fold norms.
    */
  val embedPcaSql: String = {
    val iters = 8
    val iterCtes = (1 to iters)
      .map { i =>
        s"""s$i AS MATERIALIZED (
           |  SELECT e.vec_id,
           |    list_dot_product(e.x, v.v) - list_dot_product(ml.m, v.v) AS score
           |  FROM e CROSS JOIN v${i - 1} v CROSS JOIN mulist ml),
           |u$i AS MATERIALIZED (
           |  SELECT t.d,
           |    CAST(SUM(CAST((t.val - mu.m) * s.score AS DECIMAL(27,10))) AS DOUBLE) AS s
           |  FROM vals t
           |  JOIN s$i s ON s.vec_id = t.vec_id
           |  JOIN mu ON mu.d = t.d
           |  GROUP BY t.d),
           |n$i AS MATERIALIZED (
           |  SELECT SQRT(list_reduce(list_transform(list(s ORDER BY d), z -> z * z),
           |                          (a, b) -> a + b)) AS nrm
           |  FROM u$i),
           |v$i AS MATERIALIZED (SELECT list(u.s / n.nrm ORDER BY u.d) AS v FROM u$i u CROSS JOIN n$i n)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
       |vals AS MATERIALIZED (
       |  SELECT vec_id, CAST(u.i - 1 AS INT) AS d, x[u.i] AS val
       |  FROM e, UNNEST(range(1, len(x) + 1)) AS u(i)),
       |mu AS MATERIALIZED (
       |  SELECT d, CAST(SUM(CAST(val AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS m
       |  FROM vals GROUP BY d),
       |mulist AS MATERIALIZED (SELECT list(m ORDER BY d) AS m FROM mu),
       |dims AS (SELECT COUNT(*) AS d FROM mu),
       |v0 AS MATERIALIZED (
       |  SELECT list_transform(range(1, CAST(dims.d AS INT) + 1),
       |                        i -> 1.0 / SQRT(CAST(dims.d AS DOUBLE))) AS v
       |  FROM dims),
       |$iterCtes
       |SELECT CAST(u.d AS BIGINT) AS dim, ROUND(u.s / n.nrm, 6) AS loading
       |FROM u$iters u CROSS JOIN n$iters n
       |ORDER BY dim""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Exact-duplicate vectors
  // ---------------------------------------------------------------------

  /** Exact-duplicate embedding detection: vectors that are BITWISE
    * identical — the degenerate case every scraped-embedding store
    * accumulates (re-encoded rows, default vectors) that silently
    * skews kNN and kmeans before any NEAR-dup machinery matters.
    * Groups directly on the vector value; survivor = min vec_id.
    *
    * Scale shape: one exchange keyed by the vector (at scale, key by a
    * 64-bit hash of the bytes first — same shape as dedup_exact_hash);
    * only groups with copies survive.
    */
  def exactVectorDups(emb: DataFrame): DataFrame =
    emb
      .groupBy(col("embedding"))
      .agg(min(col("vec_id")).as("vec_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(col("vec_id"), col("n_copies"))

  /** The fixed query plants twins (vec_id % 13 → exact copy at
    * vec_id + 1000000) — random synthetic vectors have no natural
    * bitwise dups at any scale factor.
    */
  def embedDups(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val planted = emb
      .filter(col("vec_id") % 13 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    exactVectorDups(emb.unionByName(planted))
  }

  val embedDupsSql: String =
    """WITH corpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 13 = 0)
      |SELECT MIN(vec_id) AS vec_id, COUNT(*) AS n_copies
      |FROM corpus
      |GROUP BY embedding
      |HAVING COUNT(*) > 1
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // Per-dimension embedding diagnostics
  // ---------------------------------------------------------------------

  /** Per-dimension embedding statistics — the "dead / runaway
    * dimension" screen run before trusting any distance math
    * downstream (a dimension with ~zero variance contributes nothing
    * to cosine; one with a huge mean dominates it — the anisotropy
    * [[embedDebias]] then removes).
    *
    * Scale shape: one posexplode projection (map-side, corpus scanned
    * once, never shuffled as vectors) into ONE dim-keyed algebraic
    * DECIMAL-moment agg — dims-many groups, partial map-side.
    * Portability: float elements cast to double exactly; moments sum
    * through DECIMAL; mean/std round after one pinned double order.
    */
  def dimStats(emb: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    emb
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"), col("x").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dec)).cast("double").as("__s1"),
        sum((col("x") * col("x")).cast(dec)).cast("double").as("__s2"),
        min(col("x")).as("min_x"),
        max(col("x")).as("max_x")
      )
      .select(
        col("dim"),
        col("n"),
        round(col("__s1") / col("n"), 6).as("mean"),
        round(
          sqrt(
            greatest(
              col("__s2") / col("n") - (col("__s1") / col("n")) * (col("__s1") / col("n")),
              lit(0.0)
            )
          ),
          6
        ).as("std"),
        // range endpoints round to the repo's scale-6 output grid:
        // raw float32 passthroughs are cross-engine identical but land
        // arbitrarily close to the audit's half grid when the data
        // happens to (observed at sf0.01 round 12); rounding identical
        // doubles cannot diverge (scale-6 halves are not binary
        // fractions, so an exact tie is unrepresentable)
        round(col("min_x"), 6).as("min_x"),
        round(col("max_x"), 6).as("max_x")
      )
  }

  def embedDims(spark: SparkSession, dir: String): DataFrame =
    dimStats(Tables.embeddings(spark, dir)).orderBy(col("dim"))

  /** Oracle: 1-based list indexing over the same exploded dims with
    * identical DECIMAL moments and pinned mean/std order.
    */
  val embedDimsSql: String =
    """WITH e AS (
      |  SELECT embedding, UNNEST(range(1, len(embedding) + 1)) AS i FROM embeddings),
      |v AS (SELECT CAST(i - 1 AS BIGINT) AS dim, CAST(embedding[i] AS DOUBLE) AS x FROM e),
      |a AS (
      |  SELECT dim, COUNT(*) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(x * x AS DECIMAL(27,10))) AS DOUBLE) AS s2,
      |    MIN(x) AS min_x, MAX(x) AS max_x
      |  FROM v GROUP BY 1)
      |SELECT dim, n, ROUND(s1 / n, 6) AS mean,
      |  ROUND(SQRT(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0.0)), 6) AS std,
      |  ROUND(min_x, 6) AS min_x, ROUND(max_x, 6) AS max_x
      |FROM a
      |ORDER BY dim""".stripMargin

  // -------------------------------------------------------------------
  // Label-centroid similarity matrix
  // -------------------------------------------------------------------

  /** Cosine similarity matrix between the label-group centroids of the
    * embedding table — the "how close are these sources/clusters in
    * embedding space" report (the semantic analog of corpus_jsd's
    * lexical source distance): near-1 off-diagonal cells mean two
    * labels are semantically interchangeable; the diagonal is 1 by
    * construction and serves as the oracle's own sanity row.
    *
    * Scale shape: ONE corpus scan reduces to (label, dim) centroid
    * components (posexplode + partial agg — the corpus never joins
    * anything); norms and the pair matrix are label²·dim-scale algebra
    * on that summary. At 100 TB labels are sources/clusters (k ≪
    * corpus), so everything after the first agg is driver-trivial yet
    * fully distributed.
    *
    * Portability: centroid components are exact-DECIMAL-sum doubles;
    * dot/norm terms route through DECIMAL again; cos divides by the
    * two sqrts in pinned order before the round-6.
    */
  def labelCentroidSim(emb: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 10)
    val cd = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(
        (sum(col("x").cast("double").cast(dec)).cast("double") / count(lit(1))).as("__c"),
        count(lit(1)).as("__n")
      )
    val norms = cd
      .groupBy(col("label"))
      .agg(
        sum((col("__c") * col("__c")).cast(dec)).cast("double").as("__n2"),
        max(col("__n")).as("n_vec")
      )
    val a = cd.select(col("label").as("label_a"), col("dim"), col("__c").as("__ca"))
    val b = cd.select(col("label").as("label_b"), col("dim"), col("__c").as("__cb"))
    a.join(b, Seq("dim"))
      .filter(col("label_a") <= col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum((col("__ca") * col("__cb")).cast(dec)).cast("double").as("__dot"))
      .join(
        broadcast(norms.select(col("label").as("label_a"), col("__n2").as("__na"), col("n_vec").as("n_a"))),
        Seq("label_a")
      )
      .join(
        broadcast(norms.select(col("label").as("label_b"), col("__n2").as("__nb"), col("n_vec").as("n_b"))),
        Seq("label_b")
      )
      .select(
        col("label_a"),
        col("label_b"),
        col("n_a"),
        col("n_b"),
        round(col("__dot") / (sqrt(col("__na")) * sqrt(col("__nb"))), 6).as("cos_sim")
      )
  }

  def embedLabelSim(spark: SparkSession, dir: String): DataFrame =
    labelCentroidSim(Tables.embeddings(spark, dir)).orderBy(col("label_a"), col("label_b"))

  val embedLabelSimSql: String =
    """WITH e AS (
      |  SELECT label, embedding, UNNEST(range(1, len(embedding) + 1)) AS i FROM embeddings),
      |v AS (SELECT label, CAST(i - 1 AS BIGINT) AS dim, CAST(embedding[i] AS DOUBLE) AS x FROM e),
      |c AS (
      |  SELECT label, dim,
      |    CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS c,
      |    COUNT(*) AS n
      |  FROM v GROUP BY 1, 2),
      |no AS (
      |  SELECT label, CAST(SUM(CAST(c * c AS DECIMAL(27,10))) AS DOUBLE) AS n2, MAX(n) AS n_vec
      |  FROM c GROUP BY 1),
      |d AS (
      |  SELECT a.label AS label_a, b.label AS label_b,
      |    CAST(SUM(CAST(a.c * b.c AS DECIMAL(27,10))) AS DOUBLE) AS dot
      |  FROM c a JOIN c b ON a.dim = b.dim AND a.label <= b.label
      |  GROUP BY 1, 2)
      |SELECT d.label_a, d.label_b,
      |  na.n_vec AS n_a, nb.n_vec AS n_b,
      |  ROUND(d.dot / (SQRT(na.n2) * SQRT(nb.n2)), 6) AS cos_sim
      |FROM d
      |JOIN no na ON na.label = d.label_a
      |JOIN no nb ON nb.label = d.label_b
      |ORDER BY label_a, label_b""".stripMargin
}
