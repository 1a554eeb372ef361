package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offline tuning harness for the graph-ANN index (ann_graph): measures
  * recall@k against the exact baseline for candidate view/beam/hop
  * configurations, plus each config's mined-edge count (the mine-cost
  * proxy). Run: `runMain graft.GraphTune /root/testdata/sf0.1`.
  * Dev aid only — the registry query pins ONE configuration; this main
  * is how that configuration was chosen (round-13 recall push).
  */
object GraphTune {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env
      .get("SPARK_GRAFT_CPUS")
      .map(_.toInt)
      .getOrElse(math.min(Runtime.getRuntime.availableProcessors, 32))
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    import Similarity._

    val emb = Tables.embeddings(spark, dir).localCheckpoint(true)
    val queries = emb.filter(col("vec_id") < QueryCount)
    val truth = Similarity
      .bruteForceTopK(emb, queries, TopK)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true)
    val nTruth = truth.count().toDouble

    def fine(seed: Long): DataFrame = knnFor(spark, dir, seed)
    def coarse(planes: Int, seed: Long, sampledHalf: Boolean, k: Int = GraphK): DataFrame = {
      val base =
        if (sampledHalf) emb.filter(substring(md5(col("vec_id").cast("string")), 1, 1) < "8")
        else emb
      Similarity.bucketedKnn(base, k, planes, 64, seed = seed).localCheckpoint(true)
    }

    def recall(views: Seq[DataFrame], beam: Int, hops: Int, entries: Int): (Double, Long) = {
      val edges = views.map(_.count()).sum
      val got = Similarity
        .graphBeamTopK(
          emb,
          queries,
          TopK,
          beam = beam,
          hops = hops,
          entries = entries,
          minedViews = Some(views)
        )
        .select(col("query_id").as("q"), col("neighbor_id").as("n"))
      val hit = truth
        .join(got, col("query_id") === col("q") && col("neighbor_id") === col("n"))
        .count()
      (hit / nTruth, edges)
    }

    val a = fine(42L)
    val b = fine(GraphSeedB)
    val configs: Seq[(String, Seq[DataFrame], Int, Int, Int)] = Seq(
      ("baseline 2-view beam16 hops4", Seq(a, b), 16, 4, 8),
      ("2-view beam32 hops6", Seq(a, b), 32, 6, 8),
      ("+coarse p2 full", Seq(a, b, coarse(2, GraphSeedC, sampledHalf = false)), 16, 4, 8),
      ("+coarse p2 half", Seq(a, b, coarse(2, GraphSeedC, sampledHalf = true)), 16, 4, 8),
      ("+coarse p3 full", Seq(a, b, coarse(3, GraphSeedC, sampledHalf = false)), 16, 4, 8),
      ("+coarse p2 half beam24 hops5", Seq(a, b, coarse(2, GraphSeedC, sampledHalf = true)), 24, 5, 8),
      ("+coarse p2 full beam24 hops5", Seq(a, b, coarse(2, GraphSeedC, sampledHalf = false)), 24, 5, 8),
      ("3rd fine seed13", Seq(a, b, coarse(4, GraphSeedC, sampledHalf = false)), 16, 4, 8),
      ("+coarse p2 half k8 beam24 hops5", Seq(a, b, coarse(2, GraphSeedC, sampledHalf = true, k = 8)), 24, 5, 8),
      ("+coarse p2 half k12 beam24 hops5", Seq(a, b, coarse(2, GraphSeedC, sampledHalf = true, k = 12)), 24, 5, 8),
      ("+coarse p2 half k8 beam32 hops6", Seq(a, b, coarse(2, GraphSeedC, sampledHalf = true, k = 8)), 32, 6, 8),
      ("+coarse p2 half k8 b24 h5 e16", Seq(a, b, coarse(2, GraphSeedC, sampledHalf = true, k = 8)), 24, 5, 16),
      ("+coarse p2 full beam32 hops6", Seq(a, b, coarse(2, GraphSeedC, sampledHalf = false)), 32, 6, 8)
    )
    configs.foreach { case (name, views, beam, hops, entries) =>
      val t0 = System.nanoTime()
      val (r, e) = recall(views, beam, hops, entries)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[graphtune] $name%-32s recall@$TopK=$r%.3f edges=$e%6d sec=$sec%.1f")
    }
    spark.stop()
  }
}
