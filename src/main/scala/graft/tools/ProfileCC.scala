package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for dedup_clusters phases (not part of the library surface). */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = math.min(Runtime.getRuntime.availableProcessors, 32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    // warmup
    graft.operators.Dedup.dedupClusters(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
    spark.catalog.clearCache()

    val docs = graft.Tables.documents(spark, sfDir)
    val pairs = time("mine_pairs") {
      val p = graft.operators.Dedup.minhashNearDups(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println("pairs=" + p.count())
      p
    }
    time("connected_components") {
      val cc = graft.operators.Dedup.connectedComponents(pairs)
      println("labels=" + cc.count())
    }
    spark.stop()
  }
}
