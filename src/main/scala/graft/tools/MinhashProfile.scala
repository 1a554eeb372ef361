package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: stage-level wall timings for the MinHash miner at the
  * bench scale factor — times each prefix of the pipeline with the noop
  * sink so the increment isolates one stage (guide §1.4). The registry's
  * biggest bench line (dedup_minhash 5.2 s in the r15 clean record) is
  * this pipeline; the round-16 ask is a profile BEFORE any change.
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.operators.Dedup
    val w = 3; val bands = 16; val maxBucketSize = 64

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[mhprofile] $name%-28s min=${ts.drop(1).min}%6.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val docs = Dedup.withPlantedNearDups(graft.Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
    val sigs = Dedup.minhashSignatures(docs, w)
    val pairs = Dedup.lshCandidates(sigs, bands, maxBucketSize)
    val candidateIds = pairs
      .select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
    val shVerify = docs
      .join(candidateIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(Dedup.shingles(w)).as("shingle"))

    time("docs(planted corpus)")(docs)
    time("sigs(map-side signature)")(sigs)
    time("lsh pairs(band+bucket)")(pairs)
    time("shVerify(explode)")(shVerify)
    time("full minhashJaccard")(Dedup.minhashJaccard(docs, w, bands, maxBucketSize))
    time("full dedup_minhash")(Dedup.dedupMinhash(spark, dir))
    spark.stop()
  }
}
