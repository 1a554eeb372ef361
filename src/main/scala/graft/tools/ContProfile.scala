package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: stage-level wall timings for the containment miner at the
  * bench scale factor — times each prefix of the pipeline with the noop
  * sink so the increment isolates one stage (guide §1.4).
  */
object ContProfile {
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
    val w = 3; val tau = 0.9; val maxDf = 256; val minShared = 3

    def time(name: String)(df: => DataFrame): Unit = {
      // warm once, then min of 2
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[contprofile] $name%-28s min=${ts.drop(1).min}%6.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val docs = Dedup.plantedContainmentCorpus(spark, dir)
    // posting-side stages key on polyHash longs exactly like the
    // shipped containmentNearDups — string-keyed timings stopped
    // reflecting production when the hashed-postings change landed
    val hashed = (c: org.apache.spark.sql.Column) => graft.functions.MinhashHash.polyHashes(c)
    val sh = docs.select(col("doc_id"), explode(hashed(Dedup.shingles(w))).as("shingle"))
    val postings = docs
      .select(col("doc_id"), size(Dedup.shingles(w)).cast("long").as("n"),
        explode(hashed(Dedup.shingles(w))).as("shingle"))
    val hot = postings.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf).select(col("shingle"))
    val member = postings
      .join(broadcast(hot), Seq("shingle"), "left_anti")
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
      .filter(col("df") > 1 && col("df") <= maxDf)
    // the pre-hot-exclusion window shape, for A/B
    val memberNoHot = postings
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
      .filter(col("df") > 1 && col("df") <= maxDf)
    val prefix = member
      .withColumn("__rk",
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
      .filter(col("__rk") <= floor(lit(1.0d - tau) * col("n")) + lit(minShared.toLong))
      .select(col("doc_id"), col("shingle"))
    val cand0 = prefix.as("x")
      .join(member.select(col("doc_id"), col("shingle")).as("y").hint("merge"), Seq("shingle"))
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .select(
        least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"),
        col("shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(countDistinct(col("shingle")).as("n_shared"))

    // alternative df shapes
    val dfRel = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 1 && col("df") <= maxDf)
    val memberAgg = postings
      .join(dfRel.hint("shuffle_hash"), Seq("shingle"))
    val prefixAgg = memberAgg
      .withColumn("__rk",
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
      .filter(col("__rk") <= floor(lit(1.0d - tau) * col("n")) + lit(minShared.toLong))
      .select(col("doc_id"), col("shingle"))
    val candAgg = prefixAgg.as("x")
      .join(memberAgg.select(col("doc_id"), col("shingle")).as("y").hint("shuffle_hash"), Seq("shingle"))
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .select(
        least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"),
        col("shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(countDistinct(col("shingle")).as("n_shared"))

    time("docs")(docs)
    time("sh(explode)")(sh)
    time("member(hot-excl window)")(member)
    time("memberNoHot(df window)")(memberNoHot)
    time("memberAgg(count+join)")(memberAgg)
    time("prefix(rank window)")(prefix)
    time("prefixAgg")(prefixAgg)
    time("cand0(join+count)")(cand0)
    time("candAgg")(candAgg)
    time("full query")(Dedup.dedupContainment(spark, dir))
    spark.stop()
  }
}
