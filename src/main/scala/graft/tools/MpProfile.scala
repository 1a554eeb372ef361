package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: stage timings for ts_matrix_profile (noop sink, guide
  * §1.4) — which of PAA agg / subsequence window / pair join+min
  * actually costs the 2.8 s at sf0.1.
  */
object MpProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.operators.Timeseries

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[mpprofile] $name%-28s min=${ts.drop(1).min}%6.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val ts = graft.Tables.ts(spark, dir)
    val windowUs = 604800000000L
    val bucketUs = Timeseries.BucketUs
    val paa = ts
      .select(col("channel"),
        floor(col("t") / lit(windowUs)).cast("long").as("win"),
        floor((col("t") % lit(windowUs)) / lit(bucketUs)).cast("long").as("bucket"),
        col("v"))
      .groupBy(col("channel"), col("win"), col("bucket"))
      .agg(round(sum(col("v").cast("decimal(27,10)")).cast("double") / count(lit(1)), 9).as("paa"))

    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col("channel"), col("win")).orderBy(col("bucket"))
    val grid = paa
      .withColumn("a1", lead(col("paa"), 1).over(ord))
      .withColumn("a2", lead(col("paa"), 2).over(ord))
      .withColumn("a3", lead(col("paa"), 3).over(ord))
      .withColumn("b1", lead(col("bucket"), 1).over(ord))
      .withColumn("b2", lead(col("bucket"), 2).over(ord))
      .withColumn("b3", lead(col("bucket"), 3).over(ord))
      .filter(col("b1") === col("bucket") + 1 &&
        col("b2") === col("bucket") + 2 && col("b3") === col("bucket") + 3)
    val mu = (col("paa") + col("a1") + col("a2") + col("a3")) / 4.0
    val s2 = (col("paa") * col("paa") + col("a1") * col("a1") +
      col("a2") * col("a2") + col("a3") * col("a3")) / 4.0 - mu * mu
    val sig = sqrt(greatest(s2, lit(0.0)))
    val subs = grid
      .withColumn("__mu", mu).withColumn("__sig", sig)
      .filter(col("__sig") > 0.0)
      .select(col("channel"), col("win"), col("bucket").as("i"),
        round((col("paa") - col("__mu")) / col("__sig"), 9).as("z0"),
        round((col("a1") - col("__mu")) / col("__sig"), 9).as("z1"),
        round((col("a2") - col("__mu")) / col("__sig"), 9).as("z2"),
        round((col("a3") - col("__mu")) / col("__sig"), 9).as("z3"))
    val rhs = subs.select(col("channel"), col("win"), col("i").as("j"),
      col("z0").as("y0"), col("z1").as("y1"), col("z2").as("y2"), col("z3").as("y3"))
    val d2 = (col("z0") - col("y0")) * (col("z0") - col("y0")) +
      (col("z1") - col("y1")) * (col("z1") - col("y1")) +
      (col("z2") - col("y2")) * (col("z2") - col("y2")) +
      (col("z3") - col("y3")) * (col("z3") - col("y3"))
    val joined = subs.join(rhs, Seq("channel", "win"))
      .filter(abs(col("i") - col("j")) >= 4)
    val minAgg = joined
      .select(col("channel"), col("win"), col("i"),
        struct(round(sqrt(d2), 9).as("d"), col("j").as("j")).as("__dj"))
      .groupBy(col("channel"), col("win"), col("i"))
      .agg(min(col("__dj")).as("__nn"))
    val winOld = joined
      .select(col("channel"), col("win"), col("i"), col("j"), round(sqrt(d2), 9).as("__d"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("channel"), col("win"), col("i")).orderBy(col("__d"), col("j"))))
      .filter(col("__rn") === 1)

    val out = minAgg.select(col("channel"), col("win"), col("i"),
      col("__nn.j").as("nn_j"), round(col("__nn.d"), 6).as("mp"))

    time("raw scan")(ts)
    time("paa agg")(paa)
    time("subs(window+z)")(subs)
    time("pair join only")(joined)
    time("join+min(struct)")(minAgg)
    time("join+rownum window")(winOld)
    time("out+orderBy (2x tail)")(out.orderBy(col("channel"), col("win"), col("i")))
    time("out+persist+orderBy") {
      val p = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val r = p.orderBy(col("channel"), col("win"), col("i"))
      r
    }
    time("full matrix profile")(Timeseries.tsMatrixProfile(spark, dir))
    spark.stop()
  }
}
