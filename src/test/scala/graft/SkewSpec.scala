package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  "saltedJoin" should "produce exactly the plain join result on skewed data" in {
    // one hot key carrying 90% of rows
    val left = ((1 to 9000).map(i => ("hot", i)) ++ (1 to 1000).map(i => (s"k${i % 50}", i)))
      .toDF("key", "lv")
    val right = (Seq("hot") ++ (0 until 50).map(i => s"k$i")).zipWithIndex.toDF("key", "rv")

    val plain = left.join(right, Seq("key")).orderBy("key", "lv", "rv")
    val salted = Skew.saltedJoin(left, right, "key", salt = 8).orderBy("key", "lv", "rv")

    salted.columns.toSeq shouldBe plain.columns.toSeq
    salted.count() shouldBe plain.count()
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
  }

  it should "spread a hot key across salt partitions" in {
    val left = (1 to 8000).map(i => ("hot", i)).toDF("key", "lv")
    val salted = left.withColumn(
      "__salt",
      pmod(xxhash64(col("key"), col("lv")), lit(8L)).cast("int")
    )
    val counts = salted.groupBy("__salt").count().as[(Int, Long)].collect().toMap
    counts.size shouldBe 8
    // roughly uniform: no salt bucket holds more than 2x its share
    counts.values.max should be < (2 * 8000L / 8)
  }

  "saltedAgg" should "match the direct aggregation" in {
    val df = ((1 to 5000).map(i => ("hot", i.toDouble)) ++ (1 to 100).map(i => ("cold", i.toDouble)))
      .toDF("key", "v")
    val direct = df.groupBy("key").agg(sum("v").as("s"), count(lit(1)).as("n"))
    val salted = Skew.saltedAgg(
      df,
      "key",
      salt = 8,
      partials = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      combine = Seq(sum("ps").as("s"), sum("pn").as("n"))
    )
    salted.orderBy("key").collect() shouldBe direct.orderBy("key").collect()
  }
}
