package graft

class GraftSessionSpec extends SparkSpec {

  "GraftSession.builder" should "carry every engine convention into the session" in {
    // the shared test context already runs the extensions; getOrCreate
    // applies the builder's runtime confs onto it — capture and restore
    // them so this spec can't leak config into later suites
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val s = GraftSession.builder(shufflePartitions = 8).master("local[4]").getOrCreate()
      s.conf.get("spark.sql.session.timeZone") shouldBe "UTC"
      s.conf.get("spark.sql.legacy.parquet.nanosAsLong") shouldBe "true"
      s.conf.get("spark.sql.shuffle.partitions") shouldBe "8"
      // kernel SQL functions resolve in the session
      s.sql("SELECT vec_dot(array(1.0D, 2.0D), array(2.0D, 3.0D)) AS d")
        .collect()(0)
        .getDouble(0) shouldBe 8.0
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }
}
