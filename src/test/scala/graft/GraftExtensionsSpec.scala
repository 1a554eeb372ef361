package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class GraftExtensionsSpec extends AnyFlatSpec with Matchers {

  "GraftExtensions" should "inject vec_dot and winnow into a session built with the extensions" in {
    // force the base session to exist first so we share its SparkContext.
    // spark.sql.extensions is a static conf read at SparkContext creation,
    // so inside an already-running JVM the equivalent builder hook is
    // withExtensions — production sessions set
    // spark.sql.extensions=graft.GraftExtensions instead.
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession
      .builder()
      .master("local[2]")
      .withExtensions(new graft.GraftExtensions().apply(_))
      .getOrCreate()
    try {
      ext.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").collect()(0).getDouble(0) shouldBe 11.0
      val fps = ext.sql("SELECT winnow('abcdefghijklmnop', 4, 2) AS f").collect()(0).getSeq[Long](0)
      fps should not be empty
      fps.toSet shouldBe graft.functions.Winnow.fingerprints("abcdefghijklmnop", 4, 2).toSet
      ext
        .sql("SELECT word_shingles('a b c d', 3) AS s")
        .collect()(0)
        .getSeq[String](0) shouldBe Seq("a b c", "b c d")
      ext
        .sql("SELECT char_ngrams('abcd', 3) AS g")
        .collect()(0)
        .getSeq[String](0) shouldBe Seq("abc", "bcd")
      ext
        .sql("SELECT minhash_signature(word_shingles('a b c d', 3)) AS m")
        .collect()(0)
        .getSeq[Long](0) shouldBe graft.functions.MinhashHash
        .signature(Array("a b c", "b c d"))
        .toSeq
      ext
        .sql("SELECT simhash_signature(array('a', 'b')) AS s")
        .collect()(0)
        .getLong(0) shouldBe graft.functions.SimhashSig.signature(Array("a", "b"))
      val rep = ext
        .sql("SELECT repetition_stats('a a b') AS r")
        .selectExpr("r.n_words", "r.n_distinct_words", "r.n_bigrams", "r.n_distinct_bigrams", "r.max_bigram")
        .collect()(0)
      rep.toSeq shouldBe Seq(3L, 2L, 2L, 2L, 1L)
      val ce = ext
        .sql("SELECT char_entropy_stats('aab') AS c")
        .selectExpr("c.n_uniq_chars", "c.s_nanos")
        .collect()(0)
      // 'a'×2 contributes 2·round(ln 2, 9)·1e9 = 1386294362; 'b'×1 adds 0
      ce.toSeq shouldBe Seq(2L, 1386294362L)
      ext
        .sql("SELECT poly_hashes(array('ab', 'cd')) AS h")
        .collect()(0)
        .getSeq[Long](0) shouldBe Seq(
        graft.functions.MinhashHash.polyHash("ab"),
        graft.functions.MinhashHash.polyHash("cd")
      )
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  it should "derive p_bucket partition filters from plain t predicates" in {
    import org.apache.spark.sql.functions._
    val base = SparkSpec.session
    // write a small partitioned layout first (hour buckets)
    val bucketUs = 3600000000L
    val dir: String = java.nio.file.Files.createTempDirectory("graft-rule").toString
    graft.sources.TsLayout.write(
      Tables.ts(base, "/root/testdata/sf0.001").select("channel", "t", "v"),
      dir,
      bucketUs
    )
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession
      .builder()
      .master("local[2]")
      .withExtensions(new graft.GraftExtensions().apply(_))
      .getOrCreate()
    try {
      ext.conf.set("spark.graft.ts.bucketUs", bucketUs.toString)
      val start = 1704412800000000L
      val end = 1704499200000000L
      // user filters ONLY on t — no mention of p_bucket
      val q = ext.read.parquet(dir).filter(col("t") >= start && col("t") < end)
      val plan = q.queryExecution.executedPlan.toString
      plan should include regex """PartitionFilters: \[.*p_bucket.*>=.*"""
      // and results equal the raw-row answer with derived pruning
      // disabled (select away p_bucket so the rule cannot fire)
      val expected = base.read
        .parquet(dir)
        .select("channel", "t", "v")
        .filter(col("t") >= start && col("t") < end)
        .count()
      q.count() shouldBe expected
      expected should be > 0L
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  it should "prune two layouts of DIFFERENT widths correctly in one session" in {
    import org.apache.spark.sql.functions._
    val spark = SparkSpec.session // carries the extensions already
    val src = Tables.ts(spark, "/root/testdata/sf0.001").select("channel", "t", "v")
    val hourDir = java.nio.file.Files.createTempDirectory("graft-hour").toString
    val dayDir = java.nio.file.Files.createTempDirectory("graft-day").toString
    graft.sources.TsLayout.write(src, hourDir, bucketUs = 3600000000L)
    graft.sources.TsLayout.write(src, dayDir, bucketUs = graft.sources.TsLayout.DayUs)
    val start = 1704412800000000L
    val end = 1704499200000000L
    def pruned(dir: String) = {
      val q = spark.read.parquet(dir).filter(col("t") >= start && col("t") < end)
      val plan = q.queryExecution.executedPlan.toString
      plan should include regex """PartitionFilters: \[.*p_bucket.*>=.*"""
      q.count()
    }
    val truth = src.filter(col("t") >= start && col("t") < end).count()
    truth should be > 0L
    // each layout's marker drives its own bounds — a session-global
    // width would mis-prune one of the two to zero
    pruned(hourDir) shouldBe truth
    pruned(dayDir) shouldBe truth
  }
}
