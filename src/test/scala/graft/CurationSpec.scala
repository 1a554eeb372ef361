package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("source", lit("s")).withColumn("lang", lit("en"))

  "dsirWeights" should "rank target-like documents above off-target ones" in {
    // target slice (lang=en) speaks vocabulary A; off-target docs
    // speak vocabulary B. An unlabeled doc written in A must carry a
    // HIGHER importance weight than one written in B — that ordering
    // is the whole point of DSIR selection.
    val a = "the model trains on clean english text with many common words"
    val b = "zzq vvx wwk rrj ppl mmn bbv ccx ddz ffq"
    val corpus = (
      (1L to 5L).map(i => (i, a, "en")) ++
        (6L to 10L).map(i => (i, b, "xx")) ++
        Seq((11L, a, null.asInstanceOf[String]), (12L, b, null.asInstanceOf[String]))
    ).toDF("doc_id", "text", "lang")
    val got = Curation
      .dsirWeights(corpus, targetLang = "en", buckets = 512)
      .orderBy("doc_id")
      .as[(Long, Long, Double)]
      .collect()
    got.length shouldBe 12
    val w = got.map(r => r._1 -> r._3).toMap
    // the unlabeled A-doc scores like the target, the B-doc like raw
    w(11L) should be > w(12L)
    w(11L) should be > 0.0 // target-heavy features: p_t > p_r
    w(12L) should be < 0.0 // target never saw vocabulary B
  }

  it should "score through a broadcast model with no corpus self-join" in {
    // both models reduce to <= buckets rows before rejoining the
    // per-doc counts: the join must be broadcast, never sort-merge
    val df = Curation.trainDsir(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  "corpusFunnel" should "drop documents at exactly the stage that disqualifies them" in {
    // doc 1: clean english, survives everything. doc 2: gibberish ->
    // fails quality/language. doc 3: exact copy of doc 1 -> dies at
    // dedup (doc 1 is the survivor). doc 10: clean and unique but a
    // multiple of 10, so the planted eval derivation contaminates it.
    val good = "the cat and the dog are in the house with a friend of the family for a visit"
    val docs = Seq(
      (1L, good),
      (2L, "%%% ### !!! ???"),
      (3L, good),
      (10L, "a completely different clean sentence about the weather in the hills today with the sun out and the wind calm")
    ).toDF("doc_id", "text")
    val got = Curation
      .corpusFunnel(docs)
      .select("stage_name", "n_docs")
      .as[(String, Long)]
      .collect()
      .toList
    got shouldBe List(
      ("raw", 4L),
      ("quality", 3L), // doc 2 out (punctuation-only scores ~0)
      ("language", 3L),
      ("dedup", 2L), // doc 3 collapses into doc 1
      ("decontam", 1L) // doc 10's planted eval twin knocks it out
    )
  }

  it should "probe the eval grams through a broadcast join" in {
    val plan = Curation.corpusFunnelQ(spark, sfDir).queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  "piiScan" should "count and redact planted PII of every category" in {
    val df = docs(
      1L -> "contact alice.smith+test@example-mail.co and bob@site.org today",
      2L -> "ssn 123-45-6789 phone (555) 123-4567 ip 10.0.255.7 end",
      3L -> "no pii here at all",
      4L -> "dial 555-123-4567 or +1 555 234-5678"
    )
    val out = Curation.piiScan(df).orderBy("doc_id").collect()
    out(0).getAs[Long]("n_email") shouldBe 2L
    out(0).getAs[Long]("n_pii") shouldBe 2L
    out(1).getAs[Long]("n_ssn") shouldBe 1L
    out(1).getAs[Long]("n_phone") shouldBe 1L
    out(1).getAs[Long]("n_ip") shouldBe 1L
    out(2).getAs[Long]("n_pii") shouldBe 0L
    out(3).getAs[Long]("n_phone") shouldBe 2L
    // the redacted text itself (not just its hash) drops every match
    val red = df
      .select(col("doc_id"), Curation.redactedColumn(col("text")).as("r"))
      .orderBy("doc_id")
      .as[(Long, String)]
      .collect()
      .toMap
    red(1L) shouldBe "contact [EMAIL] and [EMAIL] today"
    red(2L) shouldBe "ssn [SSN] phone [PHONE] ip [IP] end"
    red(3L) shouldBe "no pii here at all"
    // an unchanged doc hashes to md5 of the original text
    Curation
      .piiScan(df)
      .filter(col("doc_id") === 3L)
      .select(col("redacted_md5"))
      .collect()(0)
      .getString(0) shouldBe
      df.filter(col("doc_id") === 3L).select(md5(col("text"))).collect()(0).getString(0)
  }

  "sampleStratified" should "keep exactly k per stratum, deterministically" in {
    val df = (1L to 100L)
      .map(i => (i, s"text $i", if (i % 2 == 0) "web" else "book", if (i % 3 == 0) "de" else "en"))
      .toDF("doc_id", "text", "source", "lang")
    val out = Curation.sampleStratified(df, k = 5)
    out.groupBy("source", "lang").count().collect().foreach(_.getLong(2) shouldBe 5L)
    // rank is 1..k within each stratum
    out.select(max(col("rk"))).collect()(0).getLong(0) shouldBe 5L
    // deterministic: a second run picks the identical ids
    val a = out.orderBy("source", "lang", "rk").select("doc_id").as[Long].collect()
    val b = Curation
      .sampleStratified(df, k = 5)
      .orderBy("source", "lang", "rk")
      .select("doc_id")
      .as[Long]
      .collect()
    a.toSeq shouldBe b.toSeq
  }

  "trainMix" should "dedup before quality-filtering and roll up per (split, lang)" in {
    // three exact duplicates (differing only in whitespace) + one
    // distinct doc; the survivor is the min doc_id and represents the
    // group, so the manifest counts the group once
    val good =
      "the cat and the dog are in the house with a friend of the family for a visit to the park " * 3
    val df = docs(
      10L -> good,
      11L -> good.replace(" ", "  "), // same normalized text
      12L -> good,
      20L -> ("der hund und die katze ist nicht ein haus mit für von zu " * 4)
    )
    val out = Curation.trainMix(df, minQuality = 0.3).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    total shouldBe 2L // one survivor of {10,11,12} + doc 20
    // language composition survives the rollup
    val langs = out.map(_.getAs[String]("lang_pred")).toSet
    langs should contain("en")
    langs should contain("de")
    // token budget is the survivors' token count, not the group's sum
    val enRow = out.find(_.getAs[String]("lang_pred") == "en").get
    val enTokens = graft.operators.TextAnalysis
      .tokenCounts(df.filter(col("doc_id") === 10L))
      .collect()(0)
      .getAs[Long]("n_re_tokens")
    enRow.getAs[Long]("total_tokens") shouldBe enTokens
  }

  it should "drop below-threshold survivors entirely" in {
    val df = docs(1L -> "zzz qqq xxx", 2L -> ("the cat and a dog of the house " * 10))
    val out = Curation.trainMix(df, minQuality = 0.5).collect()
    out.map(_.getAs[Long]("n_docs")).sum shouldBe 1L
  }

  "decontaminate" should "flag exactly the docs sharing a w-gram with the eval set" in {
    val w10 = (1 to 10).map(i => s"w$i").mkString(" ") // w1..w10
    val corpus = docs(
      1L -> w10, // shares the 8-gram w2..w9 with the eval excerpt
      2L -> "totally different words here that never overlap anything at all"
    )
    val eval = docs(100L -> (2 to 9).map(i => s"w$i").mkString(" ")) // verbatim excerpt
    val out = Curation.decontaminate(corpus, eval, w = 8).collect()
    out.length shouldBe 1
    out(0).getAs[Long]("doc_id") shouldBe 1L
    out(0).getAs[Long]("n_grams") shouldBe 3L // 10 words → 3 distinct 8-grams
    out(0).getAs[Long]("n_hit") shouldBe 1L
    out(0).getAs[Double]("contam_frac") shouldBe 0.333333 +- 1e-9
  }

  it should "hit short documents via the whole-text shingle fallback" in {
    val short = "only five words right here"
    val corpus = docs(1L -> short, 2L -> "five other words sit here")
    val eval = docs(100L -> short)
    val out = Curation.decontaminate(corpus, eval, w = 8).collect()
    out.map(_.getAs[Long]("doc_id")).toSeq shouldBe Seq(1L)
    out(0).getAs[Double]("contam_frac") shouldBe 1.0
  }

  "classifierTrajectory" should "drive loss down to a separating model on separable embeddings" in {
    // positives (label 0) point along +e1, negatives along -e1
    val emb = (1 to 40).map { i =>
      val lab = if (i % 2 == 0) 0 else 3
      val base = if (lab == 0) 1.0f else -1.0f
      (i.toLong, Array(base, 0.1f * (i % 5), -0.2f * (i % 3)), lab)
    }.toDF("vec_id", "embedding", "label")
    val tr = Curation
      .classifierTrajectory(emb, posLabel = 0, epochs = 5, lr = 2.0)
      .orderBy("epoch")
      .collect()
    val losses = tr.map(_.getAs[Double]("loss"))
    // epoch 1 is the all-zero model: loss = ln 2 on any data
    losses.head shouldBe 0.693147 +- 1e-6
    losses.sliding(2).foreach(p => p(1) should be < p(0))
    tr.last.getAs[Double]("acc") shouldBe 1.0
  }

  "temperatureMix" should "flatten the source distribution toward uniform as alpha drops" in {
    import graft.operators.Curation
    val docs = (
      (1 to 900).map(i => (i.toLong, s"doc $i", "web")) ++
        (901 to 990).map(i => (i.toLong, s"doc $i", "books")) ++
        (991 to 1000).map(i => (i.toLong, s"doc $i", "code"))
    ).toDF("doc_id", "text", "source")
    def weights(alpha: Double) = Curation
      .temperatureMix(docs, alpha = alpha, budget = 1000L)
      .select($"source", $"weight")
      .as[(String, Double)]
      .collect()
      .toMap
    val w1 = weights(1.0) // raw proportions
    val w03 = weights(0.3)
    w1("web") shouldBe 0.9 +- 1e-6
    // temperature sampling lifts the tail and shrinks the head
    w03("web") should be < w1("web")
    w03("code") should be > w1("code")
    w03("books") should be > w1("books")
    // weights are a distribution and targets spend ~the whole budget
    w03.values.sum shouldBe 1.0 +- 1e-6
    val targets = Curation
      .temperatureMix(docs, alpha = 0.3, budget = 1000L)
      .select($"target_docs")
      .as[Long]
      .collect()
    targets.sum.toDouble shouldBe 1000.0 +- 2.0
  }

  "curriculumStages" should "assign length quartiles monotonically with every stage populated" in {
    // word counts 1..8: quantile_cont cuts at 2.75 / 4.5 / 6.25
    val docs = (1L to 8L)
      .map(i => (i, Seq.fill(i.toInt)("w").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val got = Curation
      .curriculumStages(docs)
      .orderBy("doc_id")
      .select($"n_words", $"stage")
      .as[(Long, Long)]
      .collect()
      .toList
    got shouldBe List(
      (1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L),
      (5L, 3L), (6L, 3L), (7L, 4L), (8L, 4L)
    )
  }

  "weightedSample" should "deterministically favor heavy documents" in {
    // 50 long (100 words) vs 50 short (2 words): ES keys ln(u)/w pull
    // long docs toward 0, so the top-20 is dominated by them — and the
    // md5-derived u makes the whole draw reproducible
    val docs = (1L to 100L)
      .map(i => (i, Seq.fill(if (i <= 50) 100 else 2)("w").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val sel = Curation.weightedSample(docs, m = 20).collect()
    sel.length shouldBe 20
    sel.count(_.getAs[Long]("n_words") == 100L) should be >= 15
    // bit-identical on re-execution
    val again = Curation.weightedSample(docs, m = 20).collect()
    sel.map(_.toString).toList shouldBe again.map(_.toString).toList
  }

  "budgetAllocation" should "allocate by token-grain temperature weights and flag over-cap epochs" in {
    // source big: 1 doc × 8 words; source tiny: 1 doc × 2 words.
    // α=0.3 flattens: big gets less than its 80% token share but more
    // than 50%; the tiny source's allocation exceeds 4 epochs → excess
    val docs = Seq(
      (1L, "w w w w w w w w", "big"),
      (2L, "w w", "tiny")
    ).toDF("doc_id", "text", "source")
    val rows = Curation
      .budgetAllocation(docs, alpha = 0.3, budgetTokens = 100L, maxEpochs = 4.0)
      .orderBy("source")
      .collect()
    val big = rows(0)
    val tiny = rows(1)
    big.getAs[Long]("n_tokens") shouldBe 8L
    tiny.getAs[Long]("n_tokens") shouldBe 2L
    val wBig = big.getAs[Double]("weight")
    wBig should be > 0.5
    wBig should be < 0.8
    (wBig + tiny.getAs[Double]("weight")) shouldBe 1.0 +- 1e-6
    // epochs = alloc / available, excess only beyond the 4-epoch cap
    big.getAs[Double]("epochs") shouldBe big.getAs[Long]("alloc_tokens").toDouble / 8.0 +- 1e-6
    tiny.getAs[Long]("alloc_tokens").toDouble should be > 8.0 // > 4 epochs × 2 tokens
    tiny.getAs[Long]("excess_tokens") shouldBe tiny.getAs[Long]("alloc_tokens") - 8L
    big.getAs[Long]("excess_tokens") shouldBe math.max(big.getAs[Long]("alloc_tokens") - 32L, 0L)
  }

  it should "never plan a corpus-scale window or global sort for the staging" in {
    val docs = Seq((1L, "a b c", "s")).toDF("doc_id", "text", "source")
    val plan = Curation.curriculumStages(docs).queryExecution.executedPlan.toString
    // boundaries travel as ONE broadcast row; labels are map-side math
    plan should not include "Window"
    plan should include("BroadcastNestedLoopJoin")
  }

  "trainSplit" should "assign stable hash splits with roughly 80/10/10 mass" in {
    import spark.implicits._
    def docs(n: Int) = (0L until n.toLong).map(i => (i, s"w$i word", "s")).toDF("doc_id", "text", "source")
    val big = graft.operators.Curation.trainSplit(docs(2000)).collect()
    val byS = big.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    byS.keySet shouldBe Set("train", "val", "test")
    byS("train").toDouble / 2000 shouldBe 0.8 +- 0.05
    byS("val").toDouble / 2000 shouldBe 0.1 +- 0.03
    byS("test").toDouble / 2000 shouldBe 0.1 +- 0.03
    big.map(_.getAs[Double]("doc_frac")).sum shouldBe 1.0 +- 1e-5
    // growth stability: the first 1000 docs keep their split when the
    // corpus doubles (hash of doc_id only — no repartition migration)
    val h = org.apache.spark.sql.functions.expr(
      graft.operators.Dedup.md5Prefix60Sql("cast(doc_id as string)")
    ) % 100L
    val splits1 = docs(1000).select($"doc_id", h.as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val splits2 = docs(2000).select($"doc_id", h.as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    splits1.foreach { case (id, hv) => splits2(id) shouldBe hv }
  }
}
