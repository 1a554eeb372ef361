package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  "tokenCounts" should "count whitespace and regex tokens" in {
    val docs = Seq((1L, "Hello world, 42 times!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(docs).head()
    r.getAs[Long]("n_ws_tokens") shouldBe 4L
    // hello | world | , | 42 | times | !
    r.getAs[Long]("n_re_tokens") shouldBe 6L
    r.getAs[Long]("n_chars") shouldBe 22L
  }

  "qualityScores" should "rate clean prose above punctuation soup" in {
    val docs = Seq(
      (1L, "the cat sat on the mat and it was good for a while"),
      (2L, "!!! ??? ;;; ... !!!")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.qualityScores(docs).orderBy("doc_id").collect()
    rows(0).getAs[Double]("quality") should be > rows(1).getAs[Double]("quality")
    rows(0).getAs[Double]("stop_ratio") should be > 0.3
    rows(1).getAs[Double]("punct_ratio") should be > 0.5
  }

  "langId" should "classify real sentences in all five languages" in {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it was good"),
      (2L, "der hund ist nicht zu hause und ich bin mit der katze"),
      (3L, "le chat est dans la maison et les enfants sont pour la plage"),
      (4L, "el perro es un animal que vive con las personas por la casa"),
      (5L, "今天天气很好我们一起去公园散步吧")
    ).toDF("doc_id", "text")
    val preds = TextAnalysis
      .langId(docs)
      .select($"doc_id", $"lang_pred")
      .as[(Long, String)]
      .collect()
      .toMap
    preds shouldBe Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "zh")
  }

  "chunkDocuments" should "cover every word with the declared overlap and a short tail" in {
    val words = (1 to 150).map(i => s"w$i")
    val docs = Seq((1L, words.mkString(" ")), (2L, "tiny doc"), (3L, "   "), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = TextAnalysis
      .chunkDocuments(docs, window = 64, stride = 48)
      .orderBy($"doc_id", $"chunk_id")
      .collect()
    // blank/null docs chunk to nothing
    rows.map(_.getAs[Long]("doc_id")).distinct.sorted shouldBe Array(1L, 2L)
    val d1 = rows.filter(_.getAs[Long]("doc_id") == 1L)
    // starts at 0, 48, 96, 144 — ceil(150/48) = 4 chunks
    d1.map(_.getAs[Long]("start_word")) shouldBe Array(0L, 48L, 96L, 144L)
    d1.map(_.getAs[Long]("chunk_id")) shouldBe Array(0L, 1L, 2L, 3L)
    // full windows until the tail, which keeps the 150 - 144 = 6 leftover words
    d1.map(_.getAs[Long]("n_words")) shouldBe Array(64L, 64L, 54L, 6L)
    // every word index is covered: union of [start, start + n_words) = [0, 150)
    d1.flatMap(r => r.getAs[Long]("start_word") until (r.getAs[Long]("start_word") + r.getAs[Long]("n_words")))
      .distinct.sorted shouldBe (0L until 150L).toArray
    // single-chunk doc: whole text, one row
    val d2 = rows.filter(_.getAs[Long]("doc_id") == 2L)
    d2.map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("n_words"))) shouldBe Array((0L, 2L))
  }

  it should "give identical chunks identical hashes and chunk map-side (no exchange before the explode)" in {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "alpha beta delta"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, window = 8, stride = 8)
    val hashes = out.select($"doc_id", $"chunk_hash").as[(Long, Long)].collect().toMap
    hashes(1L) shouldBe hashes(2L)
    hashes(1L) should not be hashes(3L)
    // zero-shuffle plan: chunking is a pure projection + generator
    out.queryExecution.executedPlan.toString should not include "Exchange"
  }

  "Winnow.fingerprints" should "compute rolling hashes identical to direct rehash (win=1 keeps every gram)" in {
    import graft.functions.Winnow
    val s = "the quick brown fox jumps over the lazy dog 0123456789"
    val k = 8
    // direct (non-rolling) recomputation of each k-gram's polynomial
    // hash mod 2^61-1 via BigInt — independent of the kernel's
    // multiplyHigh fold
    def direct(g: String): Long = {
      val P = BigInt((1L << 61) - 1)
      g.foldLeft(BigInt(0))((h, c) => (h * BigInt(0x100000001b3L) + BigInt(c.toInt)) mod P).toLong
    }
    val expected = (0 to s.length - k).map(i => direct(s.substring(i, i + k))).distinct
    Winnow.fingerprints(s, k, 1).toSeq shouldBe expected
  }

  it should "select per-window minima (deque) matching a naive windowed min" in {
    import graft.functions.Winnow
    val s = new scala.util.Random(7).alphanumeric.take(200).mkString
    val k = 5
    val win = 4
    val all = Winnow.fingerprints(s, k, 1)
    val naive = (0 to all.length - win).map(j => all.slice(j, j + win).min).distinct.sorted
    Winnow.fingerprints(s, k, win).sorted shouldBe naive
  }

  "fingerprints" should "share fingerprints for docs sharing long substrings, none for disjoint alphabets" in {
    val shared = "the winnowing algorithm selects minimum hashes per window"
    val docs = Seq(
      (1L, s"prefix one $shared suffix one"),
      (2L, s"completely different start $shared and end"),
      (3L, "zzzz qqqq xxxx vvvv kkkk jjjj wwww")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis
      .fingerprints(docs, k = 8, win = 4)
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (id, xs) => id -> xs.map(_._2).toSet }

    // guarantee: any shared substring of length >= k + win - 1 shares a fingerprint
    (fps(1L) intersect fps(2L)) should not be empty
    (fps(1L) intersect fps(3L)) shouldBe empty
  }

  "corpusStats" should "sum to the corpus totals per (source, lang)" in {
    val docs = Tables.documents(spark, sfDir)
    val st = TextAnalysis
      .corpusStats(docs)
      .select($"n_docs", $"total_chars", $"min_chars", $"max_chars", $"avg_chars")
      .as[(Long, Long, Long, Long, Double)]
      .collect()
    st.map(_._1).sum shouldBe docs.count()
    st.map(_._2).sum shouldBe docs.agg(sum($"n_chars")).as[Long].collect()(0)
    st.foreach { case (n, total, mn, mx, avg) =>
      mn should be <= mx
      avg should (be >= mn.toDouble - 1e-6 and be <= mx.toDouble + 1e-6)
      total should be >= n * mn
    }
  }

  "tokenPerplexity" should "score rare-word docs above common-word docs" in {
    // corpus of 6 docs of common words + 1 doc of hapaxes: the model
    // assigns the common words high probability, so the hapax doc's
    // mean -ln P must dominate
    val common = "the cat sat on the mat"
    val docs = ((1L to 6L).map(i => (i, common)) :+ (7L, "qzx wvj plk mnb")).toDF("doc_id", "text")
    val got = TextAnalysis
      .tokenPerplexity(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Double)]
      .collect()
    got.length shouldBe 7
    got.take(6).foreach { case (_, n, nll) =>
      n shouldBe 6L
      nll shouldBe got.head._3 // identical docs, identical score
    }
    got.last._2 shouldBe 4L
    got.last._3 should be > got.head._3 * 2
    // exact value for the hapax doc: every word has count 1 of 40
    got.last._3 shouldBe (math.log(40.0) +- 1e-5)
  }

  "ngramCounts" should "count positional occurrences per order and keep top-k" in {
    // "a b a b a": unigrams a×3 b×2; bigrams "a b"×2 "b a"×2 (tie ->
    // gram order); trigrams "a b a"×2 "b a b"×1
    val docs = Seq((1L, "a b a b a"), (2L, "c")).toDF("doc_id", "text")
    val got = TextAnalysis
      .ngramCounts(docs, k = 2)
      .orderBy("n", "rank")
      .as[(Long, Long, String, Long)]
      .collect()
      .toList
    got shouldBe List(
      (1L, 1L, "a", 3L),
      (1L, 2L, "b", 2L),
      (2L, 1L, "a b", 2L),
      (2L, 2L, "b a", 2L),
      (3L, 1L, "a b a", 2L),
      (3L, 2L, "b a b", 1L)
    )
  }

  "repetitionSignals" should "measure within-document duplication exactly" in {
    val df = Seq(
      (1L, "a a b"),          // 3 words / 2 distinct; bigrams "a a","a b" all distinct
      (2L, "x y x y x"),      // 5/2 words; bigrams: "x y"×2, "y x"×2 → 4/2
      (3L, "solo"),           // one word: no bigrams → null bigram ratios
      (4L, "   ")             // whitespace-only: dropped entirely
    ).toDF("doc_id", "text")
    val out = TextAnalysis
      .repetitionSignals(df)
      .orderBy("doc_id")
      .collect()
    out.length shouldBe 3
    out(0).getAs[Long]("n_words") shouldBe 3L
    out(0).getAs[Double]("dup_word_frac") shouldBe 0.333333 +- 1e-9
    out(0).getAs[Long]("n_bigrams") shouldBe 2L
    out(0).getAs[Double]("dup_bigram_frac") shouldBe 0.0
    out(0).getAs[Double]("top_bigram_frac") shouldBe 0.5
    out(1).getAs[Double]("dup_word_frac") shouldBe 0.6
    out(1).getAs[Double]("dup_bigram_frac") shouldBe 0.5
    out(1).getAs[Double]("top_bigram_frac") shouldBe 0.5
    out(2).getAs[Long]("n_words") shouldBe 1L
    out(2).getAs[Long]("n_bigrams") shouldBe 0L
    out(2).isNullAt(out(2).fieldIndex("dup_bigram_frac")) shouldBe true
    out(2).isNullAt(out(2).fieldIndex("top_bigram_frac")) shouldBe true
  }

  "corpusDrift" should "score identical slices at zero and disjoint slices at ln 2" in {
    val df = Seq(
      (1L, "alpha beta gamma", "x"),
      (2L, "alpha beta gamma", "y"), // y identical to x
      (3L, "delta epsilon zeta", "z") // z disjoint from both
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis
      .corpusDrift(df)
      .collect()
      .map(r => (r.getAs[String]("la"), r.getAs[String]("lb")) -> r.getAs[Double]("js_divergence"))
      .toMap
    out(("x", "y")) shouldBe 0.0
    out(("x", "z")) shouldBe 0.693147 +- 1e-6 // ln 2: maximal JS divergence
    TextAnalysis
      .corpusDrift(df)
      .filter($"la" === "x" && $"lb" === "y")
      .select($"n_shared_words")
      .as[Long]
      .collect()(0) shouldBe 3L
  }

  "entropyScores" should "give ln k for uniform symbols, 0 for constant, nulls at edges" in {
    val docs = Seq(
      (1L, "aabb"), // chars: a,a,b,b (+0 spaces) → char H = ln 2
      (2L, "x x x x"), // one distinct word → word H = 0
      (3L, "u v w z"), // 4 uniform words → word H = ln 4
      (4L, "   "),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.entropyScores(docs).orderBy($"doc_id").collect()
    rows(0).getAs[Double]("char_entropy") shouldBe math.log(2) +- 1e-6
    rows(1).getAs[Double]("word_entropy") shouldBe 0.0 +- 1e-12
    rows(1).getAs[Long]("n_words") shouldBe 4L
    rows(1).getAs[Long]("n_uniq_words") shouldBe 1L
    rows(2).getAs[Double]("word_entropy") shouldBe math.log(4) +- 1e-6
    // blank text: zero-length normalized form → null char entropy, no words
    rows(3).getAs[Long]("n_chars") shouldBe 0L
    rows(3).isNullAt(rows(3).fieldIndex("char_entropy")) shouldBe true
    rows(3).getAs[Long]("n_words") shouldBe 0L
    // null text: everything char-side null, word-side zeroed
    rows(4).isNullAt(rows(4).fieldIndex("n_chars")) shouldBe true
    rows(4).getAs[Long]("n_words") shouldBe 0L
  }

  "gopherRules" should "pass clean prose and flag each rule violation separately" in {
    val longClean =
      ("the data must be clean and ready to ship with care " * 4).trim // 44 words, all rules ok
    val docs = Seq(
      (1L, longClean),
      (2L, "the cat sat to rest"), // too few words → r_words false
      (3L, ("#### " * 30 + "the fox went to sleep and that was all of it with haste " +
        "because every animal deserves rest after a long day")), // symbol soup → r_symbol false
      (4L, (1 to 30).map(_ => "12345").mkString(" ")), // numeric words → r_alpha, r_stop false
      (5L, (1 to 30).map(_ => "ab").mkString(" ")) // mean word length 2 < 3 → r_wordlen false
    ).toDF("doc_id", "text")
    val rows =
      TextAnalysis.gopherRules(docs).orderBy($"doc_id").collect()
    rows(0).getAs[Boolean]("pass") shouldBe true
    rows(1).getAs[Boolean]("r_words") shouldBe false
    rows(2).getAs[Boolean]("r_symbol") shouldBe false
    rows(2).getAs[Boolean]("r_words") shouldBe true
    rows(3).getAs[Boolean]("r_alpha") shouldBe false
    rows(3).getAs[Boolean]("r_stop") shouldBe false
    rows(4).getAs[Boolean]("r_wordlen") shouldBe false
    rows.drop(1).foreach(r => r.getAs[Boolean]("pass") shouldBe false)
  }

  "c4Rules" should "apply each line and document gate separately" in {
    // five terminal-punctuated 3+-word lines → clean doc with 5 sentences
    val clean = (1 to 5).map(i => s"this is good sentence number $i.").mkString("\n")
    val docs = Seq(
      (1L, clean),
      // line gates: <3 words / no terminal punct / javascript mention — all dropped
      (2L, "too short.\nthis line has no terminal punctuation\n" +
        "please enable javascript to continue.\n" + clean),
      (3L, clean + "\nlorem ipsum dolor sit amet."), // document gate: placeholder text
      (4L, clean + "\nfunction f() { return 1; }"), // document gate: curly brace
      (5L, "one good sentence here.\nand a second one here."), // < 5 sentences
      (6L, null.asInstanceOf[String]) // null text dropped entirely
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.c4Rules(docs).orderBy($"doc_id").collect()
    rows should have length 5
    rows(0).getAs[Boolean]("pass") shouldBe true
    rows(0).getAs[Long]("n_lines") shouldBe 5L
    rows(0).getAs[Long]("n_kept_lines") shouldBe 5L
    rows(0).getAs[Long]("n_sentences") shouldBe 5L
    rows(0).getAs[Double]("kept_ratio") shouldBe 1.0 +- 1e-9
    // doc 2: the three bad lines are dropped, the clean tail survives
    rows(1).getAs[Long]("n_lines") shouldBe 8L
    rows(1).getAs[Long]("n_kept_lines") shouldBe 5L
    rows(1).getAs[Boolean]("pass") shouldBe true
    rows(2).getAs[Boolean]("has_lorem") shouldBe true
    rows(2).getAs[Boolean]("pass") shouldBe false
    rows(3).getAs[Boolean]("has_brace") shouldBe true
    rows(3).getAs[Boolean]("pass") shouldBe false
    rows(4).getAs[Long]("n_sentences") shouldBe 2L
    rows(4).getAs[Boolean]("pass") shouldBe false
  }

  "c4Rules" should "stay a zero-shuffle projection" in {
    val plan = TextAnalysis
      .c4Rules(Tables.documents(spark, sfDir))
      .queryExecution
      .executedPlan
    import org.apache.spark.sql.execution.exchange.Exchange
    plan.collect { case e: Exchange => e } shouldBe empty
  }

  "finewebRules" should "measure each repetition signal on planted docs by hand" in {
    val cleanText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dupLines = "same line here\nsame line here\nsame line here\nother line"
    // "big cat" appears 3 times over 8 words (24 word-chars): repeated
    // occurrences cover (3-1)*6 = 12 of them
    val topBigram = "big cat big cat big cat and dog"
    // a 6-word doc whose single 5-gram window repeats: "a b c d e a b c d e"
    // has 5-grams at offsets 1..6; "a b c d e" occurs twice
    val dupFive = "a b c d e a b c d e"
    val docs = Seq(
      (1L, cleanText),
      (2L, dupLines),
      (3L, topBigram),
      (4L, dupFive)
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.finewebRules(docs).orderBy("doc_id").collect()

    rows(0).getAs[Double]("dup_line_frac") shouldBe 0.0
    rows(0).getAs[Double]("top2_char_frac") shouldBe 0.0
    rows(0).getAs[Double]("dup5_char_frac") shouldBe 0.0
    rows(0).getAs[Boolean]("pass") shouldBe true

    // 4 lines, 2 distinct → dup fraction 2/4; dup chars = 2 repeats of
    // the 14-char line over 4 lines' 54-3=51... chars = 14*3+10 = 52;
    // dup chars 28 of 52
    rows(1).getAs[Long]("n_lines") shouldBe 4L
    rows(1).getAs[Double]("dup_line_frac") shouldBe 0.5
    rows(1).getAs[Double]("dup_line_char_frac") shouldBe 0.538462 +- 1e-9
    rows(1).getAs[Boolean]("pass") shouldBe false

    // top bigram "big cat": 3 occurrences, 6 chars sans space, word
    // chars = 8*3 = 24 → (3-1)*6/24 = 0.5
    rows(2).getAs[String]("top2_gram") shouldBe "big cat"
    rows(2).getAs[Double]("top2_char_frac") shouldBe 0.5
    rows(2).getAs[Boolean]("pass") shouldBe false

    // "a b c d e" duplicated once: (2-1)*5 chars over 10 chars = 0.5
    rows(3).getAs[Double]("dup5_char_frac") shouldBe 0.5
    rows(3).getAs[Boolean]("pass") shouldBe false
  }

  "bigramPerplexity" should "score interpolated bigram nats by hand and exclude sub-bigram docs" in {
    // bigrams: (a,b) x2, (a,c) x1; c(a.) = 3; unigram-w2: b=2, c=1, T=3
    // P(b|a) = .75*(2/3) + .25*(2/3) = 2/3; P(c|a) = 1/3
    val docs = Seq(
      (1L, "a b"),
      (2L, "a b"),
      (3L, "a c"),
      (4L, "z") // no bigram: excluded
    ).toDF("doc_id", "text")
    val out = TextAnalysis
      .bigramPerplexity(docs)
      .orderBy("doc_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_bigrams"), r.getAs[Double]("nll2")))
      .toMap
    out.keySet shouldBe Set(1L, 2L, 3L)
    out(1L)._1 shouldBe 1L
    out(1L)._2 shouldBe (-math.log(2.0 / 3.0) +- 1e-6)
    out(3L)._2 shouldBe (-math.log(1.0 / 3.0) +- 1e-6)
    // the rarer transition scores strictly higher than the common one
    out(3L)._2 should be > out(1L)._2
  }

  "finewebRules" should "stay a zero-shuffle projection" in {
    val plan = TextAnalysis
      .finewebRules(Tables.documents(spark, sfDir))
      .queryExecution
      .executedPlan
    import org.apache.spark.sql.execution.exchange.Exchange
    plan.collect { case e: Exchange => e } shouldBe empty
  }

  "codeDetect" should "route code to code and leave prose, indented quotes and null text alone" in {
    val scalaCode =
      """def add(a: Int, b: Int): Int = {
        |  val s = a + b;
        |  return s;
        |}""".stripMargin
    val prose = "the quick brown fox jumps over the lazy dog and keeps going\n" +
      "until it reaches the river where it stops to rest for a while."
    // poetry-style indentation alone must NOT classify as code
    val indentedQuote = "  roses are red\n  violets are blue\n  sugar is sweet\n  and so are you"
    val docs = Seq(
      (1L, scalaCode),
      (2L, prose),
      (3L, indentedQuote),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.codeDetect(docs).orderBy($"doc_id").collect()
    rows should have length 3
    rows(0).getAs[Boolean]("is_code") shouldBe true
    rows(0).getAs[Double]("semi_per_line") should be > 0.2
    rows(0).getAs[Double]("brace_per_line") should be > 0.5
    rows(1).getAs[Boolean]("is_code") shouldBe false
    rows(1).getAs[Double]("kw_per_line") shouldBe 0.0 +- 1e-12
    rows(2).getAs[Boolean]("is_code") shouldBe false
    rows(2).getAs[Double]("indent_frac") shouldBe 1.0 +- 1e-12
  }

  "codeDetect" should "stay a zero-shuffle projection" in {
    val plan = TextAnalysis
      .codeDetect(Tables.documents(spark, sfDir))
      .queryExecution
      .executedPlan
    import org.apache.spark.sql.execution.exchange.Exchange
    plan.collect { case e: Exchange => e } shouldBe empty
  }

  "conditionalEntropy" should "zero out a deterministic chain and match the chain rule" in {
    def mix(x: Long): Int = {
      var z = x * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      (((z ^ (z >>> 27)) >>> 11) % 4).toInt
    }
    val syms = Vector("aa", "bb", "cc", "dd")
    // det: a fixed cycle -> every prefix predicts its successor exactly
    val det = (0 until 400).map(i => syms(i % 4)).mkString(" ")
    // rnd: hashed draws -> knowing the prefix buys (almost) nothing
    val rnd = (0 until 400).map(i => syms(mix(i.toLong))).mkString(" ")
    val docs = Seq((1L, "det", det), (2L, "rnd", rnd)).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.conditionalEntropy(docs).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    out("det").getAs[Double]("h_cond") shouldBe 0.0 +- 1e-9
    out("det").getAs[Double]("h_prefix") shouldBe math.log(4) +- 1e-3
    out("det").getAs[Long]("n_pairs") shouldBe 4L
    // random: conditional entropy stays within a few percent of the
    // prefix marginal (context is uninformative)
    val r = out("rnd")
    r.getAs[Double]("h_cond") should be > 0.9 * r.getAs[Double]("h_prefix")
    // chain rule holds on the emitted triple: H(W1,W2) = H(W1) + H(W2|W1)
    Seq(out("det"), r).foreach { row =>
      row.getAs[Double]("h_joint") shouldBe
        (row.getAs[Double]("h_prefix") + row.getAs[Double]("h_cond")) +- 1e-4
    }
  }

  "gopherRules" should "stay a zero-shuffle projection" in {
    val plan = TextAnalysis
      .gopherRules(Tables.documents(spark, sfDir))
      .queryExecution
      .executedPlan
    import org.apache.spark.sql.execution.exchange.Exchange
    plan.collect { case e: Exchange => e } shouldBe empty
  }

  "deterministicSplit" should "assign stable, roughly-proportional buckets" in {
    val docs = Tables.documents(spark, sfDir)
    val s1 = TextAnalysis.deterministicSplit(docs).as[(Long, String)].collect().toMap
    val s2 = TextAnalysis.deterministicSplit(docs).as[(Long, String)].collect().toMap
    s1 shouldBe s2 // no RNG, no row-order dependence
    val n = s1.size.toDouble
    val frac = s1.values.groupBy(identity).map { case (k, v) => k -> v.size / n }
    frac("train") should (be >= 0.70 and be <= 0.90)
    frac.getOrElse("val", 0.0) should be <= 0.20
    frac.getOrElse("test", 0.0) should be <= 0.20
  }

  "zipfFit" should "recover the slope of a planted power-law spectrum" in {
    // freq(word_k) = 2^(7-k): a perfect y = ln(128) + slope_k·x fit
    // does NOT exist (x = ln rank is not linear in k), so compare
    // against a driver-side OLS over the same (x, y) points
    val words = (1 to 7).flatMap(k => Seq.fill(1 << (7 - k))(s"w$k"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val row = TextAnalysis.zipfFit(docs).collect().head
    row.getAs[Long]("n_words") shouldBe 7L
    val pts = (1 to 7).map(k => (math.log(k.toDouble), math.log((1 << (7 - k)).toDouble)))
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row.getAs[Double]("slope") shouldBe slope +- 1e-4
    row.getAs[Double]("intercept") shouldBe (sy - slope * sx) / n +- 1e-4
    // a frequency spectrum decaying by halves is steeply Zipf-like
    slope should be < -1.0
  }

  "vocabApprox" should "stay within the sketch's error bound of the exact vocabulary" in {
    val docs = Tables.documents(spark, sfDir)
    val approx = TextAnalysis.vocabApprox(docs, rsd = 0.02).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("vocab_approx")).toMap
    approx should not be empty
    val exact = docs.filter($"text".isNotNull)
      .select($"source", explode(split(lower(trim(regexp_replace($"text", "\\s+", " "))), " ")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"source").agg(countDistinct($"word").as("v"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("v")).toMap
    exact.keySet shouldBe approx.keySet
    exact.foreach { case (src, v) =>
      math.abs(approx(src) - v).toDouble / v should be <= 0.06 // 3·rsd
    }
  }

  it should "plan a fixed-size sketch aggregate, not the exact distinct expansion" in {
    val plan = TextAnalysis.vocabApprox(Tables.documents(spark, sfDir))
      .queryExecution.executedPlan.toString
    plan should include("approx_count_distinct")
    (plan should not).include("count(distinct")
  }

  "heapsGrowth" should "accumulate one new word per doc on a planted growth corpus" in {
    // doc d = the shared word plus one unique word; ids 0..9 land one
    // per bucket, so each checkpoint adds 1 doc, 2 tokens, 1 new word
    // (bucket 0 adds 2: the shared word is also first-seen there)
    val docs = (0L until 10L).map(d => (d, s"the u$d")).toDF("doc_id", "text")
    val rows = TextAnalysis.heapsGrowth(docs).collect()
    rows.map(_.getAs[Long]("bucket")).toSeq shouldBe (0L until 10L)
    rows.map(_.getAs[Long]("cum_docs")).toSeq shouldBe (1L to 10L)
    rows.map(_.getAs[Long]("cum_tokens")).toSeq shouldBe (1L to 10L).map(_ * 2)
    rows.map(_.getAs[Long]("cum_vocab")).toSeq shouldBe (1L to 10L).map(_ + 1)
  }

  it should "saturate on a template corpus" in {
    val docs = (0L until 10L).map(d => (d, "spam spam spam")).toDF("doc_id", "text")
    val rows = TextAnalysis.heapsGrowth(docs).collect()
    rows.map(_.getAs[Long]("cum_vocab")).distinct.toSeq shouldBe Seq(1L)
    rows.last.getAs[Long]("cum_tokens") shouldBe 30L
  }

  "pmiCollocations" should "rank a planted collocation above a frequent word's self-pair" in {
    // doc 1: "aa bb" always adjacent (the collocation); doc 2: a run of
    // cc whose self-pairs are frequent but predicted by cc's unigram mass
    val docs = Seq(
      (1L, ("aa bb " * 5).trim),
      (2L, ("cc " * 6).trim)
    ).toDF("doc_id", "text")
    val rows = TextAnalysis
      .pmiCollocations(docs, k = 10, minPair = 5L)
      .collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("w1"), r.getAs[String]("w2"), r.getAs[Long]("c_pair"), r.getAs[Double]("pmi")))
    // qualifying pairs: (aa,bb) x5 and (cc,cc) x5; (bb,aa) is only x4
    rows.map(t => (t._2, t._3)).toSet shouldBe Set(("aa", "bb"), ("cc", "cc"))
    rows.head._2 shouldBe "aa"
    // hand-computed expectation with the operator's round-9 ln grid:
    // n_tok = 16, n_pairs = 14, c(aa)=c(bb)=5, c(cc)=6
    def r9(x: Double) = BigDecimal(math.log(x)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def pmi(cp: Long, c1: Long, c2: Long) =
      BigDecimal(r9(cp.toDouble) - r9(14.0) - (r9(c1.toDouble) - r9(16.0)) - (r9(c2.toDouble) - r9(16.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    rows.find(t => t._2 == "aa").get._5 shouldBe pmi(5, 5, 5) +- 1e-9
    rows.find(t => t._2 == "cc").get._5 shouldBe pmi(5, 6, 6) +- 1e-9
  }

  "sourceDivergence" should "give 0 for identical sources and ln 2 for disjoint ones" in {
    val docs = Seq(
      (1L, "a b c", "same1"),
      (2L, "a b c", "same2"),
      (3L, "x y z", "diff")
    ).toDF("doc_id", "text", "source")
    val jsd = TextAnalysis
      .sourceDivergence(docs)
      .collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) -> r.getAs[Double]("jsd"))
      .toMap
    jsd(("same1", "same2")) shouldBe 0.0
    // disjoint supports: JSD = ln 2 (maximum), support union = 6 words
    jsd(("diff", "same1")) shouldBe math.log(2.0) +- 1e-6
    jsd(("diff", "same2")) shouldBe math.log(2.0) +- 1e-6
  }

  "coverageCurve" should "trace the hand-checked cumulative coverage" in {
    // histogram: a→3, b→2, c→1 (ties impossible; total 6)
    val docs = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis
      .coverageCurve(docs)
      .orderBy("rank")
      .select("rank", "word", "cum_tokens", "coverage")
      .as[(Long, String, Long, Double)]
      .collect()
      .toList
    got shouldBe List(
      (1L, "a", 3L, 0.5),
      (2L, "b", 5L, 0.833333),
      (3L, "c", 6L, 1.0)
    )
  }

  "lexicalDiversity" should "compute the textbook constants on a hand-checked histogram" in {
    // source s1 histogram: a→2, b→1  (N=3, V=2, Σc²=5, Σc(c−1)=2)
    val docs = Seq(
      (1L, "a a b", "s1"),
      (2L, "x y", "s2")
    ).toDF("doc_id", "text", "source")
    val rows = TextAnalysis
      .lexicalDiversity(docs)
      .orderBy("source")
      .collect()
    val s1 = rows(0)
    s1.getAs[Long]("n_tokens") shouldBe 3L
    s1.getAs[Long]("n_types") shouldBe 2L
    s1.getAs[Double]("ttr") shouldBe 0.666667 +- 1e-9
    s1.getAs[Double]("guiraud_r") shouldBe 2.0 / math.sqrt(3.0) +- 1e-6
    s1.getAs[Double]("simpson") shouldBe 2.0 / 6.0 +- 1e-9
    s1.getAs[Double]("yule_k") shouldBe 10000.0 * 2.0 / 9.0 +- 1e-6
    // all-distinct source: simpson repeat rate 0, yule 0, ttr 1
    val s2 = rows(1)
    s2.getAs[Double]("ttr") shouldBe 1.0
    s2.getAs[Double]("simpson") shouldBe 0.0
    s2.getAs[Double]("yule_k") shouldBe 0.0
  }

  "charsetProfile" should "fraction each character class exactly" in {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "Ab 1\n", "s"), // 1 lower, 1 upper, 1 digit, 2 space
      (2L, "zz##@", "s") // 2 lower, 3 other
    ).toDF("doc_id", "text", "source")
    val r = graft.operators.TextAnalysis.charsetProfile(docs).collect().head
    r.getAs[Long]("n_docs") shouldBe 2L
    r.getAs[Long]("n_chars") shouldBe 10L
    r.getAs[Double]("lower_frac") shouldBe 0.3
    r.getAs[Double]("upper_frac") shouldBe 0.1
    r.getAs[Double]("digit_frac") shouldBe 0.1
    r.getAs[Double]("space_frac") shouldBe 0.2
    r.getAs[Double]("other_frac") shouldBe 0.3
  }

  "hapaxRates" should "count exactly the words occurring once within each document" in {
    val docs = Seq(
      (1L, "a a b c c c d", "s"), // hapaxes: b, d → 2 of 4 types, 2 of 7 tokens
      (2L, "x x x x", "s"), // no hapax
      (3L, "p q r", "s") // all hapax
    ).toDF("doc_id", "text", "source")
    val got = graft.operators.TextAnalysis
      .hapaxRates(docs)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long, Double, Double)]
      .collect()
      .toList
    got shouldBe List(
      (1L, "s", 4L, 7L, 2L, 0.5, 0.285714),
      (2L, "s", 1L, 4L, 0L, 0.0, 0.0),
      (3L, "s", 3L, 3L, 3L, 1.0, 1.0)
    )
  }

  "oovRates" should "charge each source the tokens outside the capped global vocab" in {
    // global counts: the 4, of 3, cat 2, dog 1 → top-2 vocab {of, the}
    val docs = Seq(
      (1L, "the the of cat", "a"),
      (2L, "the of cat dog", "b"),
      (3L, "the of", "b")
    ).toDF("doc_id", "text", "source")
    val got = graft.operators.TextAnalysis
      .oovRates(docs, topN = 2)
      .orderBy("source")
      .as[(String, Long, Long, Double, Long, Long)]
      .collect()
      .toList
    got shouldBe List(
      ("a", 4L, 1L, 0.25, 3L, 1L), // cat OOV
      ("b", 6L, 2L, 0.333333, 4L, 2L) // cat + dog OOV
    )
  }

  "readability" should "compute the Flesch formulas on known sentences" in {
    val docs = Seq(
      (1L, "The cat sat on the mat."),
      (2L, "no terminal punctuation here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs).orderBy("doc_id").collect()
    // 6 one-syllable words, 1 sentence
    out(0).getAs[Long]("n_words") shouldBe 6L
    out(0).getAs[Long]("n_sentences") shouldBe 1L
    out(0).getAs[Long]("n_syllables") shouldBe 6L
    out(0).getAs[Double]("flesch") shouldBe (206.835 - 1.015 * 6.0 - 84.6 * 1.0) +- 1e-6
    out(0).getAs[Double]("fk_grade") shouldBe (0.39 * 6.0 + 11.8 * 1.0 - 15.59) +- 1e-6
    // sentence count floors at 1 without terminal punctuation
    out(1).getAs[Long]("n_sentences") shouldBe 1L
    out(1).getAs[Long]("n_words") shouldBe 4L
    out(1).getAs[Long]("n_syllables") shouldBe 9L
  }


  "corpusHllReport" should "estimate a 10k-token vocabulary within the HLL error bound" in {
    // one doc per 100 tokens, 10k distinct tokens total in one lang;
    // expected HLL rel error at m=1024 is 1.04/sqrt(1024) ~ 3.25% --
    // accept 4 sigma
    val docs = (0 until 100).map { d =>
      val words = (0 until 100).map(i => s"tok${d * 100 + i}")
      (d.toLong, words.mkString(" "), "en", "srcA", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.corpusHllReport(docs).collect()
    out.length shouldBe 1
    val r = out.head
    r.getAs[Long]("exact_distinct") shouldBe 10000L
    r.getAs[Double]("rel_err") should be < 0.13
    r.getAs[Double]("hll_estimate") shouldBe
      (10000.0 +- 10000.0 * 0.13)
  }

  it should "switch to linear counting on a tiny vocabulary and land within one count" in {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon alpha beta", "en", "srcA", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.corpusHllReport(docs).collect().head
    r.getAs[Long]("exact_distinct") shouldBe 5L
    r.getAs[Long]("v_zero") should be >= 1019L // 5 distinct -> <= 5 registers hit
    // linear counting m*ln(m/V) is near-exact at this fill level
    r.getAs[Double]("hll_estimate") shouldBe (5.0 +- 0.5)
  }

  it should "be invariant to corpus splits (register max is associative)" in {
    val docs = (0 until 60).map { d =>
      val words = (0 to d % 11).map(r => s"v${(d * 7 + r) % 200}")
      (d.toLong, words.mkString(" "), if (d % 2 == 0) "en" else "fr", "srcA", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val whole = TextAnalysis.corpusHllReport(docs)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Double]("hll_estimate")).toMap
    // per-language estimates are functions of per-language register
    // maxes only: computing each language alone must reproduce them
    val en = TextAnalysis.corpusHllReport(docs.filter($"lang" === "en")).collect().head
    val fr = TextAnalysis.corpusHllReport(docs.filter($"lang" === "fr")).collect().head
    en.getAs[Double]("hll_estimate") shouldBe whole("en")
    fr.getAs[Double]("hll_estimate") shouldBe whole("fr")
  }

  "corpusCmsReport" should "honor the CMS guarantees against exact counts" in {
    // skewed corpus: word w_r appears ~(40 - r) times across docs
    val docs = (0 until 40).map { d =>
      val words = (0 until 40).filter(r => d >= r).map(r => s"w$r")
      (d.toLong, words.mkString(" "), "en", "srcA", words.mkString(" ").length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val eps = 0.01
    val out = TextAnalysis.corpusCmsReport(docs, k = 10, eps = eps).collect()
    out.length shouldBe 10
    val totalTokens = (0 until 40).map(d => d + 1).sum // doc d holds d+1 words
    out.foreach { r =>
      val exact = r.getAs[Long]("exact")
      val est = r.getAs[Long]("estimate")
      val over = r.getAs[Long]("overcount")
      est should be >= exact          // CMS never undercounts
      over shouldBe est - exact
      est should be <= exact + math.ceil(eps * totalTokens).toLong
    }
    // the exact ranking is the report order
    out.map(_.getAs[Long]("exact")).toSeq shouldBe out.map(_.getAs[Long]("exact")).toSeq.sorted.reverse
  }

  it should "merge counter-wise across corpus splits to the whole-corpus sketch" in {
    import org.apache.spark.util.sketch.CountMinSketch
    val docs = (0 until 30).map { d =>
      val words = (0 to d % 7).map(r => s"m$r")
      (d.toLong, words.mkString(" "), "en", "srcA", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    def sketchOf(df: org.apache.spark.sql.DataFrame): CountMinSketch = {
      val bytes = df
        .filter($"text".isNotNull)
        .select(explode(expr("split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' ')")).as("word"))
        .filter($"word" =!= "")
        .agg(count_min_sketch($"word", lit(0.001), lit(0.99), lit(42)).as("sk"))
        .head().getAs[Array[Byte]]("sk")
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    }
    val whole = sketchOf(docs)
    val even = sketchOf(docs.filter($"doc_id" % 2 === 0))
    val odd = sketchOf(docs.filter($"doc_id" % 2 === 1))
    even.mergeInPlace(odd)
    (0 until 7).foreach { r =>
      even.estimateCount(s"m$r") shouldBe whole.estimateCount(s"m$r")
    }
  }

}
