package graft

import graft.operators.Search
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  "hybridTopK" should "fuse lexical and semantic ranks by reciprocal rank" in {
    // query doc 0. doc 1 agrees with it on BOTH text and embedding;
    // doc 2 shares the text but points the opposite way in embedding
    // space; doc 3 shares the embedding direction but not the text.
    // RRF must put the doubly-agreeing doc 1 first.
    val d = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val e = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(-1.0f, 0.05f)),
      (3L, Array(0.95f, 0.05f))
    ).toDF("vec_id", "embedding")
    val got = Search
      .hybridTopK(d, e, nQueries = 1, kIn = 10, kOut = 10)
      .orderBy("rank")
      .select("doc_id", "rrf_score")
      .as[(Long, Double)]
      .collect()
      .toList
    got.map(_._1).head shouldBe 1L
    // doc 1: r_lex=1 (jac 4/5, tie to lower doc_id) and r_sem=2 (doc 3
    // edges it on cosine but has zero lexical support)
    got.head._2 shouldBe math.round((1.0 / 61 + 1.0 / 62) * 1e6) / 1e6 +- 1e-9
    // every fused score is positive and non-increasing
    got.map(_._2).sliding(2).foreach { case Seq(a, b) => a should be >= b }
  }

  "bm25TopK" should "rank by term frequency under equal length and keep only matching docs" in {
    val df = docs(
      1L -> "rare rare rare pad pad",
      2L -> "rare pad pad pad pad",
      3L -> "common common pad pad pad"
    )
    val out = Search
      .bm25TopK(spark, df, Seq("q" -> Seq("rare")), k = 10)
      .orderBy("rank")
      .collect()
    out.map(_.getAs[Long]("doc_id")).toSeq shouldBe Seq(1L, 2L) // doc 3 never matches
    out.map(_.getAs[Long]("rank")).toSeq shouldBe Seq(1L, 2L)
    out(0).getAs[Double]("score") should be > out(1).getAs[Double]("score")
  }

  it should "downweight ubiquitous terms via idf" in {
    // same tf (1) and same doc length everywhere; "pad" appears in all
    // docs (df=3) while "rare" appears in one (df=1) → the rare match
    // must outscore the ubiquitous one
    val df = docs(
      1L -> "rare pad x1 x2",
      2L -> "pad y1 y2 y3",
      3L -> "pad z1 z2 z3"
    )
    val out = Search
      .bm25TopK(spark, df, Seq("q_rare" -> Seq("rare"), "q_pad" -> Seq("pad")), k = 10)
      .collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[Long]("doc_id")) -> r.getAs[Double]("score"))
      .toMap
    out(("q_rare", 1L)) should be > out(("q_pad", 1L))
  }

  it should "sum per-term contributions for multi-term queries" in {
    val df = docs(1L -> "alpha beta pad pad", 2L -> "alpha pad pad pad", 3L -> "beta pad pad pad")
    val out = Search
      .bm25TopK(spark, df, Seq("q" -> Seq("alpha", "beta")), k = 10)
      .orderBy("rank")
      .collect()
    // the doc matching both terms outranks either single-term doc
    out(0).getAs[Long]("doc_id") shouldBe 1L
    out.length shouldBe 3
    // deterministic across runs
    val again = Search
      .bm25TopK(spark, df, Seq("q" -> Seq("alpha", "beta")), k = 10)
      .orderBy("rank")
      .collect()
    out.map(_.toSeq).toSeq shouldBe again.map(_.toSeq).toSeq
  }

  "phraseSearch" should "match exact adjacency only, in order, counting every occurrence" in {
    val docs = Seq(
      (1L, "big table scan and another table scan here"), // 2 hits
      (2L, "table of the scan"), // words present, never adjacent
      (3L, "scan table"), // reversed order is not the phrase
      (4L, "one table scan only"), // 1 hit
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val rows = Search
      .phraseSearch(docs, Seq("table", "scan"), k = 10)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"), r.getAs[Long]("first_pos")))
    rows shouldBe Array((1L, 2L, 1L), (4L, 1L, 1L))
  }

  it should "chain three-word phrases through shifted position joins" in {
    val docs = Seq(
      (1L, "fast table scan wins"), // hit starting at pos 0
      (2L, "fast table and scan"), // broken chain
      (3L, "table scan fast table scan") // hit starting at pos 2
    ).toDF("doc_id", "text")
    val rows = Search
      .phraseSearch(docs, Seq("fast", "table", "scan"), k = 10)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"), r.getAs[Long]("first_pos")))
    rows shouldBe Array((1L, 1L, 0L), (3L, 1L, 2L))
  }

  "fuzzyLookup" should "match vocabulary within edit distance 1 and count document frequency" in {
    val docs = Seq(
      (1L, "spark table fast"),
      (2L, "spork table"),
      (3L, "table sparkle"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val rows = Search
      .fuzzyLookup(spark, docs, Seq("spxrk", "tabl"), maxDist = 1)
      .collect()
      .map(r => (r.getAs[String]("query_term"), r.getAs[String]("word"), r.getAs[Long]("dist"), r.getAs[Long]("df")))
    // spxrk: spark + spork at one substitution; sparkle is distance 3
    // tabl:  table at one insertion, present in three docs
    rows shouldBe Array(
      ("spxrk", "spark", 1L, 1L),
      ("spxrk", "spork", 1L, 1L),
      ("tabl", "table", 1L, 3L)
    )
  }

  it should "count a word once per document even when repeated" in {
    val docs = Seq((1L, "scan scan scan"), (2L, "scan")).toDF("doc_id", "text")
    val rows = Search
      .fuzzyLookup(spark, docs, Seq("scann"), maxDist = 1)
      .collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("dist"), r.getAs[Long]("df")))
    rows shouldBe Array(("scan", 1L, 2L))
  }

  "moreLikeThis" should "rank documents by TF-IDF cosine to the query doc" in {
    // query doc 0. doc 1 repeats doc 0's rare words; doc 2 shares only
    // the ubiquitous word; doc 3 shares nothing and must not appear.
    val d = docs(
      0L -> "quark lepton boson common",
      1L -> "quark lepton boson boson common",
      2L -> "common common common other things",
      3L -> "entirely disjoint vocabulary here"
    )
    val rows = Search.moreLikeThis(d, nQueries = 1, k = 10).orderBy("rank").collect()
    rows.map(_.getAs[Long]("doc_id")).toSeq shouldBe Seq(1L, 2L)
    val cos = rows.map(_.getAs[Double]("cos"))
    cos(0) should be > cos(1)
    cos.foreach(c => c should (be > 0.0 and be <= 1.0))
    // the query doc never ranks itself
    rows.map(_.getAs[Long]("doc_id")) should not contain 0L
  }

  it should "broadcast the query postings and group-limit before the final shuffle" in {
    val df = Search.searchMlt(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should include("WindowGroupLimit")
    plan should not include "CartesianProduct"
  }

  "prefixSuggest" should "rank completions by document frequency with alphabetical ties" in {
    val docs = Seq(
      (1L, "spark sort scan"),
      (2L, "spark sort"),
      (3L, "spark other"),
      (4L, "spark spark spark") // repeats count once per doc (df, not tf)
    ).toDF("doc_id", "text")
    val got = Search
      .prefixSuggest(docs, Seq("s"), k = 2)
      .orderBy("rank")
      .as[(String, Long, String, Long)]
      .collect()
      .toList
    // df: spark=4, sort=2, scan=1 -> top-2 cut keeps spark, sort
    got shouldBe List(("s", 1L, "spark", 4L), ("s", 2L, "sort", 2L))
  }

  it should "return nothing for a prefix with no vocabulary match" in {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    Search.prefixSuggest(docs, Seq("zz"), k = 5).count() shouldBe 0L
  }

  "substringSearch" should "prune via trigrams but verify exactly" in {
    val d = Seq(
      (1L, "merge part one", "a"),
      (2L, "xx merge part merge part xx", "a"), // two occurrences
      (3L, "nothing shared at all", "b"),
      // all 8 pattern trigrams present, but never contiguously:
      // a trigram candidate that the exact verify must reject
      (4L, "merger of the page apart", "b"),
      (5L, null, "b")
    ).toDF("doc_id", "text", "source")
    val pat = "merge part"
    // candidate stage: superset including the trigram false positive
    val cand = Search.trigramCandidates(d, pat).as[Long].collect().sorted
    cand shouldBe Array(1L, 2L, 4L)
    // final answer: the false positive is gone, counts are exact
    val got = Search.substringSearch(d, pat)
      .orderBy("doc_id")
      .select("doc_id", "occurrences")
      .as[(Long, Long)]
      .collect()
      .toList
    got shouldBe List((1L, 1L), (2L, 2L))
  }

  it should "never miss a true match (trigram set is a superset)" in {
    val d = (0L until 40L)
      .map(i => (i, if (i % 7 == 0) s"pad pad merge part $i" else s"filler text $i", "s"))
      .toDF("doc_id", "text", "source")
    val naive = d.filter(col("text").contains("merge part")).select("doc_id")
      .as[Long].collect().sorted
    val got = Search.substringSearch(d, "merge part").select("doc_id")
      .as[Long].collect().sorted
    got shouldBe naive
    naive.length shouldBe 6
  }

  "booleanSearch" should "require every must-term and reject any must-not term" in {
    val docs = Seq(
      (1L, "spark join fast spark"), // both musts, no neg → tf 3
      (2L, "spark join slow"), // neg term present → out
      (3L, "spark fast"), // missing 'join' → out
      (4L, "join spark join") // both musts → tf 3
    ).toDF("doc_id", "text")
    val got = Search
      .booleanSearch(spark, docs, Seq(("q", Seq("spark", "join"), Seq("slow"))))
      .orderBy("doc_id")
      .as[(String, Long, Long)]
      .collect()
      .toList
    got shouldBe List(("q", 1L, 3L), ("q", 4L, 3L))
  }

  it should "treat an empty must-not list as a plain conjunction" in {
    val docs = Seq((1L, "hash scan"), (2L, "hash"), (3L, "scan hash scan")).toDF("doc_id", "text")
    val got = Search
      .booleanSearch(spark, docs, Seq(("q", Seq("hash", "scan"), Seq.empty)))
      .orderBy("doc_id")
      .as[(String, Long, Long)]
      .collect()
      .toList
    got shouldBe List(("q", 1L, 2L), ("q", 3L, 3L))
  }

  "rankEval" should "score a ranker perfectly when every strong match fits in k" in {
    // docs 1-3 carry 3+3 occurrences (relevant under min-tf 3); docs
    // 4-5 carry the terms only weakly
    val docs = Seq(
      (1L, "a a a b b b x"),
      (2L, "a a a a b b b y"),
      (3L, "b b b a a a a a"),
      (4L, "a b x y z"),
      (5L, "a a b b x")
    ).toDF("doc_id", "text")
    val got = Search
      .rankEval(spark, docs, Seq(("q", Seq("a", "b"))), k = 3)
      .as[(String, Long, Long, Double, Double)]
      .collect()
      .toList
    // BM25 ranks the heavy-tf docs 1-3 on top → all 3 relevant found
    got shouldBe List(("q", 3L, 3L, 1.0, 1.0))
  }

  it should "report zero MRR when nothing relevant exists" in {
    val docs = Seq((1L, "a b"), (2L, "b a")).toDF("doc_id", "text")
    val got = Search
      .rankEval(spark, docs, Seq(("q", Seq("a", "b"))), k = 2)
      .as[(String, Long, Long, Double, Double)]
      .collect()
      .toList
    got shouldBe List(("q", 0L, 0L, 0.0, 0.0))
  }

  "proximitySnippets" should "pick each doc's tightest window and rank docs by it" in {
    val docs = Seq(
      (1L, "spark x x x join spark y join"), // best: spark@5 join@4 span 1
      (2L, "join spark z"), // adjacent: span 1
      (3L, "spark only here"), // missing join → out
      (4L, "spark w join") // span 2
    ).toDF("doc_id", "text")
    val got = Search
      .proximitySnippets(docs, "spark", "join", k = 10)
      .as[(Long, Long, Long, Long)]
      .collect()
      .toList
    got shouldBe List(
      (1L, 1L, 5L, 4L), // (doc, span, pos_a, pos_b)
      (2L, 1L, 1L, 0L),
      (4L, 2L, 0L, 2L)
    )
  }
}
