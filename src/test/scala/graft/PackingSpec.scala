package graft

import graft.operators.Packing
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  "packSequences" should "assign offsets and bin spans of the concatenated token stream" in {
    // token counts: 3, 4, 2, 6 -> offsets 0, 3, 7, 9; seqLen 4 bins:
    // doc 1 [0,2] bin 0; doc 2 [3,6] bins 0-1 (split); doc 3 [7,8]
    // bins 1-2 (split); doc 4 [9,14] bins 2-3 (split)
    val docs = Seq(
      (1L, "a b c"),
      (2L, "d e f g"),
      (3L, "h i"),
      (4L, "j k l m n o")
    ).toDF("doc_id", "text")
    val got = Packing
      .packSequences(docs, seqLen = 4, shardWidth = 2L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "t_offset", "bin_first", "bin_last", "n_bins")
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect()
      .toList
    got shouldBe List(
      (1L, 3L, 0L, 0L, 0L, 1L),
      (2L, 4L, 3L, 0L, 1L, 2L),
      (3L, 2L, 7L, 1L, 2L, 2L),
      (4L, 6L, 9L, 2L, 3L, 2L)
    )
  }

  "packBins" should "report per-bin doc mix, dominant shares and min-doc tie-break" in {
    // word counts 7, 6, 10, 3 at seqLen 10 -> offsets 0, 7, 13, 23:
    // bin0 = {d0:7, d1:3}, bin1 = {d1:3, d2:7}, bin2 = {d2:3, d3:3}
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, words(7)), (1L, words(6)), (2L, words(10)), (3L, words(3))
    ).toDF("doc_id", "text")
    val got = Packing
      .packBins(docs, seqLen = 10, shardWidth = 2L)
      .orderBy("bin")
      .select("bin", "n_docs", "n_tokens", "main_doc", "main_tokens", "main_frac")
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect()
      .toList
    got shouldBe List(
      (0L, 2L, 10L, 0L, 7L, 0.7),
      (1L, 2L, 10L, 2L, 7L, 0.7),
      (2L, 2L, 6L, 2L, 3L, 0.5) // 3-3 tie breaks to the lower doc_id
    )
  }

  it should "be bit-identical for every shard width (two-phase scan == global scan)" in {
    // the distributed prefix sum must not depend on how the corpus is
    // sharded: sweep widths from per-doc shards to one giant shard
    val docs = Tables.documents(spark, sfDir)
    val reference = Packing
      .packSequences(docs, seqLen = 128, shardWidth = 1L)
      .orderBy("doc_id")
      .collect()
      .toSeq
    Seq(7L, 64L, 1000000L).foreach { w =>
      val got = Packing
        .packSequences(docs, seqLen = 128, shardWidth = w)
        .orderBy("doc_id")
        .collect()
        .toSeq
      withClue(s"shardWidth=$w:") { got shouldBe reference }
    }
  }

  it should "handle empty documents as zero-width spans at their offset" in {
    val docs = Seq(
      (1L, "a b"),
      (2L, null.asInstanceOf[String]),
      (3L, "c d e")
    ).toDF("doc_id", "text")
    val got = Packing
      .packSequences(docs, seqLen = 4, shardWidth = 10L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "t_offset", "n_bins")
      .as[(Long, Long, Long, Long)]
      .collect()
      .toList
    // null text -> 0 tokens, occupies no stream space: doc 3 starts at
    // 2 and its tokens [2,4] straddle the bin-1 boundary
    got shouldBe List((1L, 2L, 0L, 1L), (2L, 0L, 2L, 1L), (3L, 3L, 2L, 2L))
  }

  it should "never run an unpartitioned window over the corpus stream" in {
    // the 100 TB constraint: the only empty-partitionSpec window
    // permitted is the shard-base rollup, which runs POST-REDUCTION
    // (its subtree aggregates the corpus down to one row per shard)
    val df = Packing.packSequencesQ(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    windows should not be empty
    windows.foreach { w =>
      if (w.partitionSpec.isEmpty) {
        val aggs = w.collect { case a: Aggregate => a }
        withClue(s"unpartitioned window must sit above the shard rollup: $w") {
          aggs should not be empty
        }
      }
    }
    // and at least one window IS the parallel per-shard scan
    windows.exists(_.partitionSpec.nonEmpty) shouldBe true
  }

  "trainShards" should "cut contiguous doc ranges that each carry about the target tokens" in {
    // 100 docs x 10 tokens; target 250 → 4 shards of exactly 25 docs
    val docs = (0L until 100L)
      .map(i => (i, (1 to 10).map(k => s"w$k").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Packing.trainShards(docs, targetTokens = 250L)
      .orderBy("shard_id")
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect()
      .toList
    got.map(_._1) shouldBe List(0L, 1L, 2L, 3L)
    got.foreach { case (_, nDocs, nTok, _, _, fill) =>
      nDocs shouldBe 25L
      nTok shouldBe 250L
      fill shouldBe 1.0
    }
    // contiguity: each shard's range starts where the previous ended
    got.sliding(2).foreach { case List(a, b) => b._4 shouldBe a._5 + 1 case _ => }
  }

  it should "be invariant to the prefix-sum shard width" in {
    val docs = (0L until 137L)
      .map(i => (i, (0 until (i % 13).toInt).map(k => s"w$k").mkString(" ")))
      .toDF("doc_id", "text")
    val ref = Packing.trainShards(docs, targetTokens = 100L, shardWidth = 1L << 40)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    ref should not be empty
    for (w <- Seq(1L, 7L, 64L)) {
      Packing.trainShards(docs, targetTokens = 100L, shardWidth = w)
        .collect().map(_.toSeq).sortBy(_.mkString("|")) shouldBe ref
    }
  }
}
