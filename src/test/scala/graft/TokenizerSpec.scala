package graft

import graft.operators.Tokenizer

class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def merges(rounds: Int, texts: String*) =
    Tokenizer
      .bpeMerges(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"), rounds)
      .orderBy("rank")
      .as[(Long, String, String, String, Long)]
      .collect()
      .toSeq

  "bpeMerges" should "merge greedily left-to-right without re-merging fresh symbols" in {
    // "aaaa": 3 (a,a) adjacencies; greedy rewrite is [aa, aa], never [aa, a, a] or a re-merge
    merges(2, "aaaa") shouldBe Seq(
      (1L, "a", "a", "aa", 3L),
      (2L, "aa", "aa", "aaaa", 1L)
    )
  }

  it should "break count ties by (lhs, rhs) order and weight pairs by word frequency" in {
    // "ab" occurs twice (freq-weighted count 2), "cd" once
    merges(2, "ab cd ab") shouldBe Seq(
      (1L, "a", "b", "ab", 2L),
      (2L, "c", "d", "cd", 1L)
    )
  }

  it should "stop early when no adjacent pairs remain" in {
    merges(5, "a b a") shouldBe Seq.empty
  }
}
