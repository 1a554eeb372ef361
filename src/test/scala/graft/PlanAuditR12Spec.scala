package graft

import org.apache.spark.sql.execution.SparkPlan

/** Round-12 plan-shape audit of the new operators — the `.explain`
  * pass the build discipline requires after correctness: the scale
  * narrative in each Scaladoc must be TRUE of the physical plan, not
  * aspirational.
  */
class PlanAuditR12Spec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  "mm_crossmodal's plan" should "broadcast the query set and rank via WindowGroupLimit" in {
    val p = plan("mm_crossmodal")
    // the image-query side reaches the corpus as a broadcast (nested
    // loop — it is a cross join by construction), never a shuffle of
    // the corpus keyed by query
    p should include("BroadcastNestedLoopJoin")
    // the top-k rank is group-limited BEFORE the final exchange
    p should include("WindowGroupLimit")
  }

  "sample_kcenter's argmax round" should "be a TakeOrderedAndProject over one corpus scan" in {
    // audit the round shape itself (the registry query's output is a
    // driver-side localized relation, so probe the builder's scan):
    // one round = corpus scan + literal distances + top-1
    import org.apache.spark.sql.functions._
    import graft.functions.VectorMath
    val emb = Tables.embeddings(spark, sfDir)
    val sv = Seq.fill(64)(0.5)
    val d = round(
      VectorMath.dot(col("embedding"), col("embedding")) -
        lit(2.0) * VectorMath.dot(col("embedding"), array(sv.map(lit(_)): _*)) + lit(16.0),
      9
    )
    val p = emb
      .filter(!col("vec_id").isin(0L))
      .select(col("vec_id"), d.as("__dmin"))
      .orderBy(col("__dmin").desc, col("vec_id"))
      .limit(1)
      .queryExecution.executedPlan.toString
    p should include("TakeOrderedAndProject")
    p.contains("Exchange hashpartitioning") shouldBe false
  }

  "ann_graph's final ranking" should "carry no corpus-grain exchange after the mine" in {
    val p = plan("ann_graph")
    // the memoized beam result is a localized checkpoint: the query
    // itself is a sort of a driver-size relation (queries×k rows)
    p should include("Scan ExistingRDD")
  }
}
