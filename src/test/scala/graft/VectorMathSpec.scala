package graft

import graft.functions.VectorMath
import org.apache.spark.sql.functions._

class VectorMathSpec extends SparkSpec {
  import spark.implicits._

  "VecDot" should "compute exact dot products on double arrays" in {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    df.select(VectorMath.dot($"a", $"b")).as[Double].head() shouldBe 32.0
  }

  it should "match the interpreted higher-order fold on real float32 embeddings" in {
    val emb = Tables.embeddings(spark, sfDir).limit(50)
    val pairs = emb
      .select($"vec_id".as("ia"), $"embedding".as("va"))
      .crossJoin(emb.select($"vec_id".as("ib"), $"embedding".as("vb")))
    val diff = pairs
      .select(
        (VectorMath.dot($"va", $"vb") -
          expr(
            "aggregate(zip_with(transform(va, x -> cast(x as double)), transform(vb, x -> cast(x as double)), (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
          )).as("d")
      )
      .agg(max(abs($"d")))
      .as[Double]
      .head()
    diff shouldBe 0.0 // float→double widening is exact; same fold order
  }

  it should "stay inside whole-stage codegen" in {
    val emb = Tables.embeddings(spark, sfDir)
    val plan = emb
      .select(VectorMath.dot($"embedding", $"embedding").as("d"))
      .queryExecution
      .executedPlan
      .toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    plan should include regex """\*\(\d+\) Project \[vec_dot"""
  }

  it should "be callable from SQL after registration" in {
    VectorMath.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_vm")
    val n = spark
      .sql("SELECT vec_dot(embedding, embedding) AS d FROM emb_vm WHERE vec_dot(embedding, embedding) > 0")
      .count()
    n shouldBe Tables.embeddings(spark, sfDir).count()
  }

  "norm" should "equal sqrt(dot(v, v))" in {
    val df = Seq(Tuple1(Seq(3.0, 4.0))).toDF("v")
    df.select(VectorMath.norm($"v")).as[Double].head() shouldBe 5.0 +- 1e-12
  }
}
