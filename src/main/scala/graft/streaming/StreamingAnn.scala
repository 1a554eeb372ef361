package graft.streaming

import graft.functions.VectorMath
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ANN — continuous nearest-neighbor retrieval over an
  * unbounded VECTOR stream: a fixed query set watches the corpus
  * arrive, and each query's running top-k updates as closer vectors
  * show up (the "standing similarity query" a retrieval deployment
  * keeps beside the batch index builds; the batch twin is
  * ann_bruteforce, whose ranking contract this reproduces
  * incrementally).
  *
  * Scale shape: the query set is the SMALL static side of a
  * stream-static join (broadcast — the arriving micro-batch is scanned
  * once per batch and never shuffled at corpus grain); the only
  * streaming exchange keys on query_id (|Q| keys), and state is
  * hard-bounded at |Q|·k (vec_id, cos9) pairs regardless of stream
  * length. Update-mode emission: each touched query's current top-k
  * snapshot per micro-batch.
  *
  * Determinism/replay: scores round to 9 before ranking (the batch
  * family's discipline), merges order by (cos9 DESC, vec_id), and a
  * re-delivered vector dedups by id — so the converged state is
  * INDEPENDENT of micro-batch boundaries and at-least-once replays
  * (top-k of a union is the merge of top-ks: associative and
  * idempotent), which the spec pins by splitting the same stream two
  * ways.
  */
object StreamingAnn {

  /** One emitted ranking row of a query's current top-k snapshot. */
  case class Hit(query_id: Long, rank: Int, vec_id: Long, cos9: Double)

  def topK(
    spark: SparkSession,
    stream: DataFrame,
    queries: DataFrame,
    k: Int = 5
  ): Dataset[Hit] = {
    import spark.implicits._
    require(k > 0, s"k must be positive, got $k")
    val q = broadcast(
      queries
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .withColumn("__qn", VectorMath.norm(col("qv")))
    )
    stream
      .select(col("vec_id"), col("embedding").as("cv"))
      .withColumn("__cn", VectorMath.norm(col("cv")))
      .join(q, col("query_id") =!= col("vec_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(VectorMath.cosine(col("qv"), col("cv"), col("__qn"), col("__cn")), 9).as("cos9")
      )
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Double)], Hit](
        OutputMode.Update,
        GroupStateTimeout.NoTimeout
      ) { case (qid, rows, state: GroupState[Seq[(Long, Double)]]) =>
        val byRank = Ordering.by[(Long, Double), (Double, Long)] {
          case (id, c) => (-c, id)
        }
        val merged = (state.getOption.getOrElse(Seq.empty) ++ rows.map(r => (r._2, r._3)))
          .groupBy(_._1)
          .map { case (_, xs) => xs.max(Ordering.by[(Long, Double), Double](_._2)) }
          .toSeq
          .sorted(byRank)
          .take(k)
        state.update(merged)
        merged.iterator.zipWithIndex.map { case ((id, c), i) => Hit(qid, i + 1, id, c) }
      }
  }
}
