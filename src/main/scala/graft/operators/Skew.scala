package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities.
  *
  * AQE's skew-join split handles sort-merge skew automatically at
  * runtime, but two shapes still need explicit salting at 100 TB:
  * shuffle joins against a MEDIUM right side (too big to broadcast,
  * hot keys on the left), and hot-key aggregations. The classic remedy:
  * explode the left row's key with a random-ish salt in [0, S),
  * replicate each right row S times, and join on (key, salt) — hot keys
  * spread across S reducers at the cost of S× the (small) right side.
  */
object Skew {

  /** Equi-join `left` and `right` on `key`, spreading each left key
    * across `salt` partitions. The salt mixes the row content with a
    * per-row id (monotonically_increasing_id), so even byte-identical
    * duplicate rows — the typical hot-key shape in training data —
    * spread across reducers; the join RESULT is unaffected by which
    * salt a row gets. The right side is replicated `salt` times.
    *
    * Semantics are exactly those of `left.join(right, key)` (inner).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val leftCols: Seq[Column] = left.columns.map(col).toSeq
    val l = left.withColumn(
      "__salt",
      pmod(xxhash64(leftCols :+ monotonically_increasing_id(): _*), lit(salt.toLong)).cast("int")
    )
    val r = right.withColumn(
      "__salt",
      explode(expr(s"sequence(0, ${salt - 1})"))
    )
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for hot grouping keys: aggregate partials on
    * (key, salt) first, then combine per key — bounds any one reducer
    * to 1/salt of a hot key's rows. `partials` builds the salted-level
    * aggregates; `combine` merges them (they must be algebraic, e.g.
    * sum/min/max/count of partial sums).
    */
  def saltedAgg(
    df: DataFrame,
    key: String,
    salt: Int,
    partials: Seq[Column],
    combine: Seq[Column]
  ): DataFrame = {
    require(salt > 0, "salt must be positive")
    df.withColumn(
      "__salt",
      pmod(xxhash64(df.columns.map(col).toSeq :+ monotonically_increasing_id(): _*), lit(salt.toLong))
    )
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(combine.head, combine.tail: _*)
  }
}
