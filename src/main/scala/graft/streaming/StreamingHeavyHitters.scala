package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — bounded-state frequent-item tracking over
  * an unbounded keyed stream (the "which channels / tokens / sources
  * dominate right now" monitor a corpus-ingest deployment runs beside
  * the pipeline; the reference engine's per-session byte counters in
  * query/QuerySequencer.scala:151-166 are the single-tenant cousin).
  *
  * Exact streaming counts (`groupBy(item).count`) keep one state row
  * per DISTINCT item — unbounded on open-vocabulary streams. This is
  * the classic bounded alternative: the SpaceSaving summary (Metwally,
  * Agrawal & El Abbadi, "Efficient computation of frequent and top-k
  * elements in data streams", ICDT 2005) keeps exactly `capacity`
  * counters per shard; an untracked arrival evicts the minimum counter
  * and inherits its count as the new entry's error bound. Guarantees
  * (per shard, N = shard stream length): every item with true count >
  * N/capacity is tracked, and tracked counts overestimate the truth by
  * at most the entry's `err` <= N/capacity.
  *
  * Scale shape: items pre-shard by hash, so the ONLY streaming
  * exchange is on `nShards` keys and state is hard-bounded at
  * nShards × capacity entries regardless of vocabulary growth —
  * sharding also spreads the update work across executors.
  * SpaceSaving summaries MERGE by count addition (error bounds add),
  * so the per-batch emission (each shard's current top `k`) reduces to
  * a global top-k with a tiny nShards·k-row batch aggregate at read
  * time; an item's global count sums its per-shard counts exactly
  * because an item hashes to ONE shard.
  */
object StreamingHeavyHitters {

  /** One tracked counter: `count` upper-bounds the item's true shard
    * count; `count - err` lower-bounds it.
    */
  case class Entry(item: String, count: Long, err: Long)

  /** Per-micro-batch emission: a shard's current top-k snapshot. */
  case class Snapshot(shard: Int, item: String, count: Long, err: Long)

  /** SpaceSaving top-k over a streaming DataFrame with a string `item`
    * column. Emits each updated shard's current top `k` every
    * micro-batch (Update-mode semantics: the consumer keeps the latest
    * snapshot per (shard, item)).
    */
  def topK(
    spark: SparkSession,
    input: DataFrame,
    capacity: Int = 256,
    nShards: Int = 16,
    k: Int = 10
  ): Dataset[Snapshot] = {
    import spark.implicits._
    require(capacity > 0 && nShards > 0 && k > 0, "capacity, nShards and k must be positive")
    input
      .select(pmod(xxhash64(col("item")), lit(nShards)).cast("int").as("shard"), col("item"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, (Long, Long)], Snapshot](
        OutputMode.Update,
        GroupStateTimeout.NoTimeout
      ) { case (shard, rows, state: GroupState[Map[String, (Long, Long)]]) =>
        // the persisted state stays a plain Map; per invocation it is
        // mirrored into a hash map + a (count, item)-ordered index so
        // a full summary's eviction churn costs O(log capacity) per
        // element (the canonical stream-summary discipline) instead of
        // an O(capacity) min-scan per evicting arrival
        val m = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
        val ord = scala.collection.mutable.TreeSet.empty[(Long, String)]
        state.getOption.getOrElse(Map.empty[String, (Long, Long)]).foreach {
          case (it, (c, e)) => m(it) = (c, e); ord += ((c, it))
        }
        rows.foreach { case (_, item) =>
          m.get(item) match {
            case Some((c, e)) =>
              ord -= ((c, item)); m(item) = (c + 1L, e); ord += ((c + 1L, item))
            case None if m.size < capacity =>
              m(item) = (1L, 0L); ord += ((1L, item))
            case None =>
              // evict the minimum counter (ties by item for
              // replay-determinism — the same (count, item) order the
              // index sorts by); the newcomer inherits its count as
              // the error bound
              val (mCount, mItem) = ord.head
              ord -= ((mCount, mItem)); m -= mItem
              m(item) = (mCount + 1L, mCount); ord += ((mCount + 1L, item))
          }
        }
        state.update(m.toMap)
        m.toSeq
          .map { case (it, (c, e)) => Entry(it, c, e) }
          .sortBy(en => (-en.count, en.item))
          .take(k)
          .map(en => Snapshot(shard, en.item, en.count, en.err))
          .iterator
      }
  }
}
