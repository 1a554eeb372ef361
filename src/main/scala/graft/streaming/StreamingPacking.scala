package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — the concat-and-chunk training layout
  * applied INCREMENTALLY: the end-of-stream token offset is carried in
  * state, so each micro-batch's documents extend the same global token
  * stream the batch packer ([[graft.operators.Packing.packSequences]])
  * lays out. Replaying a corpus through the stream in doc_id order
  * yields bit-identical assignments to the batch run — packing is a
  * prefix-sum, and the state is exactly the carried prefix.
  *
  * Contract: documents arrive in ascending doc_id order ACROSS
  * micro-batches (the usual append-only ingest id discipline); within
  * a batch, rows are sorted before assignment, so intra-batch arrival
  * order is free.
  *
  * Scale shape, stated honestly: token counting is a stateless
  * map-side projection (the same expression the batch packer uses);
  * only (doc_id, n_tokens) pairs — 16 bytes/doc, not documents — reach
  * the single state key, which serializes offset assignment exactly
  * like the batch packer's final prefix handoff. Shard by corpus
  * namespace upstream when one stream must exceed a task's row rate,
  * and stitch shard offsets the way [[graft.operators.Packing]] stitches
  * shard bases.
  */
object StreamingPacking {

  /** (doc_id, n_tokens, t_offset, bin_first, bin_last, n_bins) per
    * arriving document, offsets continuing across micro-batches.
    */
  def pack(
    spark: SparkSession,
    docs: DataFrame,
    seqLen: Int
  ): Dataset[(Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    docs
      .select(
        col("doc_id"),
        coalesce(size(expr(TextAnalysis.WordsSql)).cast("long"), lit(0L)).as("n_tokens")
      )
      .as[(Long, Long)]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Long, (Long, Long, Long, Long, Long, Long)](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      ) { case (_, rows, state: GroupState[Long]) =>
        var off = state.getOption.getOrElse(0L)
        val out = rows.toSeq.sortBy(_._1).map { case (id, n) =>
          val tOff = off
          off += n
          val binFirst = tOff / seqLen
          val binLast = (tOff + math.max(n, 1L) - 1L) / seqLen
          (id, n, tOff, binFirst, binLast, binLast - binFirst + 1L)
        }
        state.update(off)
        out.iterator
      }
      .toDF("doc_id", "n_tokens", "t_offset", "bin_first", "bin_last", "n_bins")
      .as[(Long, Long, Long, Long, Long, Long)]
  }
}
