package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online exact deduplication — the streaming twin of the batch
  * [[graft.operators.Dedup.exactByHash]]: a live ingest tags every
  * arriving document as survivor or duplicate the moment it arrives,
  * where the batch operator reports (min doc_id, n_copies) groups
  * after the fact. The survivor of a content group is its FIRST
  * arrival in stream order; when the stream is fed in doc_id order
  * (the natural ingest order of an append-only corpus) the emitted
  * survivor set is exactly the batch min-doc_id survivor set, under
  * any micro-batch carving (spec sweeps three).
  *
  * Scale shape: one stateful exchange on the 60-bit md5-prefix content
  * key — the same key the batch twin groups by, so the state store
  * partitions exactly like the batch shuffle. State per key is two
  * longs (first doc_id, copies so far): one entry per DISTINCT
  * document, the information-theoretic floor for EXACT streaming
  * dedup — there is no way to never re-admit a duplicate without
  * remembering every distinct key. Pipelines that can tolerate false
  * positives bound this with the broadcast-bloom prefilter
  * ([[graft.operators.Dedup.bloomDedup]]) or age state out with a TTL;
  * both trade exactness for memory and are deliberately not this
  * operator.
  *
  * Within a micro-batch, each group folds its rows in doc_id order —
  * the batch min-doc_id tie-break — so carving cannot reorder
  * same-batch copies.
  */
object StreamingExactDedup {

  case class SeenState(firstDocId: Long, nCopies: Long)

  case class Tagged(doc_id: Long, is_dup: Boolean, survivor_id: Long, copy_no: Long)

  def dedup(
    spark: SparkSession,
    input: DataFrame // (doc_id long, text string)
  ): Dataset[Tagged] = {
    import spark.implicits._
    input
      .select(
        col("doc_id").cast("long"),
        expr(graft.operators.Dedup.md5Prefix60Sql("lower(trim(regexp_replace(text, '\\\\s+', ' ')))"))
          .as("__h")
      )
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[SeenState, Tagged](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout
      ) { case (_, rows, state: GroupState[SeenState]) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Tagged]
        var st = state.getOption.orNull
        rows.toSeq.sortBy(_._1).foreach { case (docId, _) =>
          st match {
            case null =>
              st = SeenState(docId, 1L)
              out += Tagged(docId, is_dup = false, survivor_id = docId, copy_no = 1L)
            case s =>
              st = s.copy(nCopies = s.nCopies + 1L)
              out += Tagged(docId, is_dup = true, survivor_id = s.firstDocId, copy_no = st.nCopies)
          }
        }
        if (st != null) state.update(st)
        out.iterator
      }
  }
}
