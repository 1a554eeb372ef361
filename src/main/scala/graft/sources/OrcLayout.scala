package graft.sources

import graft.operators.Timeseries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORC as a second columnar storage format for the timeseries layout —
  * proof that the engine's operators are FORMAT-AGNOSTIC: everything
  * downstream of `spark.read` is identical, and ORC gives the same
  * pushdown/pruning contract as parquet (predicate pushdown via
  * min/max stripe statistics, column projection via the reader
  * schema). Useful when the lakehouse standard around the engine is
  * ORC rather than parquet.
  *
  * The driver query reads a written-once-per-JVM ORC copy of the ts
  * view and answers the fixed range query; the oracle runs the SAME
  * predicate over the original parquet — value equality proves the
  * roundtrip preserved every row bit-for-bit.
  */
object OrcLayout {

  private val orcCache = scala.collection.concurrent.TrieMap[String, String]()

  /** Written-once-per-JVM ORC copy of the ts view (shared
    * [[CacheDirs.taggedCacheDir]] discipline).
    */
  def orcFor(spark: SparkSession, dir: String): String =
    orcCache.getOrElseUpdate(
      dir, {
        val path = CacheDirs.taggedCacheDir("target/ts_orc", dir).getAbsolutePath
        graft.Tables
          .ts(spark, dir)
          .select(col("channel"), col("t"), col("v"), col("event_id"))
          .write
          .mode("overwrite")
          .orc(path)
        path
      }
    )

  /** The fixed range query (same contract as ts_range) served from the
    * ORC copy — channel + time predicates push down to the ORC scan.
    */
  def tsOrcRange(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .orc(orcFor(spark, dir))
      .filter(
        col("channel").isin("click", "error") &&
          col("t") >= Timeseries.RangeStartUs && col("t") < Timeseries.RangeEndUs
      )
      .select(col("channel"), col("t"), col("v"), col("event_id"))
      .orderBy(col("channel"), col("t"), col("event_id"))

  /** Oracle: the identical predicate over the ORIGINAL parquet events
    * table — roundtrip equality is the check.
    */
  val tsOrcRangeSql: String = Timeseries.tsRangeSql
}
