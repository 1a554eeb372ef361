package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spark bucketed-table layout for shuffle-free keyed work.
  *
  * Directory partitioning (TsLayout) prunes WHICH files a query reads;
  * bucketing fixes HOW rows are distributed inside them: writing with
  * `bucketBy(n, "channel")` pre-hashes rows into n bucket file sets,
  * so every later join or aggregation keyed by channel reads data that
  * already satisfies the hash distribution — Catalyst plans NO
  * exchange on the bucketed side. At 100 TB this converts every
  * per-channel pipeline stage (stats, gap scan, montage pairing,
  * filter-block assembly) from a full shuffle into a local scan; the
  * one-time bucketed write amortizes across every downstream query.
  * PlanSpec machine-asserts the no-exchange property.
  */
object BucketedLayout {

  /** One-time bucketed materialization, co-locating each channel's
    * rows (and pre-sorting by time within each file) — the write-side
    * half of the contract. Registered as a saved table because
    * bucketing metadata lives in the catalog.
    */
  def writeBucketed(ts: DataFrame, table: String, buckets: Int): Unit =
    ts.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, "channel")
      .sortBy("channel", "t")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
