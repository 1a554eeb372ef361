package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The at-scale storage layout for ts(channel, t, v): parquet
  * partitioned by (channel, time bucket).
  *
  * This is the Spark-native replacement for the reference's Postgres
  * range index (SURVEY.md §3): a range lookup becomes partition
  * pruning — the driver lists only the matching channel/bucket
  * directories, so a query over one channel-day of a 100 TB corpus
  * reads exactly that channel-day. Parquet min/max stats on `t` then
  * prune row groups within each file.
  */
object TsLayout {

  /** Default partition granularity: one day of microseconds. */
  val DayUs: Long = 86400000000L

  /** Write ts rows into the partitioned layout. Directory keys are
    * duplicated from data columns (p_channel, p_bucket) so the data
    * columns survive in the files untouched.
    */
  def write(ts: DataFrame, path: String, bucketUs: Long = DayUs): Unit =
    ts.withColumn("p_channel", col("channel"))
      // floor (not truncate-toward-zero) so negative timestamps land in
      // the bucket DeriveBucketFilter derives with Math.floorDiv
      .withColumn("p_bucket", floor(col("t") / lit(bucketUs.toDouble)).cast("long"))
      .repartition(col("p_channel"), col("p_bucket")) // one writer task per partition dir
      .write
      .partitionBy("p_channel", "p_bucket")
      .mode("overwrite")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Range query that drives partition pruning: channel set + time
    * window, expressed against both the partition keys (pruning) and
    * the data column `t` (row-group stats + exact trim).
    */
  def rangeQuery(
    layout: DataFrame,
    channels: Seq[String],
    startUs: Long,
    endUs: Long,
    bucketUs: Long = DayUs
  ): DataFrame =
    layout
      .filter(
        col("p_channel").isin(channels: _*) &&
          col("p_bucket").between(startUs / bucketUs, (endUs - 1) / bucketUs) &&
          col("t") >= startUs && col("t") < endUs
      )
      .select(col("channel"), col("t"), col("v"))
}
