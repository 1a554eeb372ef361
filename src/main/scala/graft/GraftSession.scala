package graft

import org.apache.spark.sql.SparkSession

/** One-call session bootstrap for users migrating from the reference
  * service: returns a SparkSession.Builder pre-configured with every
  * setting the engine's operators assume —
  *
  *  - the graft extensions (kernel SQL functions + the
  *    DeriveBucketFilter pruning rule),
  *  - UTC session time zone (timestamp arithmetic parity),
  *  - nanosecond-timestamp parquet read support (TIMESTAMP(NANOS)
  *    columns read as long nanoseconds, which Tables.ts converts),
  *  - shuffle parallelism sized to the core count instead of the
  *    200-partition default that over-schedules local/small clusters.
  *
  * Callers can keep chaining (master, appName, further conf) before
  * getOrCreate; production clusters typically override the
  * parallelism with their executor topology.
  */
object GraftSession {
  def builder(shufflePartitions: Int = Runtime.getRuntime.availableProcessors.min(32)): SparkSession.Builder =
    SparkSession
      .builder()
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
}
