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

  /** Session conf key [[graft.plans.DeriveBucketFilter]] falls back to
    * for layouts that carry no width marker (i.e. layouts written by
    * something other than [[write]]). Marker-carrying layouts resolve
    * their width per relation via [[markerWidth]], so sessions can mix
    * layouts of different widths safely.
    */
  val BucketUsConfKey = "spark.graft.ts.bucketUs"

  /** Marker file recording the bucket width a layout was written with. */
  private val BucketMarker = "_graft_bucket_us"

  /** Cached marker lookups, keyed by CANONICAL root path (misses
    * cached too — the optimizer asks on every query). Canonicalizing
    * the key means a probe via any alias of the same directory
    * (trailing slash, relative path, symlink) hits the entry that
    * [[writeMarker]] invalidates — a miss cached under an alias would
    * otherwise pin "markerless" against a layout written later.
    */
  private val widthCache = scala.collection.concurrent.TrieMap[String, Option[Long]]()

  private def canonKey(path: String): String =
    try new java.io.File(path).getCanonicalPath
    catch { case scala.util.control.NonFatal(_) => path }

  /** The bucket width recorded in a layout's `_graft_bucket_us` marker,
    * None for markerless paths. This is how [[graft.plans.DeriveBucketFilter]]
    * learns each scanned layout's OWN width instead of trusting a
    * session-global number — the session conf is only a fallback for
    * markerless layouts.
    */
  def markerWidth(rootPath: String, hadoopConf: org.apache.hadoop.conf.Configuration): Option[Long] =
    widthCache.getOrElseUpdate(
      canonKey(rootPath), {
        try {
          val marker = new org.apache.hadoop.fs.Path(rootPath, BucketMarker)
          val fs = marker.getFileSystem(hadoopConf)
          if (!fs.exists(marker)) None
          else {
            val in = fs.open(marker)
            val bytes =
              try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
              finally in.close()
            val w = new String(bytes, "UTF-8").trim.toLong
            if (w > 0) Some(w) else None
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    )

  /** Write ts rows into the partitioned layout. Directory keys are
    * duplicated from data columns (p_channel, p_bucket) so the data
    * columns survive in the files untouched. The bucket width is
    * recorded in a `_graft_bucket_us` marker inside the layout (an
    * underscore-prefixed file, so parquet listing ignores it) so
    * [[graft.plans.DeriveBucketFilter]] derives each layout's pruning
    * bounds with that layout's OWN width — mixing widths in one session
    * is safe.
    */
  def write(ts: DataFrame, path: String, bucketUs: Long = DayUs): Unit = {
    ts.withColumn("p_channel", col("channel"))
      // floor (not truncate-toward-zero) so negative timestamps land in
      // the bucket DeriveBucketFilter derives with Math.floorDiv
      .withColumn("p_bucket", floor(col("t") / lit(bucketUs.toDouble)).cast("long"))
      .repartition(col("p_channel"), col("p_bucket")) // one writer task per partition dir
      .write
      .partitionBy("p_channel", "p_bucket")
      .mode("overwrite")
      .parquet(path)
    val marker = new org.apache.hadoop.fs.Path(path, BucketMarker)
    val fs = marker.getFileSystem(ts.sparkSession.sessionState.newHadoopConf())
    val out = fs.create(marker, true)
    try out.write(bucketUs.toString.getBytes("UTF-8"))
    finally out.close()
    // a rewrite with a different width must invalidate the cached lookup
    widthCache.remove(canonKey(path))
  }

  /** Read a layout. Width handling needs no session step: the rule
    * resolves each scan's width from the layout's marker (see
    * [[markerWidth]]); markerless layouts fall back to
    * [[BucketUsConfKey]] or get no derived pruning at all.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compaction maintenance pass: rewrite a (possibly fragmented)
    * layout into `dstPath` with ONE writer task per partition
    * directory (bounded by maxRecordsPerFile), preserving the bucket
    * marker — the small-files problem is THE operational failure mode
    * of streaming/append ingest into a partitioned lake, and a
    * 100 TB layout pays it as listing latency and per-file open cost
    * on every read. The rewrite is a pure repartition-by-partition-key
    * plan (no wide shuffle beyond the partition hash), and the result
    * is row-identical by construction — the spec proves count, hash
    * equality, marker carry-over, and the file-count collapse.
    */
  def compact(
    spark: SparkSession,
    srcPath: String,
    dstPath: String,
    maxRecordsPerFile: Long = 5000000L
  ): Unit = {
    // the overwrite is lazy w.r.t. the read — compacting a layout onto
    // itself (or into a dir nested under itself) would truncate the
    // layout being read and destroy it
    val srcCanon = canonKey(srcPath)
    val dstCanon = canonKey(dstPath)
    require(
      srcCanon != dstCanon && !dstCanon.startsWith(srcCanon + java.io.File.separator) &&
        !srcCanon.startsWith(dstCanon + java.io.File.separator),
      s"compact src and dst must not coincide or nest either way " +
        s"(overwrite would truncate the layout being read): src=$srcCanon dst=$dstCanon"
    )
    spark.read
      .parquet(srcPath)
      .repartition(col("p_channel"), col("p_bucket"))
      .write
      .partitionBy("p_channel", "p_bucket")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(dstPath)
    markerWidth(srcPath, spark.sessionState.newHadoopConf()).foreach { w =>
      writeMarker(spark, dstPath, w)
    }
  }

  private def writeMarker(spark: SparkSession, path: String, bucketUs: Long): Unit = {
    val marker = new org.apache.hadoop.fs.Path(path, BucketMarker)
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(marker, true)
    try out.write(bucketUs.toString.getBytes("UTF-8"))
    finally out.close()
    widthCache.remove(canonKey(path))
  }

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

  // ---------------------------------------------------------------------
  // Fixed driver query: the layout end to end, pruning derived by rule
  // ---------------------------------------------------------------------

  /** Written-once-per-JVM layout for a testdata dir (overwritten on
    * first use, so a stale directory from an earlier run can't leak
    * in). Query-time setup, not query work — cached so benchmark reps
    * measure the read path.
    */
  private val layoutCache = scala.collection.concurrent.TrieMap[String, String]()

  def layoutFor(spark: SparkSession, dir: String): String =
    layoutCache.getOrElseUpdate(
      dir, {
        val path = CacheDirs.taggedCacheDir("target/ts_layout", dir).getAbsolutePath
        write(graft.Tables.ts(spark, dir).select(col("channel"), col("t"), col("v")), path)
        path
      }
    )

  /** The partitioned layout queried with ONLY channel + t predicates:
    * the p_bucket partition pruning is derived by the injected
    * [[graft.plans.DeriveBucketFilter]] optimizer rule (the automatic
    * analog of the reference's Postgres range-index lookup,
    * query/QuerySequencer.scala:68) — a user never has to mention the
    * partition key. PlanSpec asserts the scan's partition filters
    * carry the derived p_bucket bounds; the oracle checks the result
    * against the flat events table.
    *
    * The rule learns the width from the layout's own marker (written by
    * [[write]]), so no session conf step is needed and other layouts in
    * the same session — of any width — prune with their own widths.
    */
  def tsLayoutRange(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Timeseries
    val path = layoutFor(spark, dir)
    read(spark, path)
      .filter(
        col("p_channel").isin("click", "error") &&
          col("t") >= Timeseries.RangeStartUs && col("t") < Timeseries.RangeEndUs
      )
      .select(col("channel"), col("t"), col("v"))
      .orderBy(col("channel"), col("t"), col("v"))
  }

  val tsLayoutRangeSql: String = {
    import graft.operators.Timeseries
    s"""SELECT event_type AS channel, epoch_us(ts) AS t, value AS v
       |FROM events
       |WHERE event_type IN ('click','error')
       |  AND epoch_us(ts) >= ${Timeseries.RangeStartUs}
       |  AND epoch_us(ts) < ${Timeseries.RangeEndUs}
       |ORDER BY channel, t, v""".stripMargin
  }
}
