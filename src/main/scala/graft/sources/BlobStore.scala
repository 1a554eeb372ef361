package graft.sources

import graft.operators.Timeseries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end oracle proof for the reference blob format: a blob store
  * (gzipped big-endian float64 files + a range index — the S3+Postgres
  * analog, reference query/QuerySequencer.scala:68,
  * query/WsClient.scala:191-203) is BUILT from the events table by
  * regularizing each (channel, day) onto a uniform 1 Hz grid (sample i
  * of a day carries the day's i-th event value in (t, event_id)
  * order), then read back through
  * [[BinarySegments.readRangePartitioned]] — partition-path pruning,
  * byte-range decode, t reconstruction and all — and compared against
  * a plain SQL reconstruction of the same grid. Gzip+BE-double
  * round-trips bit-exactly, so every value hash-matches.
  *
  * The store is laid out as a hive-partitioned tree
  * (`channel=<ch>/bucket=<day>/data.bin`) and built DISTRIBUTED: one
  * (channel, day)-keyed exchange, each task writes its own groups'
  * blobs (a group buffers at most one day grid — 86,400 doubles — and
  * overflow fails loudly), and the only rows that ever reach the
  * driver are the index relation itself (one row per blob).
  */
object BlobStore {

  val PeriodUs = 1000000L // 1 Hz grid
  val DayUs = 86400000000L

  private val cache =
    scala.collection.concurrent.TrieMap[String, (String, Seq[(String, Long, Long, Long, Double)])]()
  // serialize fixture (re)builds: delete+rebuild of a cache dir must
  // never race another thread's build of the same dir
  private val buildLock = new Object

  /** Distributed store build: returns the index relation
    * (channel, bucket, start_us, end_us, rate), one row per blob
    * written. The input shuffles ONCE keyed by (channel, bucket) and
    * is sorted within partitions so each group is a contiguous run; a
    * task streams through its runs buffering one group's values at a
    * time (bounded by the bucket grid, loud overflow) and writes
    * `root/channel=<ch>/bucket=<n>/data.bin`. No data row is ever
    * collected to the driver — materializing the returned index is
    * blob-count-scale by construction.
    */
  def buildStore(
    ts: DataFrame,
    root: String,
    periodUs: Long = PeriodUs,
    bucketUs: Long = DayUs
  ): DataFrame = {
    val spark = ts.sparkSession
    import spark.implicits._
    val maxSamples = bucketUs / periodUs
    val rate = 1e6 / periodUs
    ts.select(col("channel"), expr(s"t div $bucketUs").as("bucket"), col("t"), col("v"), col("event_id"))
      .repartition(col("channel"), col("bucket"))
      .sortWithinPartitions(col("channel"), col("bucket"), col("t"), col("event_id"))
      .as[(String, Long, Long, Double, Long)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer[(String, Long, Long, Long, Double)]()
        val buf = scala.collection.mutable.ArrayBuffer[Double]()
        var curCh: String = null
        var curBkt = 0L
        def flush(): Unit = if (curCh != null && buf.nonEmpty) {
          require(
            buf.length <= maxSamples,
            s"BlobStore: ($curCh, bucket $curBkt) has ${buf.length} events — exceeds the $maxSamples-sample grid"
          )
          val dir = new java.io.File(root, s"channel=$curCh/bucket=$curBkt")
          dir.mkdirs()
          BinarySegments.writeBlob(new java.io.File(dir, "data.bin").getPath, buf.toArray)
          val start = curBkt * bucketUs
          out += ((curCh, curBkt, start, start + (buf.length - 1) * periodUs, rate))
          buf.clear()
        }
        it.foreach { case (ch, bkt, _, v, _) =>
          if (ch != curCh || bkt != curBkt) { flush(); curCh = ch; curBkt = bkt }
          buf += v
        }
        flush()
        out.iterator
      }
      .toDF("channel", "bucket", "start_us", "end_us", "rate")
  }

  /** (blobDir, index rows (channel, bucket, start_us, end_us, rate)) —
    * a per-JVM fixture cache like TsLayout/OrcLayout. The collect here
    * is of [[buildStore]]'s index relation only (one row per blob).
    */
  def storeFor(spark: SparkSession, dir: String): (String, Seq[(String, Long, Long, Long, Double)]) =
    cache.get(dir).getOrElse {
      buildLock.synchronized {
        cache.getOrElseUpdate(
          dir, {
            val root = CacheDirs.taggedCacheDir("target/ts_blobs", dir)
            if (root.exists()) {
              def del(f: java.io.File): Unit = {
                if (f.isDirectory) f.listFiles().foreach(del)
                f.delete(): Unit
              }
              del(root)
            }
            root.mkdirs()
            val index = buildStore(
              graft.Tables.ts(spark, dir).select(col("channel"), col("t"), col("v"), col("event_id")),
              root.getAbsolutePath
            ).collect()
              .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
              .toSeq
              .sortBy(x => (x._1, x._2))
            (root.getAbsolutePath, index)
          }
        )
      }
    }

  /** The fixed range query served from the blob store. */
  def tsBlobRange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (root, index) = storeFor(spark, dir)
    BinarySegments
      .readRangePartitioned(
        spark,
        root,
        index.toDF("channel", "bucket", "start_us", "end_us", "rate"),
        Timeseries.RangeStartUs,
        Timeseries.RangeEndUs,
        DayUs
      )
      .orderBy(col("channel"), col("t"))
  }

  /** SQL reconstruction of the same uniform grid: the i-th event of
    * each (channel, day) in (t, event_id) order sits at
    * day_start + i·period.
    */
  val tsBlobRangeSql: String =
    s"""WITH o AS (
       |  SELECT event_type AS channel,
       |    epoch_us(ts) // $DayUs AS day, value AS v,
       |    ROW_NUMBER() OVER (PARTITION BY event_type, epoch_us(ts) // $DayUs
       |                       ORDER BY epoch_us(ts), event_id) - 1 AS i
       |  FROM events),
       |g AS (SELECT channel, day * $DayUs + i * $PeriodUs AS t, v FROM o)
       |SELECT channel, t, v FROM g
       |WHERE t >= ${Timeseries.RangeStartUs} AND t < ${Timeseries.RangeEndUs}
       |ORDER BY channel, t""".stripMargin
}
