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
  * order), then read back through [[BinarySegments.readRange]] — index
  * pruning, byte-range decode, t reconstruction and all — and compared
  * against a plain SQL reconstruction of the same grid. Gzip+BE-double
  * round-trips bit-exactly, so every value hash-matches.
  *
  * The store build is driver-side fixture construction (one pass,
  * cached per JVM like TsLayout/OrcLayout); the QUERY under test is
  * the distributed readRange path.
  */
object BlobStore {

  val PeriodUs = 1000000L // 1 Hz grid
  val DayUs = 86400000000L

  private val cache =
    scala.collection.concurrent.TrieMap[String, (String, Seq[(String, String, Long, Long, Double)])]()

  /** (blobDir, index rows (channel, file, start_us, end_us, rate)). */
  def storeFor(spark: SparkSession, dir: String): (String, Seq[(String, String, Long, Long, Double)]) =
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
        val rows = graft.Tables
          .ts(spark, dir)
          .select(col("channel"), col("t"), col("v"), col("event_id"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        val index = rows
          .groupBy { case (ch, t, _, _) => (ch, t / DayUs) }
          .toSeq
          .sortBy(_._1)
          .map { case ((ch, day), group) =>
            val values = group.sortBy { case (_, t, _, id) => (t, id) }.map(_._3)
            // a 1 Hz day holds at most 86,400 samples; overflowing the
            // boundary would collide with the next day's grid — fail
            // loudly rather than emit duplicate timestamps
            require(
              values.length <= (DayUs / PeriodUs),
              s"BlobStore: (${ch}, day $day) has ${values.length} events — exceeds the ${DayUs / PeriodUs}-sample day grid"
            )
            val chDir = new java.io.File(root, ch)
            chDir.mkdirs()
            val rel = s"$ch/day_$day.bin"
            BinarySegments.writeBlob(new java.io.File(root, rel).getPath, values)
            val start = day * DayUs
            (ch, rel, start, start + (values.length - 1) * PeriodUs, 1e6 / PeriodUs)
          }
        (root.getAbsolutePath, index)
      }
    )

  /** The fixed range query served from the blob store. */
  def tsBlobRange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (root, index) = storeFor(spark, dir)
    BinarySegments
      .readRange(
        spark,
        root,
        index.toDF("channel", "file", "start_us", "end_us", "rate"),
        Timeseries.RangeStartUs,
        Timeseries.RangeEndUs
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
