package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.ByteBuffer
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader for the reference engine's blob storage format: channel data
  * stored as gzip-compressed big-endian float64 runs, located by a
  * range index of (channel, file, start time, sample rate) rows.
  *
  * Reference: blobs are fetched and decoded as gzip → 8-byte chunks →
  * big-endian doubles (query/WsClient.scala:191-203,
  * query/TimeSeriesQueryUtils.scala:51-59); timestamps are
  * reconstructed as start + index * round(1e6 / rate)
  * (query/QuerySequencer.scala:82-87); the range index row carries
  * (min, max, rate, file) (server/TSJsonSupport.scala:151).
  *
  * Spark-native shape: `binaryFile` scan (one task per blob — thousands
  * of blobs decode in parallel), broadcast join against the small range
  * index, and a typed flatMap decode. At scale the blob tree is laid
  * out by channel/time-bucket directories so pushed path filters prune
  * files before the scan; the decoded rows then flow into the regular
  * trim/downsample operators (graft.operators.Timeseries) exactly like
  * parquet-sourced data.
  */
object BinarySegments {

  /** Decode one gzipped big-endian float64 blob. */
  def decodeBlob(bytes: Array[Byte]): Array[Double] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    val raw = out.toByteArray
    val bb = ByteBuffer.wrap(raw) // JVM default order is big-endian
    val vals = new Array[Double](raw.length / 8)
    var i = 0
    while (i < vals.length) { vals(i) = bb.getDouble(i * 8); i += 1 }
    vals
  }

  /** Write helper (tests / ingest demo): values → gzipped BE float64. */
  def writeBlob(path: String, values: Array[Double]): Unit = {
    val os = new GZIPOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    val bytes = new Array[Byte](8)
    val bb = ByteBuffer.wrap(bytes)
    values.foreach { v =>
      bb.clear()
      bb.putDouble(v)
      os.write(bytes)
    }
    os.close()
  }

  /** Read blobs under `blobDir` located by `index(channel, file,
    * start_us, rate)` into ts(channel, t, v) rows. The index is
    * broadcast (it is the Postgres-range-table analog — tiny next to
    * the data).
    */
  def read(spark: SparkSession, blobDir: String, index: DataFrame): DataFrame = {
    import spark.implicits._
    val blobs = spark.read
      .format("binaryFile")
      .load(blobDir)
      .select(substring_index(col("path"), "/", -1).as("file"), col("content"))
    blobs
      .join(broadcast(index.select(col("channel"), col("file"), col("start_us"), col("rate"))), Seq("file"))
      .select(col("channel"), col("start_us"), col("rate"), col("content"))
      .as[(String, Long, Double, Array[Byte])]
      .flatMap { case (channel, startUs, rate, content) =>
        val period = Math.round(1e6 / rate)
        decodeBlob(content).iterator.zipWithIndex.map { case (v, i) =>
          (channel, startUs + i * period, v)
        }
      }
      .toDF("channel", "t", "v")
  }

  /** Secondary ingest formats — thin, schema-checked loaders. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
