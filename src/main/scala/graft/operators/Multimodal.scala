package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads with typed
  * metadata, decoded/feature-extracted in bounded batches.
  *
  * The decode KERNEL is a clearly-marked deterministic STUB (no image /
  * audio codecs exist in this environment); everything around it — the
  * (payload binary, meta struct) schema, the typed mapPartitions with
  * explicit batch accumulation (the JVM shape of a vectorized
  * mapInPandas decode), and the feature-table output — is the real
  * pipeline and is what the tests cover.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no row-level
  * string materialization); batches bound peak decode memory
  * (batchSize × payload size), and the stage is map-side only — it
  * pipelines into whatever aggregation or dedup consumes the features.
  */
object Multimodal {

  /** Attach a binary payload + typed metadata to each document —
    * stands in for reading an image/audio column from storage. The
    * payload is the utf-8 text bytes; metadata mimics an image header
    * (deterministic pseudo width/height/format per doc).
    */
  def withPayloads(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("webp")), (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (col("doc_id") % 32 + 16).cast("int").as("width"),
        (col("doc_id") % 24 + 12).cast("int").as("height"),
        // byte length of the BINARY payload (length on binary counts
        // octets) — length(text) would count characters and diverge
        // from the oracle's octet_length on any non-ASCII document
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")
      ).as("meta")
    )

  /** STUB decode kernel — deterministic byte statistics standing in for
    * a real image decode + feature extraction. Replace the body with a
    * codec call (e.g. JNI image lib) without touching the Spark
    * plumbing. The checksum is a ×31 polynomial mod 2⁶¹−1 (not
    * wrap-around mod 2⁶⁴) and the moments are exact integer sums in
    * doubles, so the whole stub is reproducible by the SQL oracle from
    * hex-sliced payload bytes.
    */
  private[graft] def decodeStub(payload: Array[Byte]): (Long, Double, Double) = {
    import graft.functions.Winnow.{addmod, mulmod}
    var checksum = 0L
    var sum = 0L
    var sumSq = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      checksum = addmod(mulmod(checksum, 31L), b.toLong)
      sum += b
      sumSq += b.toLong * b
      i += 1
    }
    val n = math.max(payload.length, 1)
    val mean = sum.toDouble / n
    (checksum, mean, math.sqrt(math.max(sumSq.toDouble / n - mean * mean, 0.0)))
  }

  /** Batched decode: typed mapPartitions that accumulates `batchSize`
    * payloads, "decodes" the batch, and emits one feature row per
    * payload — the JVM analog of a vectorized Python decode over
    * mapInPandas batches.
    */
  def decodeFeatures(spark: SparkSession, withPayload: DataFrame, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    withPayload
      .select(
        col("doc_id"),
        col("payload"),
        col("meta.format").as("format"),
        col("meta.width").as("width"),
        col("meta.height").as("height")
      )
      .as[(Long, Array[Byte], String, Int, Int)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch boundary = unit of vectorized decode work
          batch.iterator.map { case (id, payload, format, w, h) =>
            val (checksum, mean, std) = decodeStub(payload)
            (id, format, w, h, payload.length.toLong, checksum, mean, std)
          }
        }
      }
      .toDF("doc_id", "format", "width", "height", "n_bytes", "checksum", "byte_mean", "byte_std")
  }

  /** STUB resize kernel: deterministic byte-decimation standing in for
    * an image resampling codec — keeps (outW × outH) bytes by striding
    * the payload. The real kernel drops in without touching the
    * plumbing.
    */
  private[graft] def resizeStub(payload: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val n = math.max(outW * outH, 1)
    val out = new Array[Byte](math.min(n, math.max(payload.length, 1)))
    if (payload.isEmpty) return out
    val stride = math.max(payload.length / out.length, 1)
    var i = 0
    while (i < out.length) {
      out(i) = payload(math.min(i * stride, payload.length - 1))
      i += 1
    }
    out
  }

  /** Batched resize: same typed-mapPartitions shape as decodeFeatures.
    * Output keeps the (payload, meta) struct contract established by
    * withPayloads — width/height carry the target dims, n_bytes the
    * actual resized byte count — so resize composes with decodeFeatures
    * and sampleFrames.
    */
  def resize(spark: SparkSession, withPayload: DataFrame, outW: Int, outH: Int, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload, format) =>
            val resized = resizeStub(payload, outW, outH)
            (id, resized, format)
          }
        }
      }
      .toDF("doc_id", "payload", "format")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          col("format"),
          lit(outW).as("width"),
          lit(outH).as("height"),
          length(col("payload")).cast("long").as("n_bytes")
        ).as("meta")
      )
  }

  /** Frame sampling for video-like payloads: treat the payload as a
    * sequence of fixed-size frames and keep every `everyK`-th one, each
    * emitted as its own row (the exploded shape downstream per-frame
    * decode consumes). Frame slicing is a pure expression; at scale the
    * explode multiplies rows map-side with no shuffle.
    */
  def sampleFrames(withPayload: DataFrame, frameBytes: Int, everyK: Int): DataFrame =
    withPayload
      .select(
        col("doc_id"),
        posexplode(
          // payloads with no complete frame yield zero rows (trailing
          // partial frames are dropped for full payloads, so short ones
          // must not sneak an undersized frame through)
          expr(
            s"CASE WHEN length(payload) < $frameBytes THEN array() " +
              s"ELSE transform(sequence(0, int(length(payload) / $frameBytes) - 1, $everyK), " +
              s"i -> substring(payload, i * $frameBytes + 1, $frameBytes)) END"
          )
        ).as(Seq("frame_idx", "frame"))
      )
      .select(
        col("doc_id"),
        (col("frame_idx") * everyK).cast("long").as("frame_no"),
        col("frame"),
        length(col("frame")).cast("long").as("frame_bytes")
      )

  /** STUB audio decode kernel: the payload read as little-endian int16
    * PCM, framed into `frameSamples`-sample windows (trailing partials
    * dropped), each frame reduced to RMS energy and a zero-crossing
    * count — the two features every audio-curation pipeline computes
    * first (silence/clipping gates, speech-band heuristics). A real
    * codec (resampling, mel filterbanks) drops into this kernel
    * without touching the Spark plumbing. Integer sums keep the stub
    * bit-reproducible by the SQL oracle.
    */
  private[graft] def audioStub(
      payload: Array[Byte],
      frameSamples: Int
  ): Seq[(Long, Double, Long)] = {
    val nSamples = payload.length / 2
    val nFrames = nSamples / frameSamples
    (0 until nFrames).map { f =>
      var j = 0
      var sumSq = 0L
      var zc = 0L
      var prevNeg = false
      while (j < frameSamples) {
        val base = 2 * (f * frameSamples + j)
        var v = (payload(base) & 0xff) | ((payload(base + 1) & 0xff) << 8)
        if (v >= 0x8000) v -= 0x10000
        sumSq += v.toLong * v
        val neg = v < 0
        if (j > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        j += 1
      }
      (f.toLong, math.sqrt(sumSq.toDouble / frameSamples), zc)
    }
  }

  /** Batched audio feature extraction: same typed-mapPartitions shape
    * as decodeFeatures — payloads stay opaque bytes, batches bound
    * decode memory, frames explode map-side with no shuffle.
    */
  def audioFeatures(
      spark: SparkSession,
      withPayload: DataFrame,
      frameSamples: Int = 32,
      batchSize: Int = 64
  ): DataFrame = {
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, payload) =>
            audioStub(payload, frameSamples).iterator.map { case (f, rms, zc) =>
              (id, f, frameSamples.toLong, rms, zc)
            }
          }
        }
      }
      .toDF("doc_id", "frame_no", "n_samples", "rms", "zero_crossings")
  }

  // ---------------------------------------------------------------------
  // Fixed driver query (rows-only: the decode stub is not SQL semantics;
  // schema/batching correctness is covered by MultimodalSpec)
  // ---------------------------------------------------------------------

  def mmDecode(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, withPayloads(Tables.documents(spark, dir)))
      .select(
        col("doc_id"),
        col("format"),
        col("width"),
        col("height"),
        col("n_bytes"),
        col("checksum"),
        round(col("byte_mean"), 6).as("byte_mean"),
        round(col("byte_std"), 6).as("byte_std")
      )
      .orderBy(col("doc_id"))

  /** Stub-decode oracle: payload bytes are recovered in SQL by hex-ing
    * the UTF-8 blob and slicing two hex digits per byte; the checksum
    * is the same ×31 polynomial mod 2⁶¹−1 (list_reduce in HUGEINT) and
    * the moments are exact integer sums, so every feature value matches
    * the kernel bit for bit. Empty payloads degrade to (0, 0, 0) as in
    * the kernel.
    */
  val mmDecodeSql: String = {
    val p = graft.functions.Winnow.P
    s"""WITH p AS (
       |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb,
       |    list_extract(['png', 'jpeg', 'webp'], CAST(doc_id % 3 + 1 AS INT)) AS format,
       |    CAST(doc_id % 32 + 16 AS INT) AS width,
       |    CAST(doc_id % 24 + 12 AS INT) AS height
       |  FROM documents),
       |bvals AS (
       |  SELECT doc_id, i,
       |    CAST(('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2)) AS INT) AS b
       |  FROM (SELECT doc_id, hx, UNNEST(range(0, nb)) AS i FROM p) t),
       |stats AS (
       |  SELECT doc_id, COUNT(*) AS cnt, SUM(b) AS s1, SUM(CAST(b AS BIGINT) * b) AS s2,
       |    CAST(list_reduce(list(CAST(b AS HUGEINT) ORDER BY i),
       |                     (h, c) -> (h * 31 + c) % $p) AS BIGINT) AS chk
       |  FROM bvals GROUP BY doc_id)
       |SELECT p.doc_id, p.format, p.width, p.height,
       |  CAST(p.nb AS BIGINT) AS n_bytes,
       |  COALESCE(s.chk, 0) AS checksum,
       |  ROUND(CAST(COALESCE(s.s1, 0) AS DOUBLE) / GREATEST(p.nb, 1), 6) AS byte_mean,
       |  ROUND(SQRT(GREATEST(CAST(COALESCE(s.s2, 0) AS DOUBLE) / GREATEST(p.nb, 1)
       |    - (CAST(COALESCE(s.s1, 0) AS DOUBLE) / GREATEST(p.nb, 1))
       |      * (CAST(COALESCE(s.s1, 0) AS DOUBLE) / GREATEST(p.nb, 1)), 0.0)), 6) AS byte_std
       |FROM p LEFT JOIN stats s ON s.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin
  }

  /** Pipeline composition: resize → decodeFeatures — the thumbnail
    * stage every vision-data pipeline runs, exercising the struct
    * contract BETWEEN multimodal operators (resize output feeds the
    * same batched decode that whole payloads do). Map-side end to end.
    */
  def mmResize(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, resize(spark, withPayloads(Tables.documents(spark, dir)), outW = 8, outH = 8))
      .select(
        col("doc_id"),
        col("format"),
        col("width"),
        col("height"),
        col("n_bytes"),
        col("checksum"),
        round(col("byte_mean"), 6).as("byte_mean"),
        round(col("byte_std"), 6).as("byte_std")
      )
      .orderBy(col("doc_id"))

  /** Resize-chain oracle: the stub's stride decimation reproduced on
    * hex-sliced bytes — resized byte i = payload[min(i·stride, nb−1)]
    * with out_len = min(64, max(nb, 1)), stride = max(nb // out_len,
    * 1) — then the same decode features as mmDecodeSql over the
    * decimated bytes (an empty payload degrades to one zero byte,
    * exactly as the kernel allocates).
    */
  val mmResizeSql: String = {
    val p = graft.functions.Winnow.P
    s"""WITH p AS (
       |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb,
       |    list_extract(['png', 'jpeg', 'webp'], CAST(doc_id % 3 + 1 AS INT)) AS format
       |  FROM documents),
       |dims AS (
       |  SELECT doc_id, hx, nb,
       |    LEAST(64, GREATEST(nb, 1)) AS out_len,
       |    GREATEST(nb // LEAST(64, GREATEST(nb, 1)), 1) AS stride
       |  FROM p),
       |rvals AS (
       |  SELECT doc_id, i,
       |    CASE WHEN nb = 0 THEN 0
       |         ELSE CAST(('0x' || substr(hx, CAST(2 * LEAST(i * stride, nb - 1) + 1 AS INT), 2)) AS INT)
       |    END AS b
       |  FROM (SELECT doc_id, hx, nb, stride, UNNEST(range(0, out_len)) AS i FROM dims) t),
       |stats AS (
       |  SELECT doc_id, COUNT(*) AS cnt, SUM(b) AS s1, SUM(CAST(b AS BIGINT) * b) AS s2,
       |    CAST(list_reduce(list(CAST(b AS HUGEINT) ORDER BY i),
       |                     (h, c) -> (h * 31 + c) % $p) AS BIGINT) AS chk
       |  FROM rvals GROUP BY doc_id)
       |SELECT p.doc_id, p.format, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
       |  CAST(s.cnt AS BIGINT) AS n_bytes,
       |  s.chk AS checksum,
       |  ROUND(CAST(s.s1 AS DOUBLE) / s.cnt, 6) AS byte_mean,
       |  ROUND(SQRT(GREATEST(CAST(s.s2 AS DOUBLE) / s.cnt
       |    - (CAST(s.s1 AS DOUBLE) / s.cnt) * (CAST(s.s1 AS DOUBLE) / s.cnt), 0.0)), 6) AS byte_std
       |FROM p JOIN stats s ON s.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin
  }

  /** Pipeline composition: sampleFrames → per-frame decodeFeatures.
    * Each sampled frame is re-wrapped in the (doc_id, payload, meta)
    * contract — (doc_id, frame_no) packed into one key — so the SAME
    * batched decode stage consumes whole payloads and exploded frames
    * interchangeably. Map-side end to end: explode, slice, decode all
    * pipeline inside one stage with no shuffle before the final sort.
    */
  def mmFrames(spark: SparkSession, dir: String): DataFrame = {
    val frames = sampleFrames(withPayloads(Tables.documents(spark, dir)), frameBytes = 64, everyK = 4)
    // (doc_id, frame_no) packed as doc_id·2³² | frame_no: sound for
    // doc_id < 2³¹ and frame_no < 2³² (a 2³²-frame payload is 256 GB —
    // beyond any single-blob design point)
    val framePayloads = frames.select(
      (shiftleft(col("doc_id"), 32).bitwiseOR(col("frame_no"))).as("doc_id"),
      col("frame").as("payload"),
      struct(
        lit("frame").as("format"),
        lit(8).as("width"),
        lit(8).as("height"),
        col("frame_bytes").as("n_bytes")
      ).as("meta")
    )
    decodeFeatures(spark, framePayloads)
      .select(
        shiftrightunsigned(col("doc_id"), 32).as("doc_id"),
        col("doc_id").bitwiseAND(lit(0xffffffffL)).as("frame_no"),
        col("n_bytes"),
        col("checksum"),
        round(col("byte_mean"), 6).as("byte_mean"),
        round(col("byte_std"), 6).as("byte_std")
      )
      .orderBy(col("doc_id"), col("frame_no"))
  }

  /** Audio modality end to end: payload → int16 PCM frames → RMS +
    * zero crossings. Map-side until the output sort.
    */
  def mmAudio(spark: SparkSession, dir: String): DataFrame =
    audioFeatures(spark, withPayloads(Tables.documents(spark, dir)))
      .select(
        col("doc_id"),
        col("frame_no"),
        col("n_samples"),
        round(col("rms"), 6).as("rms"),
        col("zero_crossings")
      )
      .orderBy(col("doc_id"), col("frame_no"))

  /** Audio oracle: sample j of frame f is the little-endian int16 at
    * byte offset 2·(32f + j) — two hex-sliced bytes recombined and
    * sign-folded; RMS from the exact integer square sum, crossings by
    * a LAG window over sample order. Trailing partial frames drop via
    * the (nb // 2) // 32 frame count, exactly as the kernel does.
    */
  val mmAudioSql: String =
    s"""WITH p AS (
       |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb FROM documents),
       |fr AS (
       |  SELECT doc_id, hx, UNNEST(range(0, (nb // 2) // 32)) AS fno FROM p),
       |sv AS (
       |  SELECT doc_id, fno, j,
       |    CAST(('0x' || substr(hx, CAST(2 * (fno * 64 + 2 * j) + 1 AS INT), 2)) AS INT)
       |      + 256 * CAST(('0x' || substr(hx, CAST(2 * (fno * 64 + 2 * j + 1) + 1 AS INT), 2)) AS INT) AS raw
       |  FROM (SELECT doc_id, fno, hx, UNNEST(range(0, 32)) AS j FROM fr) t),
       |sval AS (
       |  SELECT doc_id, fno, j,
       |    CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
       |  FROM sv),
       |lagd AS (
       |  SELECT doc_id, fno, v,
       |    LAG(v) OVER (PARTITION BY doc_id, fno ORDER BY j) AS pv
       |  FROM sval),
       |stats AS (
       |  SELECT doc_id, fno,
       |    SUM(CAST(v AS BIGINT) * v) AS ss,
       |    CAST(SUM(CASE WHEN pv IS NOT NULL AND ((v < 0) <> (pv < 0)) THEN 1 ELSE 0 END) AS BIGINT) AS zc
       |  FROM lagd GROUP BY doc_id, fno)
       |SELECT doc_id, CAST(fno AS BIGINT) AS frame_no, CAST(32 AS BIGINT) AS n_samples,
       |  ROUND(SQRT(CAST(ss AS DOUBLE) / 32), 6) AS rms,
       |  zc AS zero_crossings
       |FROM stats
       |ORDER BY doc_id, frame_no""".stripMargin

  /** Frame-chain oracle: every 4th complete 64-byte frame, features by
    * the same hex-sliced byte recovery as mmDecodeSql — frame f's byte
    * j sits at hex offset 2·(64f + j).
    */
  val mmFramesSql: String = {
    val p = graft.functions.Winnow.P
    s"""WITH p AS (
       |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb FROM documents),
       |sampled AS (
       |  SELECT doc_id, fno, hx
       |  FROM (SELECT doc_id, hx, UNNEST(range(0, nb // 64)) AS fno FROM p) t
       |  WHERE fno % 4 = 0),
       |fvals AS (
       |  SELECT doc_id, fno, j,
       |    CAST(('0x' || substr(hx, CAST(2 * (fno * 64 + j) + 1 AS INT), 2)) AS INT) AS b
       |  FROM (SELECT doc_id, fno, hx, UNNEST(range(0, 64)) AS j FROM sampled) t),
       |stats AS (
       |  SELECT doc_id, fno, SUM(b) AS s1, SUM(CAST(b AS BIGINT) * b) AS s2,
       |    CAST(list_reduce(list(CAST(b AS HUGEINT) ORDER BY j),
       |                     (h, c) -> (h * 31 + c) % $p) AS BIGINT) AS chk
       |  FROM fvals GROUP BY doc_id, fno)
       |SELECT doc_id, fno AS frame_no, CAST(64 AS BIGINT) AS n_bytes, chk AS checksum,
       |  ROUND(CAST(s1 AS DOUBLE) / 64, 6) AS byte_mean,
       |  ROUND(SQRT(GREATEST(CAST(s2 AS DOUBLE) / 64
       |    - (CAST(s1 AS DOUBLE) / 64) * (CAST(s1 AS DOUBLE) / 64), 0.0)), 6) AS byte_std
       |FROM stats
       |ORDER BY doc_id, frame_no""".stripMargin
  }
}
