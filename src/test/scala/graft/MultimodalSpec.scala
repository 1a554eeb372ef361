package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  "withPayloads" should "produce the binary + typed-metadata schema" in {
    val df = Multimodal.withPayloads(Tables.documents(spark, sfDir))
    df.schema("payload").dataType shouldBe BinaryType
    val meta = df.schema("meta").dataType.asInstanceOf[StructType]
    meta("format").dataType shouldBe StringType
    meta("width").dataType shouldBe IntegerType
    meta("n_bytes").dataType shouldBe LongType
    df.filter($"payload".isNull).count() shouldBe 0L
  }

  "decodeFeatures" should "emit one deterministic feature row per payload regardless of batch size" in {
    val docs = Tables.documents(spark, sfDir)
    val p = Multimodal.withPayloads(docs)
    val f1 = Multimodal.decodeFeatures(spark, p, batchSize = 7).orderBy("doc_id").collect()
    val f2 = Multimodal.decodeFeatures(spark, p, batchSize = 256).orderBy("doc_id").collect()
    f1.length shouldBe docs.count()
    f1 shouldBe f2 // batch shape must not affect results
  }

  "resize" should "emit resized payloads keeping the composable (payload, meta) shape" in {
    val p = Multimodal.withPayloads(Tables.documents(spark, sfDir))
    val r = Multimodal.resize(spark, p, outW = 8, outH = 8)
    r.count() shouldBe p.count()
    r.filter($"meta.n_bytes" > 64).count() shouldBe 0L
    r.select($"meta.width").distinct().as[Int].collect().toList shouldBe List(8)
    // composes with the other payload operators
    Multimodal.decodeFeatures(spark, r).count() shouldBe p.count()
    // deterministic: same input -> same resized bytes
    val a = r.orderBy("doc_id").select("payload").as[Array[Byte]].first()
    val b = Multimodal.resize(spark, p, 8, 8).orderBy("doc_id").select("payload").as[Array[Byte]].first()
    a.toSeq shouldBe b.toSeq
  }

  "sampleFrames" should "emit no rows for payloads without one complete frame" in {
    val df = Seq((1L, Array.tabulate(5)(_.toByte)), (2L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
    Multimodal.sampleFrames(df, frameBytes = 10, everyK = 1).count() shouldBe 0L
  }

  "sampleFrames" should "keep every k-th fixed-size frame as its own row" in {
    val payload = (0 until 100).map(_.toByte).toArray // 10 frames of 10 bytes
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    val frames = Multimodal
      .sampleFrames(df, frameBytes = 10, everyK = 3)
      .orderBy("frame_no")
      .collect()
    frames.map(_.getAs[Long]("frame_no")).toList shouldBe List(0L, 3L, 6L, 9L)
    frames.foreach(_.getAs[Long]("frame_bytes") shouldBe 10L)
    // frame 3 starts at byte 30
    frames(1).getAs[Array[Byte]]("frame")(0) shouldBe 30.toByte
  }

  it should "match the stub kernel run directly on the payload bytes" in {
    val payload = "hello multimodal".getBytes("UTF-8")
    val (checksum, mean, std) = Multimodal.decodeStub(payload)
    val row = Multimodal
      .decodeFeatures(spark, Seq((1L, payload, "png", 16, 12)).toDF("doc_id", "payload", "format", "width", "height")
        .select($"doc_id", $"payload", struct($"format", $"width", $"height", lit(16L).as("n_bytes")).as("meta")))
      .head()
    row.getAs[Long]("checksum") shouldBe checksum
    row.getAs[Double]("byte_mean") shouldBe mean +- 1e-12
    row.getAs[Double]("byte_std") shouldBe std +- 1e-12
  }

  "mmFrames" should "decode exactly the sampled frames with per-frame stub features" in {
    val frames = Multimodal
      .sampleFrames(Multimodal.withPayloads(Tables.documents(spark, sfDir)), frameBytes = 64, everyK = 4)
      .as[(Long, Long, Array[Byte], Long)]
      .collect()
    frames.length should be > 0
    val got = Multimodal.mmFrames(spark, sfDir).collect()
    got.length shouldBe frames.length
    // every output row's checksum is the stub kernel on that frame slice
    val expected = frames.map { case (id, no, frame, _) => (id, no) -> Multimodal.decodeStub(frame)._1 }.toMap
    got.foreach { r =>
      r.getAs[Long]("checksum") shouldBe expected((r.getAs[Long]("doc_id"), r.getAs[Long]("frame_no")))
    }
  }

  "audioStub" should "recover alternating-sign PCM with full crossings and exact RMS" in {
    // 32 samples alternating +1000 / -1000, little-endian int16
    val bytes = new Array[Byte](64)
    for (j <- 0 until 32) {
      val v = if (j % 2 == 0) 1000 else -1000
      bytes(2 * j) = (v & 0xff).toByte
      bytes(2 * j + 1) = ((v >> 8) & 0xff).toByte
    }
    val frames = Multimodal.audioStub(bytes, 32)
    frames should have size 1
    val (fno, rms, zc) = frames.head
    fno shouldBe 0L
    rms shouldBe 1000.0 +- 1e-9
    zc shouldBe 31L // every adjacent pair flips sign
  }

  it should "drop trailing partial frames and frame constant input with zero crossings" in {
    // 150 bytes of 'a' → 75 samples → 2 complete 32-sample frames
    val bytes = Array.fill(150)('a'.toByte)
    val frames = Multimodal.audioStub(bytes, 32)
    frames.map(_._1) shouldBe Seq(0L, 1L)
    // every sample is 0x6161 = 24929 → rms is the constant, no crossings
    frames.foreach { case (_, rms, zc) =>
      rms shouldBe 24929.0 +- 1e-9
      zc shouldBe 0L
    }
  }

  "audioFeatures" should "emit the stub's frames through the batched decode stage" in {
    val docs = Seq((7L, "a" * 128), (8L, "xy")).toDF("doc_id", "text")
    val rows = Multimodal
      .audioFeatures(spark, Multimodal.withPayloads(docs))
      .orderBy($"doc_id", $"frame_no")
      .collect()
    // doc 7: 128 bytes → 64 samples → 2 frames; doc 8: 1 sample → none
    rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_no"))) shouldBe
      Array((7L, 0L), (7L, 1L))
    rows.foreach(_.getAs[Long]("n_samples") shouldBe 32L)
  }

  "aHashBands" should "set exactly the above-mean grid bits in the right band words" in {
    // 64 bytes: first 32 are 0x00, last 32 are 0xff (identity grid at
    // nb=64): mean 127.5 → bits 32..63 set → bands (0, 0, 0xffff, 0xffff)
    val payload = Array.fill[Byte](32)(0) ++ Array.fill[Byte](32)(0xff.toByte)
    Multimodal.aHashBands(payload).toList shouldBe List(0, 0, 0xffff, 0xffff)
    // constant payload: nothing strictly exceeds the mean → all-zero hash
    Multimodal.aHashBands(Array.fill[Byte](64)(7)).toList shouldBe List(0, 0, 0, 0)
  }

  "mmPhashClusters" should "collapse each planted twin into its original's component" in {
    val got = Multimodal
      .mmPhashClusters(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster"))
      .toMap
    // every planted byte-identical twin (doc_id % 13 == 0 → +2e6) must
    // share a component with its original
    val planted = got.keys.filter(_ >= 2000000L)
    planted should not be empty
    planted.foreach { twin =>
      got(twin) shouldBe got(twin - 2000000L)
    }
  }

  "phashNearDups" should "pair byte-identical payloads at hamming 0 and skip dissimilar ones" in {
    val docs = Seq(
      (1L, "a" * 32 + "z" * 32),
      (2L, "a" * 32 + "z" * 32), // identical twin
      (3L, "q" * 13 + "B" * 51) // different bit pattern
    ).toDF("doc_id", "text")
    val got = Multimodal
      .phashNearDups(spark, Multimodal.withPayloads(docs))
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Long)]
      .collect()
      .toList
    got shouldBe List((1L, 2L, 0L))
  }

  "audioVad" should "merge consecutive voiced frames into segments and split at gaps" in {
    // 'z' pairs decode to int16 0x7a7a = 31354 (loud); ' !' pairs to
    // 0x2120 = 8480 (quiet). One frame = 32 samples = 64 bytes.
    val loud = "z" * 64
    val quiet = " !" * 32
    // frames: loud, loud, quiet, loud → segments [0,1] and [3,3]
    val docs = Seq((7L, loud + loud + quiet + loud)).toDF("doc_id", "text")
    val got = Multimodal
      .audioVad(spark, Multimodal.withPayloads(docs), thresholdRms = 20000.0)
      .orderBy("seg")
      .select("seg", "start_frame", "end_frame", "n_frames")
      .as[(Long, Long, Long, Long)]
      .collect()
      .toList
    got shouldBe List((0L, 0L, 1L, 2L), (1L, 3L, 3L, 1L))
  }

  it should "emit nothing when no frame clears the threshold" in {
    val docs = Seq((1L, " !" * 64)).toDF("doc_id", "text")
    Multimodal
      .audioVad(spark, Multimodal.withPayloads(docs), thresholdRms = 20000.0)
      .count() shouldBe 0L
  }

  "payloadEntropy" should "score constant bytes zero and uniform bytes ln(k)" in {
    val docs = Seq(
      (1L, "aaaa"), // one byte value: H = 0
      (2L, "abcd"), // four equiprobable values: H = ln 4
      (3L, "aab") // H = ln3 - (2 ln2)/3
    ).toDF("doc_id", "text")
    val got = Multimodal
      .payloadEntropy(spark, Multimodal.withPayloads(docs))
      .orderBy("doc_id")
      .collect()
    got(0).getAs[Double]("byte_entropy") shouldBe 0.0
    got(0).getAs[Long]("n_uniq_bytes") shouldBe 1L
    got(1).getAs[Double]("byte_entropy") shouldBe math.log(4.0) +- 1e-6
    got(2).getAs[Double]("byte_entropy") shouldBe
      (math.log(3.0) - 2 * math.log(2.0) / 3) +- 1e-6
  }

  "shotSegments" should "cut a new shot at a mean-intensity jump and merge steady frames" in {
    // sampled frames are every 4th 64-byte frame: 'a'*256 + 'z'*64
    // samples frames 0 ('a', mean 97) and 4 ('z', mean 122): jump 25
    // → two shots; 'b'*320 samples two steady frames → one shot
    val frames = Seq(
      (1L, 0L, 97.0),
      (1L, 4L, 122.0),
      (2L, 0L, 98.0),
      (2L, 4L, 98.0)
    ).toDF("doc_id", "frame_no", "byte_mean")
    val got = Multimodal
      .shotSegments(frames, tau = 3.0)
      .orderBy("doc_id", "shot")
      .select("doc_id", "shot", "start_frame", "end_frame", "n_frames")
      .as[(Long, Long, Long, Long, Long)]
      .collect()
      .toList
    got shouldBe List(
      (1L, 0L, 0L, 0L, 1L),
      (1L, 1L, 4L, 4L, 1L),
      (2L, 0L, 0L, 4L, 2L)
    )
  }

  it should "detect the planted jump end to end through the sampled frame chain" in {
    val docs = Seq(
      (1L, "a" * 256 + "z" * 64),
      (2L, "b" * 320)
    ).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
      Multimodal.withPayloads(docs),
      frameBytes = 64,
      everyK = 4
    )
    frames.count() shouldBe 4L // two sampled frames per doc
    val shots = Multimodal
      .shotSegments(
        Multimodal.mmFramesFeatures(spark, docs),
        tau = 3.0
      )
      .groupBy("doc_id")
      .count()
      .as[(Long, Long)]
      .collect()
      .toMap
    shots(1L) shouldBe 2L
    shots(2L) shouldBe 1L
  }

  "audioConstellationMatch" should "vote a shifted twin to its offset and respect the admission cap" in {
    import spark.implicits._
    def pcmSeq(bands: Seq[Int]): Array[Byte] = {
      val out = new Array[Byte](bands.size * 32 * 2)
      for ((k, f) <- bands.zipWithIndex; j <- 0 until 32) {
        val v = math.round(8000.0 * math.sin(2 * math.Pi * k * j / 32.0)).toInt
        val idx = 2 * (f * 32 + j)
        out(idx) = (v & 0xff).toByte
        out(idx + 1) = ((v >> 8) & 0xff).toByte
      }
      out
    }
    val seqA = Seq(1, 2, 3, 4, 1, 3, 2, 4)
    val payloads = Seq(
      (1L, pcmSeq(seqA)),
      (2L, pcmSeq(seqA.drop(1))), // first frame dropped: shifted twin
      (3L, pcmSeq(Seq.fill(8)(4))) // constant tone, unrelated
    ).toDF("doc_id", "payload")
    val rows = Multimodal.audioConstellationMatch(spark, payloads).collect()
    rows should have length 1
    rows.head.getAs[Long]("doc_a") shouldBe 1L
    rows.head.getAs[Long]("doc_b") shouldBe 2L
    // twin frame w aligns with original frame w+1 -> offset +1, and
    // every one of the twin's 5 windows votes for it
    rows.head.getAs[Long]("delta") shouldBe 1L
    rows.head.getAs[Long]("votes") shouldBe 5L
    // counted admission: at cap 1 every shared signature is "hot" and
    // drops before the pair product -> no matches, by construction
    Multimodal.audioConstellationMatch(spark, payloads, cap = 1L).collect() shouldBe empty
  }

  "audioFingerprint" should "land on the planted tone's band, invariant to gain" in {
    import spark.implicits._
    // three frames of a k=2 tone at two different gains, one of k=3
    def pcm(k: Int, amp: Double, frames: Int): Array[Byte] = {
      val out = new Array[Byte](frames * 32 * 2)
      for (f <- 0 until frames; j <- 0 until 32) {
        val v = math.round(amp * math.sin(2 * math.Pi * k * j / 32.0)).toInt
        val idx = 2 * (f * 32 + j)
        out(idx) = (v & 0xff).toByte
        out(idx + 1) = ((v >> 8) & 0xff).toByte
      }
      out
    }
    val payloads = Seq(
      (1L, pcm(2, 9000.0, 3)),
      (2L, pcm(2, 900.0, 3)), // same tone, 10x quieter
      (3L, pcm(3, 5000.0, 2))
    ).toDF("doc_id", "payload")
    val got = Multimodal
      .audioFingerprint(spark, payloads)
      .orderBy("doc_id", "frame_no")
      .collect()
    got.length shouldBe 8
    got.filter(_.getAs[Long]("doc_id") <= 2L).foreach { r =>
      r.getAs[Long]("dom_band") shouldBe 2L
      r.getAs[Double]("power_share") should be > 0.95
    }
    got.filter(_.getAs[Long]("doc_id") == 3L).foreach { r =>
      r.getAs[Long]("dom_band") shouldBe 3L
    }
    // gain invariance of the share (the dedup-landmark property)
    val s1 = got.filter(_.getAs[Long]("doc_id") == 1L).head.getAs[Double]("power_share")
    val s2 = got.filter(_.getAs[Long]("doc_id") == 2L).head.getAs[Double]("power_share")
    s1 shouldBe s2 +- 0.01
  }

  "crossModalTopK" should "rank the aligned text embedding first when encoders agree" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // replicate the stub image encoder for each doc's payload…
    def centeredGrid(text: String): Array[Float] = {
      val p = text.getBytes("UTF-8")
      val g = Multimodal.resizeStub(p, 8, 8)
      val n = math.max(g.length, 1)
      val mean = g.map(b => (b & 0xff).toLong).sum.toDouble / n
      val v = new Array[Float](64)
      g.zipWithIndex.foreach { case (b, i) => v(i) = ((b & 0xff).toDouble - mean).toFloat }
      v
    }
    val texts = Seq(
      0L -> "alpha beta gamma delta epsilon zeta",
      1L -> "quick brown foxes jump over lazy dogs daily",
      2L -> "numbers one two three four five six seven"
    )
    val docs = texts.toDF("doc_id", "text")
    // …as the text-side embedding: a perfectly aligned dual encoder,
    // so cross-modal top-1 for query i must be text i at cosine ~1
    val emb = texts.map { case (i, t) => (i, centeredGrid(t)) }.toDF("vec_id", "embedding")
    val top1 = Multimodal
      .crossModalTopK(docs, emb, k = 1)
      .orderBy(col("query_id"))
      .collect()
    top1.length shouldBe 3
    top1.foreach { r =>
      r.getAs[Long]("text_id") shouldBe r.getAs[Long]("query_id")
      r.getAs[Double]("cosine") shouldBe (1.0 +- 1e-6)
    }
  }
}
