package graft

import java.sql.Timestamp

import graft.streaming.RealtimeDownsample
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  "RealtimeDownsample.downsample" should "emit finalized windowed min/max segments" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val out = RealtimeDownsample.downsample(
      mem.toDF().toDF("channel", "ts", "v"),
      windowDuration = "10 seconds",
      watermarkDelay = "5 seconds"
    )
    val q = out.writeStream.format("memory").queryName("seg_out").outputMode("append").start()
    try {
      // two full windows for channel a, then advance watermark far enough
      mem.addData(("a", ts(1), 1.0), ("a", ts(5), 9.0), ("a", ts(12), -3.0))
      q.processAllAvailable()
      mem.addData(("a", ts(60), 0.0)) // watermark jumps; earlier windows finalize
      q.processAllAvailable()

      val rows = spark
        .table("seg_out")
        .orderBy("window_start")
        .select($"channel", $"vmin", $"vmax", $"n")
        .as[(String, Double, Double, Long)]
        .collect()
        .toList
      rows shouldBe List(("a", 1.0, 9.0, 2L), ("a", -3.0, -3.0, 1L))
    } finally q.stop()
  }

  "RealtimeResample" should "keep the resampled stream gap-free across segments (reference IngestSegmentSpec property)" in {
    import graft.streaming.RealtimeResample
    import RealtimeResample.IngestSegment
    // a contiguous run of ingest segments at samplePeriod 100 resampled
    // to pixel duration 500 must produce contiguous min/max chunks
    val samplePeriod = 100.0
    val perPacket = 50
    val packets = (0 until 100).map { i =>
      IngestSegment("ch", (i.toLong * perPacket * samplePeriod.toLong), samplePeriod,
        (0 until perPacket).map(j => math.sin((i * perPacket + j) / 10.0)))
    }
    val segs = packets.map(RealtimeResample.resampleMessage(_, 500))
    segs.foreach { s =>
      s.isMinMax shouldBe true
      s.nrPoints shouldBe 10 // 50 samples * 100 µs / 500 µs
      s.data.length shouldBe 20
    }
    // reconstruct chunk times: startTs + k * samplePeriod; consecutive
    // segments must abut exactly (no gaps, no overlap)
    val chunkTimes = segs.flatMap(s => (0 until s.nrPoints).map(k => s.startTs + k * s.samplePeriod))
    chunkTimes.sliding(2).foreach { case Seq(a, b) => (b - a) shouldBe 500.0 +- 1e-9 }
  }

  it should "cut into balanced chunks and pass through slow segments unchanged" in {
    import graft.streaming.RealtimeResample
    import RealtimeResample.IngestSegment
    // reference `cut`: boundaries at round(x*m/n) — 10 items into 3 ->
    // sizes 3,4,3
    RealtimeResample.cut((1 to 10).toVector, 3).map(_.length) shouldBe Vector(3, 4, 3)
    RealtimeResample.resample(Vector(5.0, 1.0, 9.0, 2.0), 2) shouldBe Seq((1.0, 5.0), (2.0, 9.0))
    // samplePeriod >= pixelDuration -> passthrough
    val slow = RealtimeResample.resampleMessage(IngestSegment("c", 0L, 1000.0, Seq(1.0, 2.0)), 500)
    slow.isMinMax shouldBe false
    slow.data shouldBe Seq(1.0, 2.0)
  }

  it should "apply as a typed map over a streaming Dataset" in {
    import graft.streaming.RealtimeResample
    import RealtimeResample.IngestSegment
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[IngestSegment]
    val mem = MemoryStream[IngestSegment]
    val out = RealtimeResample.stream(mem.toDS(), 500)
    val q = out.writeStream.format("memory").queryName("rs_out").outputMode("append").start()
    try {
      mem.addData(IngestSegment("ch", 0L, 100.0, (1 to 50).map(_.toDouble)))
      q.processAllAvailable()
      val rows = spark.table("rs_out").collect()
      rows.length shouldBe 1
      rows(0).getAs[Int]("nrPoints") shouldBe 10
      rows(0).getAs[Boolean]("isMinMax") shouldBe true
    } finally q.stop()
  }

  it should "emit decodable protobuf wire frames from a micro-batch that match the batch-computed segment" in {
    // the reference's realtime emission end to end (server/
    // TimeSeriesFlow.scala:390-397): ingest → resample → wire bytes.
    // Decode what the micro-batch emitted and compare field-for-field
    // against the batch-side resampleMessage on the same input.
    import graft.streaming.RealtimeResample
    import RealtimeResample.IngestSegment
    import graft.sources.SegmentProto
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[IngestSegment]
    val ingest = Seq(
      IngestSegment("ch1", 0L, 100.0, (1 to 50).map(i => math.sin(i / 7.0))),
      IngestSegment("ch2", 1000L, 900.0, Seq(1.5, -2.5)) // slow → passthrough
    )
    val mem = MemoryStream[IngestSegment]
    val out = RealtimeResample.wireStream(mem.toDS(), 500)
    val q = out.writeStream.format("memory").queryName("rs_wire").outputMode("append").start()
    try {
      mem.addData(ingest: _*)
      q.processAllAvailable()
      val frames = spark.table("rs_wire").collect().map(_.getAs[Array[Byte]](0))
      frames.length shouldBe 2
      val decoded = frames.map(SegmentProto.decodeTimeSeriesMessage).map { m =>
        m.event shouldBe None
        val s = m.segment.get
        s.source -> s
      }.toMap
      ingest.foreach { in =>
        val batch = RealtimeResample.resampleMessage(in, 500)
        val wire = decoded(in.channel)
        wire.startTs shouldBe batch.startTs
        wire.samplePeriod shouldBe batch.samplePeriod
        wire.requestedSamplePeriod shouldBe batch.requestedSamplePeriod
        wire.isMinMax shouldBe batch.isMinMax
        wire.segmentType shouldBe batch.segmentType
        wire.nrPoints shouldBe batch.nrPoints
        wire.data shouldBe batch.data
      }
    } finally q.stop()
  }

  "StreamingFilter" should "carry filter state across micro-batches exactly like one continuous run" in {
    import graft.streaming.StreamingFilter
    import StreamingFilter.Sample
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Sample]

    val cascade = graft.functions.Butterworth.lowPass(4, 250.0, 20.0)
    val signal = (0 until 600).map(i => math.sin(i / 9.0))

    val mem = MemoryStream[Sample]
    val out = StreamingFilter(mem.toDS(), cascade, padLength = 40, gapUs = 100L)
    val q = out.writeStream.format("memory").queryName("sf_out").outputMode("append").start()
    try {
      // three micro-batches of one contiguous stream (t stride 1 <= gap)
      mem.addData((0 until 200).map(i => Sample("a", i.toLong, signal(i))): _*)
      q.processAllAvailable()
      mem.addData((200 until 400).map(i => Sample("a", i.toLong, signal(i))): _*)
      q.processAllAvailable()
      mem.addData((400 until 600).map(i => Sample("a", i.toLong, signal(i))): _*)
      q.processAllAvailable()

      val got = spark
        .table("sf_out")
        .orderBy("t")
        .select("fv")
        .as[Double]
        .collect()

      // expected: ONE continuous filter run with the same initial prewarm
      val st = new graft.functions.Butterworth.State(cascade)
      graft.functions.Butterworth
        .reflectedPrewarm(signal.take(200).toArray, 40)
        .foreach(st.filter)
      val exp = signal.map(st.filter)

      got.length shouldBe 600
      got.zip(exp).foreach { case (g, e) => g shouldBe e +- 1e-12 }
    } finally q.stop()
  }

  "StreamingDespike" should "emit exactly the batch hampel outliers across any micro-batch carving" in {
    import graft.streaming.StreamingDespike
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // flat-ish signal with planted spikes, two channels
    def sig(i: Int): Double = (i % 3).toDouble + (if (i % 37 == 0) 60.0 else 0.0)
    val data = for (c <- Seq("a", "b"); i <- 0 until 200)
      yield (c, i.toLong * 1000L, sig(i) + (if (c == "b") 1.0 else 0.0))

    val batch = graft.operators.Timeseries
      .hampel(data.toDF("channel", "t", "v"), k = 5, nSigma = 3.0)
      .select("channel", "t", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    batch should not be empty

    for (split <- Seq(Seq(400), Seq(100, 250, 400), Seq(7, 130, 131, 400))) {
      val mem = MemoryStream[(String, Long, Double)]
      val out = StreamingDespike.outliers(spark, mem.toDF().toDF("channel", "t", "v"), k = 5, nSigma = 3.0)
      val name = s"despike_${split.mkString("_")}"
      val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        var prev = 0
        (split :+ data.size).distinct.foreach { end =>
          // interleave channels within each batch — arrival order inside
          // a batch must not matter (the fold re-sorts by (t, event_id))
          mem.addData(data.slice(prev, end): _*)
          prev = end
          q.processAllAvailable()
        }
        val got = spark
          .table(name)
          .select("channel", "t", "v")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
          .toSet
        withClue(s"split $split:") { got shouldBe batch }
      } finally q.stop()
    }
  }

  it should "hold bounded per-channel state (a 2k+1 ring) regardless of stream length" in {
    import graft.streaming.StreamingDespike
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Long, Double)]
    val out = StreamingDespike.outliers(spark, mem.toDF().toDF("channel", "t", "v"), k = 5)
    val q = out.writeStream.format("memory").queryName("despike_state").outputMode("append").start()
    try {
      mem.addData((0 until 2000).map(i => ("a", i.toLong, (i % 7).toDouble)): _*)
      q.processAllAvailable()
      val rows = q.lastProgress.stateOperators.head.numRowsTotal
      rows shouldBe 1L // one ring per channel, never per sample
    } finally q.stop()
  }

  it should "reset and re-warm on a stream gap" in {
    import graft.streaming.StreamingFilter
    import StreamingFilter.Sample
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Sample]

    val cascade = graft.functions.Butterworth.lowPass(4, 250.0, 20.0)
    val mem = MemoryStream[Sample]
    val out = StreamingFilter(mem.toDS(), cascade, padLength = 20, gapUs = 10L)
    val q = out.writeStream.format("memory").queryName("sf_gap").outputMode("append").start()
    try {
      mem.addData((0 until 100).map(i => Sample("a", i.toLong, math.cos(i / 4.0))): _*)
      q.processAllAvailable()
      // second batch far beyond the gap: filter must reset + prewarm fresh
      mem.addData((0 until 100).map(i => Sample("a", 1000L + i, math.cos(i / 4.0))): _*)
      q.processAllAvailable()

      val got = spark.table("sf_gap").orderBy("t").select("fv").as[Double].collect()
      val expBlock = {
        val st = new graft.functions.Butterworth.State(cascade)
        val block = (0 until 100).map(i => math.cos(i / 4.0)).toArray
        graft.functions.Butterworth.reflectedPrewarm(block, 20).foreach(st.filter)
        block.map(st.filter)
      }
      // both blocks identical input after a reset -> identical output
      got.take(100).zip(expBlock).foreach { case (g, e) => g shouldBe e +- 1e-12 }
      got.drop(100).zip(expBlock).foreach { case (g, e) => g shouldBe e +- 1e-12 }
    } finally q.stop()
  }

  it should "reset and re-prewarm when the filter configuration swaps mid-stream" in {
    import graft.streaming.StreamingFilter
    // a mid-session filter swap (reference: TimeSeriesFlow puts a
    // freshly-built tracker for the channel) is a restart over the
    // same checkpoint with a new cascade + bumped configId; the old
    // cascade's delay lines must NOT leak into the new filter
    val in = java.nio.file.Files.createTempDirectory("graft-fsw-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-fsw-out").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-fsw-ck").toString
    val cascadeA = graft.functions.Butterworth.lowPass(4, 250.0, 20.0)
    val cascadeB = graft.functions.Butterworth.lowPass(4, 250.0, 60.0)
    val signal = (0 until 400).map(i => math.sin(i / 7.0) + math.cos(i / 3.0))

    def addBlock(name: String, range: Range): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(in, s"$name.json"),
        range.map(i => s"""{"channel":"a","t":$i,"v":${signal(i)}}""").mkString("\n")
      )
    def start(cascade: graft.functions.Butterworth.Cascade, configId: Long) =
      StreamingFilter(
        spark.readStream
          .schema("channel STRING, t LONG, v DOUBLE")
          .json(in)
          .as[StreamingFilter.Sample],
        cascade,
        padLength = 40,
        gapUs = 10L,
        configId = configId
      ).writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()

    // session 1: filter A over [0, 200)
    addBlock("b1", 0 until 200)
    val q1 = start(cascadeA, configId = 1L)
    try q1.processAllAvailable()
    finally q1.stop()

    // swap to filter B; the suffix continues CONTIGUOUSLY (t stride 1
    // <= gapUs) so a gap reset cannot mask the config reset
    addBlock("b2", 200 until 400)
    val q2 = start(cascadeB, configId = 2L)
    try q2.processAllAvailable()
    finally q2.stop()

    val got = spark.read
      .parquet(out)
      .filter($"t" >= 200)
      .orderBy("t")
      .select("fv")
      .as[Double]
      .collect()

    // expected: a FRESH filter B run on just the suffix (reset +
    // reflected prewarm from the suffix head)
    val st = new graft.functions.Butterworth.State(cascadeB)
    val suffix = (200 until 400).map(signal).toArray
    graft.functions.Butterworth.reflectedPrewarm(suffix, 40).foreach(st.filter)
    val exp = suffix.map(st.filter)

    got.length shouldBe 200
    got.zip(exp).foreach { case (g, e) => g shouldBe e +- 1e-12 }
  }

  "RealtimeDownsample.dedupStream" should "drop repeated doc hashes within the watermark" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val out = graft.streaming.RealtimeDownsample.dedupStream(
      mem.toDF().toDF("doc_hash", "ts"),
      watermarkDelay = "10 seconds"
    )
    val q = out.writeStream.format("memory").queryName("dd_out").outputMode("append").start()
    try {
      mem.addData(("h1", ts(1)), ("h2", ts(2)), ("h1", ts(3)))
      q.processAllAvailable()
      mem.addData(("h1", ts(4)), ("h3", ts(5)))
      q.processAllAvailable()
      val hashes = spark.table("dd_out").select("doc_hash").as[String].collect().sorted
      hashes shouldBe Array("h1", "h2", "h3")
    } finally q.stop()
  }

  "StreamingNearDup.candidates" should "pair colliding docs across micro-batches, skip unrelated ones" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // idleTimeout = None: processing-time timeouts spin continuous
    // empty micro-batches, which defeats processAllAvailable
    val out = graft.streaming.StreamingNearDup.candidates(
      spark,
      mem.toDF().toDF("doc_id", "text"),
      idleTimeout = None
    )
    val q = out.toDF().writeStream.format("memory").queryName("nd_out").outputMode("append").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again today"
      mem.addData((1L, base), (2L, "completely unrelated text about spark physical plans and shuffles"))
      q.processAllAvailable()
      // near-copy of doc 1 arrives in a LATER micro-batch: per-bucket
      // state must still hold doc 1's membership
      mem.addData((3L, base + " tonight"))
      q.processAllAvailable()

      val pairs = spark
        .table("nd_out")
        .select($"doc_a", $"doc_b")
        .as[(Long, Long)]
        .collect()
        .toSet
      pairs should contain((1L, 3L))
      pairs.flatMap(p => Set(p._1, p._2)) should not contain 2L
    } finally q.stop()
  }

  "StreamingNearDup.verified" should "emit cross-batch verified pairs and reject low-estimate collisions" in {
    implicit val sqlCtx = spark.sqlContext

    // fixture preconditions, computed from the same kernels the stream
    // uses (deterministic hash family): the near copy must band-collide
    // with high signature agreement; the mostly-replaced doc must STILL
    // band-collide (so the verify stage — not banding — rejects it)
    val base =
      "the quick brown fox jumps over the lazy dog again and again today while the sun sets slowly behind the tall green hills"
    val near = base + " tonight"
    val mostlyReplaced =
      (base.split(" ").dropRight(12) ++ Seq.fill(12)("replaced")).mkString(" ")
    def sig(text: String): Seq[Long] =
      graft.functions.MinhashHash
        .signature(graft.functions.Shingling.wordShingles(text, 3).map(_.toString))
        .toSeq
    def sharedBands(a: Seq[Long], b: Seq[Long]): Int =
      a.grouped(4).toSeq.zip(b.grouped(4).toSeq).count { case (x, y) => x == y }
    def est(a: Seq[Long], b: Seq[Long]): Double = a.zip(b).count(x => x._1 == x._2) / 64.0
    sharedBands(sig(base), sig(near)) should be > 0
    est(sig(base), sig(near)) should be >= 0.6
    sharedBands(sig(base), sig(mostlyReplaced)) should be > 0
    est(sig(base), sig(mostlyReplaced)) should be < 0.6

    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingNearDup.verified(
      spark,
      mem.toDF().toDF("doc_id", "text"),
      tau = 0.6,
      idleTimeout = None
    )
    val q = out.toDF().writeStream.format("memory").queryName("ndv_out").outputMode("append").start()
    try {
      mem.addData((1L, base), (2L, mostlyReplaced))
      q.processAllAvailable()
      // the true near-dup arrives in a LATER micro-batch
      mem.addData((3L, near))
      q.processAllAvailable()

      val got = spark
        .table("ndv_out")
        .select($"doc_a", $"doc_b", $"est_jaccard")
        .as[(Long, Long, Double)]
        .collect()
      val pairs = got.map(r => (r._1, r._2)).toSet
      // cross-batch near-dup survives verify with the exact estimate
      pairs should contain((1L, 3L))
      got.filter(r => (r._1, r._2) == ((1L, 3L))).foreach {
        _._3 shouldBe est(sig(base), sig(near)) +- 1e-12
      }
      // the banding collision with low agreement is rejected
      pairs should not contain ((1L, 2L))
    } finally q.stop()
  }

  "RealtimeDownsample.sessionSpans" should "split sessions at the gap threshold" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val out = RealtimeDownsample.sessionSpans(
      mem.toDF().toDF("channel", "ts", "v"),
      gapSeconds = 5,
      watermarkDelay = "2 seconds"
    )
    val q = out.writeStream.format("memory").queryName("span_out").outputMode("append").start()
    try {
      mem.addData(("a", ts(1), 0.0), ("a", ts(3), 0.0), ("a", ts(20), 0.0))
      q.processAllAvailable()
      mem.addData(("a", ts(100), 0.0))
      q.processAllAvailable()

      val rows = spark
        .table("span_out")
        .orderBy("span_start")
        .select($"channel", $"n")
        .as[(String, Long)]
        .collect()
        .toList
      rows shouldBe List(("a", 2L), ("a", 1L))
    } finally q.stop()
  }

  "StreamingNearDup.incrementalClusters" should "merge components across micro-batches" in {
    import graft.streaming.StreamingNearDup
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val out = StreamingNearDup.incrementalClusters(spark, mem.toDS())
    val q = out.writeStream.format("memory").queryName("inc_cc").outputMode("append").start()
    try {
      // batch 1: two separate components {1,2} and {4,5}
      mem.addData((1L, 2L), (4L, 5L))
      q.processAllAvailable()
      // batch 2: a bridge pair merges them; an unrelated pair starts {7,8}
      mem.addData((2L, 4L), (7L, 8L))
      q.processAllAvailable()

      val rows = spark
        .table("inc_cc")
        .select($"doc_id", $"cluster")
        .as[(Long, Long)]
        .collect()
        .zipWithIndex
      // latest-wins per doc (Append re-emits on merge)
      val latest = rows
        .groupBy(_._1._1)
        .map { case (d, xs) => d -> xs.maxBy(_._2)._1._2 }
      // the cross-batch merge: docs 4 and 5 (clustered as 4 in batch 1)
      // must end up under min-label 1
      latest shouldBe Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 5L -> 1L, 7L -> 7L, 8L -> 7L)
      // and batch 1 really did assign {4,5} to 4 before the merge
      rows.map(_._1).toSet should contain((4L, 4L))
    } finally q.stop()
  }

  "StreamingCusum.alarms" should "alarm on a persistent drift and stay quiet on target" in {
    import graft.streaming.StreamingCusum
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    // target level 0, slack 0.5, threshold 5: channel d drifts at +1
    // (net +0.5/sample → alarm after ~10), channel r alternates ±1
    // (each side nets to 0 under the slack)
    val out = StreamingCusum.alarms(
      spark, mem.toDF().toDF("channel", "t", "v"), mu0 = 0.0, k = 0.5, h = 5.0)
    val q = out.toDF().writeStream.format("memory").queryName("cusum_out").outputMode("update").start()
    try {
      mem.addData((0L until 8L).flatMap(i =>
        Seq(("d", i, 1.0), ("r", i, if (i % 2 == 0) 1.0 else -1.0))): _*)
      q.processAllAvailable()
      // drift continues across the batch boundary — state carries S⁺
      mem.addData((8L until 16L).flatMap(i =>
        Seq(("d", i, 1.0), ("r", i, if (i % 2 == 0) 1.0 else -1.0))): _*)
      q.processAllAvailable()

      val latest = spark
        .table("cusum_out")
        .as[(String, Long, Double, Double, Long, Boolean)]
        .collect()
        .zipWithIndex
        .groupBy(_._1._1)
        .map { case (ch, xs) => ch -> xs.maxBy(_._2)._1 }
      latest("d")._5 should be >= 1L // the drift alarmed
      latest("d")._2 shouldBe 16L
      latest("r")._5 shouldBe 0L // the stationary channel never did
      latest("r")._3 should be < 5.0
      latest("r")._4 should be < 5.0
    } finally q.stop()
  }

  "StreamingForecast.fit" should "match the batch OLS fit bit-for-bit on any micro-batch carving" in {
    import graft.streaming.StreamingForecast
    implicit val sqlCtx = spark.sqlContext

    // 20 buckets x 4 samples per bucket, linear trend + deterministic
    // wiggle, two channels with different slopes
    val data = for {
      c <- Seq("a", "b")
      i <- 0 until 80
    } yield {
      val bkt = i / 4
      val slope = if (c == "a") 0.3 else -0.7
      (c, bkt * 1000L + (i % 4) * 250L, slope * bkt + 2.0 + (i % 5) * 0.01)
    }

    val batch = graft.operators.Timeseries
      .olsForecast(
        data.toDF("channel", "t", "v").withColumn("event_id", lit(0L)),
        bucketUs = 1000L,
        horizon = 1,
        x0 = 0L
      )
      .collect()
      .map(r =>
        r.getAs[String]("channel") -> (
          r.getAs[Long]("n_buckets"),
          r.getAs[Long]("bucket"),
          r.getAs[Double]("slope"),
          r.getAs[Double]("intercept"),
          r.getAs[Double]("yhat")
        )
      )
      .toMap
    batch.keySet shouldBe Set("a", "b")

    for (split <- Seq(Seq(160), Seq(40, 100, 160), Seq(3, 77, 78, 160))) {
      val mem = MemoryStream[(String, Long, Double)]
      val out = StreamingForecast.fit(
        spark,
        mem.toDF().toDF("channel", "t", "v"),
        bucketUs = 1000L,
        x0 = 0L
      )
      val name = s"forecast_${split.mkString("_")}"
      val q = out.toDF().writeStream.format("memory").queryName(name).outputMode("update").start()
      try {
        var prev = 0
        (split :+ data.size).distinct.foreach { end =>
          mem.addData(data.slice(prev, end): _*)
          prev = end
          q.processAllAvailable()
        }
        val latest = spark
          .table(name)
          .as[(String, Long, Long, Option[Double], Option[Double], Option[Double])]
          .collect()
          .zipWithIndex
          .groupBy(_._1._1)
          .map { case (ch, xs) => ch -> xs.maxBy(_._2)._1 }
        Seq("a", "b").foreach { ch =>
          val (bn, bbkt, bs, bi, by) = batch(ch)
          val s = latest(ch)
          withClue(s"split $split channel $ch:") {
            s._2 shouldBe bn
            s._3 shouldBe bbkt
            s._4 shouldBe Some(bs)
            s._5 shouldBe Some(bi)
            s._6 shouldBe Some(by)
          }
        }
      } finally q.stop()
    }
  }

  it should "hold five moments + one open bucket per channel, never per sample" in {
    import graft.streaming.StreamingForecast
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val out = StreamingForecast.fit(spark, mem.toDF().toDF("channel", "t", "v"), bucketUs = 1000L, x0 = 0L)
    val q = out.toDF().writeStream.format("memory").queryName("forecast_state").outputMode("update").start()
    try {
      mem.addData((0 until 3000).map(i => ("a", i.toLong * 10L, (i % 9).toDouble)): _*)
      q.processAllAvailable()
      q.lastProgress.stateOperators.head.numRowsTotal shouldBe 1L
    } finally q.stop()
  }

  "StreamingSessions.sessions" should "emit exactly the batch-closed sessions on any carving" in {
    import graft.streaming.StreamingSessions
    implicit val sqlCtx = spark.sqlContext

    // two users, two real sessions each (gap 5000), plus a sentinel
    // arrival that closes the second session and stays open itself
    val data = for {
      u <- Seq(1L, 2L)
      t <- (0L until 10000L by 1000L) ++ (20000L to 24000L by 1000L) ++ Seq(100000L + u)
    } yield (u, t)

    val batchDf = data.zipWithIndex
      .map { case ((u, t), i) => (u, t, i.toLong) }
      .toDF("user_id", "t", "event_id")
    val batch = graft.operators.Timeseries
      .sessionize(batchDf, gapUs = 5000L)
      .groupBy($"user_id", $"session_id")
      .agg(min($"t").as("start"), max($"t").as("end"), count(lit(1)).as("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // the stream can only report sessions a later arrival has CLOSED
    val lastPerUser = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = batch.filterNot { case (u, sid, _, _, _) => lastPerUser(u) == sid }.toSet
    expected.size shouldBe 4 // two closed sessions per user

    for (split <- Seq(Seq(data.size), Seq(5, 17, data.size), Seq(1, 2, 3, data.size))) {
      val mem = MemoryStream[(Long, Long)]
      val out = StreamingSessions.sessions(spark, mem.toDF().toDF("user_id", "t"), gapUs = 5000L)
      val name = s"sessions_${split.mkString("_")}"
      val q = out.toDF().writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        var prev = 0
        split.distinct.foreach { end =>
          mem.addData(data.slice(prev, end): _*)
          prev = end
          q.processAllAvailable()
        }
        val got = spark
          .table(name)
          .select("user_id", "session_id", "start", "end", "n_events")
          .as[(Long, Long, Long, Long, Long)]
          .collect()
          .toSet
        withClue(s"split $split:") { got shouldBe expected }
      } finally q.stop()
    }
  }

  "StreamingM4.reduce" should "emit exactly the batch M4 rows for closed buckets on any carving" in {
    import graft.streaming.StreamingM4
    implicit val sqlCtx = spark.sqlContext

    // two channels, 4 buckets of 8 samples with spikes and duplicates
    val data = for {
      c <- Seq("a", "b")
      i <- 0 until 32
    } yield {
      val v = (i % 7).toDouble + (if (i % 13 == 0) 50.0 else 0.0) + (if (c == "b") 2.0 else 0.0)
      (c, i.toLong * 125L, v)
    }

    val batch = graft.operators.Timeseries
      .m4Downsample(
        data.zipWithIndex.map { case ((c, t, v), i) => (c, t, v, 0L, 0L) }
          .toDF("channel", "t", "v", "user_id", "event_id"),
        bucketUs = 1000L
      )
      .collect()
      .map(r =>
        (
          r.getAs[String]("channel"), r.getAs[Long]("bucket"), r.getAs[Long]("n"),
          r.getAs[Long]("t_first"), r.getAs[Double]("v_first"),
          r.getAs[Long]("t_last"), r.getAs[Double]("v_last"),
          r.getAs[Long]("t_min"), r.getAs[Double]("v_min"),
          r.getAs[Long]("t_max"), r.getAs[Double]("v_max")
        )
      )
    val lastBkt = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = batch.filterNot(r => lastBkt(r._1) == r._2).toSet
    expected.size shouldBe 6 // three closed buckets per channel

    for (split <- Seq(Seq(data.size), Seq(10, 33, data.size), Seq(1, 2, 40, data.size))) {
      val mem = MemoryStream[(String, Long, Double)]
      val out = StreamingM4.reduce(spark, mem.toDF().toDF("channel", "t", "v"), bucketUs = 1000L)
      val name = s"m4_${split.mkString("_")}"
      val q = out.toDF().writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        var prev = 0
        split.distinct.foreach { end =>
          mem.addData(data.slice(prev, end): _*)
          prev = end
          q.processAllAvailable()
        }
        val got = spark
          .table(name)
          .as[(String, Long, Long, Long, Double, Long, Double, Long, Double, Long, Double)]
          .collect()
          .toSet
        withClue(s"split $split:") { got shouldBe expected }
      } finally q.stop()
    }
  }

  "StreamingLttb.reduce" should "emit exactly the batch LTTB picks for succeeded buckets on any carving" in {
    import graft.streaming.StreamingLttb
    implicit val sqlCtx = spark.sqlContext

    // two channels, 5 non-empty buckets (one bucket-sized GAP so the
    // neighbor means exercise the non-adjacent lag/lead path), spikes,
    // duplicate values, in-bucket ties
    val data = for {
      c <- Seq("a", "b")
      i <- 0 until 40
    } yield {
      val base = i.toLong * 125L
      val t = if (i >= 24) base + 1000L else base // skip bucket 3 entirely
      val v = (i % 7).toDouble + (if (i % 11 == 0) 40.0 else 0.0) + (if (c == "b") 3.0 else 0.0)
      (c, t, v)
    }

    val batch = graft.operators.Timeseries
      .lttbDownsample(data.toDF("channel", "t", "v"), bucketUs = 1000L)
      .collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Long]("bucket"), r.getAs[Long]("t"), r.getAs[Double]("v")))
    // the stream can only finalize a bucket once its SUCCESSOR closed:
    // drop each channel's top two buckets from the batch expectation
    val topTwo = batch.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.takeRight(2).toSet).toMap
    val expected = batch.filterNot(r => topTwo(r._1)(r._2)).toSet
    expected.size should be >= 6 // ≥3 finalized buckets per channel

    for (split <- Seq(Seq(data.size), Seq(13, 41, data.size), Seq(1, 3, 50, data.size))) {
      val mem = MemoryStream[(String, Long, Double)]
      val out = StreamingLttb.reduce(spark, mem.toDF().toDF("channel", "t", "v"), bucketUs = 1000L)
      val name = s"lttb_${split.mkString("_")}"
      val q = out.toDF().writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        var prev = 0
        split.distinct.foreach { end =>
          mem.addData(data.slice(prev, end): _*)
          prev = end
          q.processAllAvailable()
        }
        val got = spark.table(name).as[(String, Long, Long, Double)].collect().toSet
        withClue(s"split $split:") { got shouldBe expected }
      } finally q.stop()
    }
  }

  it should "absorb late fills of the pending bucket and DROP arrivals older than the open window" in {
    import graft.streaming.StreamingLttb
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val out = StreamingLttb.reduce(spark, mem.toDF().toDF("channel", "t", "v"), bucketUs = 1000L)
    val q = out.toDF().writeStream.format("memory").queryName("lttb_late").outputMode("append").start()
    try {
      // buckets 0, 1, 2 arrive in order: bucket 0's pick is emitted the
      // moment bucket 2 opens (its successor bucket 1 closes)
      mem.addData(("z", 0L, 1.0), ("z", 100L, 2.0), ("z", 1000L, 5.0), ("z", 2000L, 1.0))
      q.processAllAvailable()
      // a late arrival for bucket 0 — OLDER than the pending window
      // (its pick is already emitted): must be dropped, not absorbed
      // into a wrong re-emission or a backwards window shift
      mem.addData(("z", 500L, 99.0))
      q.processAllAvailable()
      // a late arrival for bucket 1 — the still-PENDING bucket: its
      // pick has not been emitted, so it must be absorbed
      mem.addData(("z", 1500L, 50.0))
      q.processAllAvailable()
      // bucket 3 opens: bucket 1's pick finalizes
      mem.addData(("z", 3000L, 2.0))
      q.processAllAvailable()

      val got = spark.table("lttb_late").as[(String, Long, Long, Double)].collect().toSet
      // the batch twin over the IN-ORDER stream (dropped sample absent,
      // absorbed late fill present) is the equivalence target
      val batch = graft.operators.Timeseries
        .lttbDownsample(
          Seq(("z", 0L, 1.0), ("z", 100L, 2.0), ("z", 1000L, 5.0), ("z", 1500L, 50.0),
            ("z", 2000L, 1.0), ("z", 3000L, 2.0)).toDF("channel", "t", "v"),
          bucketUs = 1000L)
        .collect()
        .map(r => (r.getAs[String]("channel"), r.getAs[Long]("bucket"), r.getAs[Long]("t"), r.getAs[Double]("v")))
        .filter(_._2 <= 1L) // only buckets with a closed successor are emitted
        .toSet
      got shouldBe batch
      // the absorbed spike (t=1500) must be bucket 1's pick; the
      // dropped sample (t=500) must appear nowhere
      got.map(_._3) should contain(1500L)
      got.map(_._3) should not contain 500L
    } finally q.stop()
  }

  "StreamingEnrich.annotate" should "join live samples to covering spans across micro-batches" in {
    import graft.streaming.StreamingEnrich
    implicit val sqlCtx = spark.sqlContext
    val sm = MemoryStream[(String, Timestamp, Double)]
    val an = MemoryStream[(String, Timestamp, String)]
    val out = StreamingEnrich.annotate(
      sm.toDF().toDF("channel", "ts", "v"),
      an.toDF().toDF("s_channel", "s_start", "label"),
      maxSpanSeconds = 30,
      watermarkDelay = "5 seconds"
    )
    val q = out.writeStream.format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      // batch 1: a span [100, 130] on channel a, one in-span sample,
      // one before it, one on another channel
      an.addData(("a", ts(100), "seizure"))
      sm.addData(("a", ts(110), 1.0), ("a", ts(90), 2.0), ("b", ts(110), 3.0))
      q.processAllAvailable()
      // batch 2: the SAMPLE arrives after its span did (cross-batch
      // buffering on the span side), plus one past the span's end
      sm.addData(("a", ts(125), 4.0), ("a", ts(140), 5.0))
      q.processAllAvailable()

      val rows = spark
        .table("enrich_out")
        .select($"channel", $"ts", $"v", $"label")
        .as[(String, Timestamp, Double, String)]
        .collect()
        .toSet
      rows shouldBe Set(
        ("a", ts(110), 1.0, "seizure"),
        ("a", ts(125), 4.0, "seizure")
      )
    } finally q.stop()
  }

  "StreamingHeavyHitters.topK" should "track a heavy hitter exactly through eviction churn" in {
    import graft.streaming.StreamingHeavyHitters
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val out = StreamingHeavyHitters.topK(
      spark, mem.toDF().toDF("item"), capacity = 4, nShards = 1, k = 4)
    val q = out.toDF().writeStream.format("memory").queryName("hh_out").outputMode("update").start()
    try {
      // batch 1 fills the summary: hot×5 + three fillers
      mem.addData(Seq.fill(5)("hot") ++ Seq("f1", "f2", "f3"): _*)
      q.processAllAvailable()
      // batch 2 churns the fillers (every newcomer evicts a min
      // counter) while hot keeps accumulating
      mem.addData(Seq.fill(5)("hot") ++ Seq("g1", "g2", "g3"): _*)
      q.processAllAvailable()

      val latest = spark
        .table("hh_out")
        .as[(Int, String, Long, Long)]
        .collect()
        .zipWithIndex
        .groupBy(_._1._2)
        .map { case (item, xs) => item -> xs.maxBy(_._2)._1 }
      // hot is never the minimum counter, so it is never evicted and
      // its count stays EXACT (err 0) despite the churn
      latest("hot")._3 shouldBe 10L
      latest("hot")._4 shouldBe 0L
      // bounded state: no snapshot ever exceeds capacity entries
      spark.table("hh_out").as[(Int, String, Long, Long)].collect()
        .groupBy(_._1).values.foreach(_.map(_._2).distinct.size should be <= 7)
    } finally q.stop()
  }

  it should "bound an evicting newcomer's count by the inherited error" in {
    import graft.streaming.StreamingHeavyHitters
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val out = StreamingHeavyHitters.topK(
      spark, mem.toDF().toDF("item"), capacity = 2, nShards = 1, k = 2)
    val q = out.toDF().writeStream.format("memory").queryName("hh_err").outputMode("update").start()
    try {
      mem.addData("a", "a", "b")
      q.processAllAvailable()
      mem.addData("c") // evicts b (the min, count 1): c.count=2, err=1
      q.processAllAvailable()
      val latest = spark
        .table("hh_err")
        .as[(Int, String, Long, Long)]
        .collect()
        .zipWithIndex
        .groupBy(_._1._2)
        .map { case (item, xs) => item -> xs.maxBy(_._2)._1 }
      latest("c")._3 shouldBe 2L // upper bound: true count 1 + err 1
      latest("c")._4 shouldBe 1L
      (latest("c")._3 - latest("c")._4) should be <= 1L // lower bound holds
      latest("a")._3 shouldBe 2L // the survivor is untouched and exact
      latest("a")._4 shouldBe 0L
    } finally q.stop()
  }

  "StreamingPacking.pack" should "continue the batch packer's token stream across micro-batches" in {
    import graft.streaming.StreamingPacking
    implicit val sqlCtx = spark.sqlContext
    val allDocs = Seq(
      (1L, "a b c"),
      (2L, "d e f g"),
      (3L, "h i"),
      (4L, "j k l m n o"),
      (5L, "p q r")
    )
    val mem = MemoryStream[(Long, String)]
    val out = StreamingPacking.pack(spark, mem.toDF().toDF("doc_id", "text"), seqLen = 4)
    val q = out.toDF().writeStream.format("memory").queryName("pk_out").outputMode("append").start()
    try {
      // the same corpus, split across three micro-batches (unsorted
      // within a batch — intra-batch order must not matter)
      mem.addData(allDocs(1), allDocs(0))
      q.processAllAvailable()
      mem.addData(allDocs(2))
      q.processAllAvailable()
      mem.addData(allDocs(4), allDocs(3))
      q.processAllAvailable()

      val streamed = spark
        .table("pk_out")
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long, Long, Long)]
        .collect()
        .toList
      // oracle: the BATCH packer over the whole corpus at once
      val batch = graft.operators.Packing
        .packSequences(allDocs.toDF("doc_id", "text"), seqLen = 4, shardWidth = 2L)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long, Long, Long)]
        .collect()
        .toList
      streamed shouldBe batch
    } finally q.stop()
  }

  "a checkpointed file-source pipeline" should "recover across restarts exactly once" in {
    val in = java.nio.file.Files.createTempDirectory("graft-ck-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-ck-out").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-ck-meta").toString
    val good = "the cat and the dog are in the house with a friend of the family"
    def addDoc(id: Long): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(in, s"d$id.json"),
        s"""{"doc_id":$id,"text":"$good"}"""
      )
    def start() = graft.streaming.StreamingCuration
      .curate(
        spark.readStream.schema("doc_id LONG, text STRING").json(in),
        minQuality = 0.0
      )
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ck)
      .outputMode("append")
      .start()

    addDoc(1L)
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    addDoc(2L)
    // restart from the SAME checkpoint: file 1 must not reprocess,
    // file 2 must land — exactly-once across the restart boundary
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val ids = spark.read.parquet(out).select($"doc_id").as[Long].collect().sorted
    ids shouldBe Array(1L, 2L)
  }

  "StreamingCuration.curate" should "gate a document stream map-side with no state store" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingCuration.curate(
      mem.toDF().toDF("doc_id", "text"),
      minQuality = 0.3,
      maxDupBigramFrac = 0.5
    )
    val q = out.writeStream.format("memory").queryName("cur_out").outputMode("append").start()
    try {
      mem.addData(
        (1L, "the cat and the dog are in the house with a friend of the family for a visit"),
        (2L, "spam spam spam spam spam spam spam spam"), // repetition ceiling
        (3L, null.asInstanceOf[String]) // dropped, never throws
      )
      q.processAllAvailable()
      // a later micro-batch still passes the same stateless gate, and
      // PII is redacted on the way out
      mem.addData((4L, "the cat and the dog wrote to a@b.co about the house of the family"))
      q.processAllAvailable()
      val rows = spark
        .table("cur_out")
        .orderBy("doc_id")
        .select($"doc_id", $"text")
        .as[(Long, String)]
        .collect()
        .toList
      rows.map(_._1) shouldBe List(1L, 4L)
      rows(1)._2 should include("[EMAIL]")
      rows(1)._2 should not include "a@b.co"
      // stateless: the executed streaming plan carries no state store
      q.lastProgress.stateOperators.length shouldBe 0
    } finally q.stop()
  }

  "StreamingExactDedup.dedup" should "tag batch-identical survivors and copies on any carving" in {
    import graft.streaming.StreamingExactDedup
    implicit val sqlCtx = spark.sqlContext

    // content groups: A appears 3×, B 2×, C once; whitespace/case
    // variants of A must still collide via the normalized hash
    val data = Seq(
      (1L, "alpha  beta gamma"),
      (2L, "delta epsilon"),
      (3L, "ALPHA beta   GAMMA"), // copy of 1 after normalization
      (4L, "zeta eta"),
      (5L, "delta  epsilon"), // copy of 2
      (6L, "alpha beta gamma") // copy of 1
    )
    val batch = graft.operators.Dedup
      .exactByHash(data.toDF("doc_id", "text"))
      .as[(Long, Long)]
      .collect()
      .toSet
    batch shouldBe Set((1L, 3L), (2L, 2L), (4L, 1L))

    for (split <- Seq(Seq(data.size), Seq(2, 4, data.size), Seq(1, 2, 3, 4, 5, data.size))) {
      val mem = MemoryStream[(Long, String)]
      val out = StreamingExactDedup.dedup(spark, mem.toDF().toDF("doc_id", "text"))
      val name = s"exactdedup_${split.mkString("_")}"
      val q = out.toDF().writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        var prev = 0
        split.distinct.foreach { end =>
          mem.addData(data.slice(prev, end): _*)
          prev = end
          q.processAllAvailable()
        }
        val got = spark
          .table(name)
          .as[(Long, Boolean, Long, Long)]
          .collect()
        got.length shouldBe data.size // every arrival tagged exactly once
        // survivors = batch min-doc_id survivors; group sizes agree
        val survivors = got.filter(!_._2).map(_._1).toSet
        withClue(s"split $split:") {
          survivors shouldBe batch.map(_._1)
          got.groupBy(_._3).view.mapValues(_.map(_._4).max).toMap shouldBe
            batch.map { case (id, n) => id -> n }.toMap
          // every copy points at its group's survivor
          got.filter(_._2).foreach { case (_, _, surv, _) => batch.map(_._1) should contain(surv) }
        }
      } finally q.stop()
    }
  }

  "StreamingEwma.baseline" should "emit the batch EWMA rows bit-for-bit on any carving" in {
    import graft.streaming.StreamingEwma
    implicit val sqlCtx = spark.sqlContext

    // two channels, 40 buckets x 3 samples, step + wiggle, plus a gap
    val data = for {
      c <- Seq("a", "b")
      i <- 0 until 120
      bkt = i / 3
      if bkt < 20 || bkt >= 24 // buckets 20-23 empty
    } yield {
      val lvl = if (c == "a") (if (bkt < 15) 1.0 else 9.0) else -3.0 + 0.2 * bkt
      (c, bkt * 1000L + (i % 3) * 300L, lvl + (i % 7) * 0.013)
    }

    val batch = graft.operators.Timeseries
      .ewmaBaseline(
        data.toDF("channel", "t", "v").withColumn("event_id", lit(0L)),
        bucketUs = 1000L
      )
      .collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Long]("bucket")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean"), r.getAs[Double]("ewma"), r.getAs[Double]("dev"))))
      .toMap
    batch.size shouldBe 72 // 36 non-empty buckets x 2 channels

    for (split <- Seq(Seq(data.size), Seq(30, 100, data.size), Seq(7, 71, 72, data.size))) {
      val mem = MemoryStream[(String, Long, Double)]
      val out = StreamingEwma.baseline(spark, mem.toDF().toDF("channel", "t", "v"), bucketUs = 1000L)
      val name = s"ewma_${split.mkString("_")}"
      val q = out.toDF().writeStream.format("memory").queryName(name).outputMode("update").start()
      try {
        var prev = 0
        split.distinct.foreach { end =>
          mem.addData(data.slice(prev, end): _*)
          prev = end
          q.processAllAvailable()
        }
        val rows = spark
          .table(name)
          .as[(String, Long, Long, Double, Double, Double, Boolean)]
          .collect()
        // closed rows are final the moment they emit — exactly one per
        // closed bucket, and bit-equal to the batch row
        val closed = rows.filter(_._7)
        closed.groupBy(r => (r._1, r._2)).foreach { case (_, g) => g.length shouldBe 1 }
        // the still-open bucket's last snapshot completes the surface:
        // its sample count only grows, so max-n is the final state
        val open = rows
          .filter(!_._7)
          .groupBy(r => (r._1, r._2))
          .collect { case ((c, b), g) if !closed.exists(r => r._1 == c && r._2 == b) => g.maxBy(_._3) }
        val got = (closed ++ open).map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
        withClue(s"split $split:") { got shouldBe batch }
      } finally q.stop()
    }
  }

  it should "hold at most K bucket aggregates per channel, never per sample" in {
    import graft.streaming.StreamingEwma
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val out = StreamingEwma.baseline(spark, mem.toDF().toDF("channel", "t", "v"), bucketUs = 1000L)
    val q = out.toDF().writeStream.format("memory").queryName("ewma_state").outputMode("update").start()
    try {
      mem.addData((0 until 5000).map(i => ("a", i.toLong * 10L, (i % 9).toDouble)): _*)
      q.processAllAvailable()
      // one state row per channel; its entries vector is K-capped by
      // construction (pruned on every bucket close)
      q.lastProgress.stateOperators.head.numRowsTotal shouldBe 1L
    } finally q.stop()
  }

  "StreamingQuantiles.track" should "approximate exact quantiles and be carving-invariant" in {
    import graft.streaming.StreamingQuantiles
    implicit val sqlCtx = spark.sqlContext

    // deterministic uniform-ish stream on [0,1): the exact p-quantile
    // of the sample is ~p
    val n = 2000
    val data = (0 until n).map(i => ("a", i.toLong, ((i * 2654435761L) % 10007L) / 10007.0))
    val sortedV = data.map(_._3).sorted

    var reference: Map[Double, (Long, Double)] = null
    for (split <- Seq(Seq(n), Seq(4, 500, n), Seq(137, 138, 1999, n))) {
      val mem = MemoryStream[(String, Long, Double)]
      val out = StreamingQuantiles.track(spark, mem.toDF().toDF("channel", "t", "v"))
      val name = s"p2_${split.mkString("_")}"
      val q = out.toDF().writeStream.format("memory").queryName(name).outputMode("update").start()
      try {
        var prev = 0
        split.distinct.foreach { end =>
          mem.addData(data.slice(prev, end): _*)
          prev = end
          q.processAllAvailable()
        }
        val rows = spark.table(name).as[(String, Double, Long, Double)].collect()
        // final snapshot per p = the one with the full count
        val fin = rows.filter(_._3 == n.toLong).map(r => r._2 -> ((r._3, r._4))).toMap
        fin.keySet shouldBe Set(0.5, 0.9, 0.99)
        fin.foreach { case (p, (_, est)) =>
          val exact = sortedV(math.floor(p * (n - 1)).toInt)
          withClue(s"split $split p=$p est=$est exact=$exact:") {
            math.abs(est - exact) should be < 0.02
          }
        }
        if (reference == null) reference = fin
        else withClue(s"split $split:") { fin shouldBe reference }
      } finally q.stop()
    }
  }

  "StreamingTransitions.transitions" should "reproduce the batch matrix counts on any carving" in {
    import graft.streaming.StreamingTransitions
    implicit val sqlCtx = spark.sqlContext

    val data = (0 until 240).map { i =>
      val u = (i % 3).toLong
      (u, Seq("a", "b", "c", "b")((i / 3 + (u * 2).toInt) % 4), i.toLong * 100L, i.toLong)
    }
    val batch = graft.operators.Timeseries
      .transitionMatrix(
        data.toDF("user_id", "channel", "t", "event_id")
      )
      .collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) -> r.getAs[Long]("n"))
      .toMap
    batch should not be empty

    for (split <- Seq(Seq(data.size), Seq(1, 100, data.size), Seq(79, 80, 239, data.size))) {
      val mem = MemoryStream[(Long, String, Long, Long)]
      val out = StreamingTransitions.transitions(
        spark,
        mem.toDF().toDF("user_id", "channel", "t", "event_id")
      )
      val name = s"trans_${split.mkString("_")}"
      val q = out.toDF().writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        var prev = 0
        split.distinct.foreach { end =>
          mem.addData(data.slice(prev, end): _*)
          prev = end
          q.processAllAvailable()
        }
        val got = spark
          .table(name)
          .groupBy($"from_type", $"to_type")
          .count()
          .collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
          .toMap
        withClue(s"split $split:") { got shouldBe batch }
      } finally q.stop()
    }
  }

  "StreamingErrorRate.monitor" should "finalize windows equal to the batch Wilson rows" in {
    import graft.streaming.StreamingErrorRate
    implicit val sqlCtx = spark.sqlContext

    val hourUs = 3600000000L
    // 4 full hours with varying error mix + one far-future sentinel
    // that advances the watermark past all of them
    val body = (0 until 400).map { i =>
      val ch = if (i % 10 < (i / 100) + 1) "error" else "view"
      (ch, (i / 100).toLong * hourUs + (i % 100).toLong * 1000000L)
    }
    val sentinel = ("view", 100L * hourUs)
    val batch = graft.operators.Timeseries
      .errorRate(
        body.toDF("channel", "t").withColumn("v", lit(0.0)),
        hourUs
      )
      .collect()
      .map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("errors"), r.getAs[Double]("rate"),
          r.getAs[Double]("wilson_lo"), r.getAs[Double]("wilson_hi"))))
      .toMap
    batch.size shouldBe 4

    for (split <- Seq(Seq(body.size), Seq(37, 250, body.size))) {
      val mem = MemoryStream[(String, Long)]
      val out = StreamingErrorRate.monitor(mem.toDF().toDF("channel", "t"), hourUs)
      val name = s"er_${split.mkString("_")}"
      val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        var prev = 0
        split.distinct.foreach { end =>
          mem.addData(body.slice(prev, end): _*)
          prev = end
          q.processAllAvailable()
        }
        mem.addData(sentinel) // watermark jumps; all body windows close
        q.processAllAvailable()
        val got = spark
          .table(name)
          .as[(Long, Long, Long, Double, Double, Double)]
          .collect()
          .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6)))
          .toMap
        withClue(s"split $split:") { got shouldBe batch }
      } finally q.stop()
    }
  }

  "StreamingBandpower.track" should "emit the batch band-power rows bit-for-bit on any carving" in {
    import graft.streaming.StreamingBandpower
    implicit val sqlCtx = spark.sqlContext

    // two channels, 10 windows x 25 samples: a k=2 tone on "a", mixed
    // wobble on "b"
    val data = for {
      c <- Seq("a", "b")
      i <- 0 until 250
    } yield {
      val t = (i % 25) * 40L + (i / 25) * 1000L
      val v =
        if (c == "a") math.sin(2 * math.Pi * 2 * (t % 1000L) / 1000.0) * 3.0
        else 1.0 + math.cos(2 * math.Pi * (t % 1000L) / 1000.0) + (i % 3) * 0.1
      (c, t, v)
    }
    val batch = graft.operators.Timeseries
      .bandPower(
        data.toDF("channel", "t", "v").withColumn("event_id", lit(0L)),
        windowUs = 1000L
      )
      .collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Long]("win"), r.getAs[Long]("k")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("power"))))
      .toMap
    batch.size shouldBe 80 // 2 channels x 10 windows x 4 harmonics

    for (split <- Seq(Seq(data.size), Seq(30, 260, data.size), Seq(249, 250, 251, data.size))) {
      val mem = MemoryStream[(String, Long, Double)]
      val out = StreamingBandpower.track(spark, mem.toDF().toDF("channel", "t", "v"), windowUs = 1000L)
      val name = s"bp_${split.mkString("_")}"
      val q = out.toDF().writeStream.format("memory").queryName(name).outputMode("update").start()
      try {
        var prev = 0
        split.distinct.foreach { end =>
          mem.addData(data.slice(prev, end): _*)
          prev = end
          q.processAllAvailable()
        }
        val rows = spark.table(name).as[(String, Long, Long, Long, Double, Boolean)].collect()
        val closed = rows.filter(_._6)
        closed.groupBy(r => (r._1, r._2, r._3)).foreach { case (_, g) => g.length shouldBe 1 }
        val open = rows
          .filter(!_._6)
          .groupBy(r => (r._1, r._2, r._3))
          .collect { case (key, g) if !closed.exists(r => (r._1, r._2, r._3) == key) => g.maxBy(_._4) }
        val got = (closed ++ open).map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
        withClue(s"split $split:") { got shouldBe batch }
      } finally q.stop()
    }
  }

  "StreamingPsi.monitor" should "report the batch PSI bit-for-bit against the first-half profile" in {
    import graft.streaming.StreamingPsi
    implicit val sqlCtx = spark.sqlContext

    // same fixture family as the batch psiScreen spec: stable wiggle
    // first half, +8 level shift second half
    val n = 2000
    def v(i: Int): Double = { val w = (i % 17).toDouble / 17.0; if (i < n / 2) w else w + 8.0 }
    val all = (0 until n).map(i => ("c", i.toLong * 1000L, v(i)))
    val (firstHalf, secondHalf) = all.splitAt(n / 2)

    // batch reference point: psiScreen over the full stream (its time
    // midpoint splits exactly at our half boundary)
    val batch = graft.operators.Timeseries
      .psiScreen(
        all.toDF("channel", "t", "v").withColumn("user_id", lit(0L)).withColumn("event_id", lit(0L))
      )
      .collect()
      .head
    val batchPsi = batch.getAs[Double]("psi")
    batchPsi should be > 1.0

    // offline profile from the first half, same binning formula
    val vs = firstHalf.map(_._3)
    val (amin, amax) = (vs.min, vs.max)
    val ref0 = StreamingPsi.Reference(amin, amax, Seq.fill(8)(0.0))
    val counts = Array.fill(8)(0L)
    vs.foreach(x => counts(StreamingPsi.bin(x, ref0, 8)) += 1)
    val ref = ref0.copy(p = counts.map(_.toDouble / vs.size).toSeq)

    for (split <- Seq(Seq(secondHalf.size), Seq(3, 500, secondHalf.size))) {
      val mem = MemoryStream[(String, Long, Double)]
      val out = StreamingPsi.monitor(spark, mem.toDF().toDF("channel", "t", "v"), Map("c" -> ref))
      val name = s"psi_${split.mkString("_")}"
      val q = out.toDF().writeStream.format("memory").queryName(name).outputMode("update").start()
      try {
        var prev = 0
        split.distinct.foreach { end =>
          mem.addData(secondHalf.slice(prev, end): _*)
          prev = end
          q.processAllAvailable()
        }
        val fin = spark.table(name).as[(String, Long, Double, Boolean)].collect().maxBy(_._2)
        withClue(s"split $split:") {
          fin._2 shouldBe (n / 2).toLong
          fin._3 shouldBe batchPsi
          fin._4 shouldBe true
        }
      } finally q.stop()
    }
  }

  "StreamingQuantiles state" should "keep exactly one state row per channel (fifteen numbers per quantile)" in {
    import graft.streaming.StreamingQuantiles
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val out = StreamingQuantiles.track(spark, mem.toDF().toDF("channel", "t", "v"))
    val q = out.toDF().writeStream.format("memory").queryName("p2_state").outputMode("update").start()
    try {
      mem.addData((0 until 3000).flatMap(i => Seq(("a", i.toLong, i * 0.001), ("b", i.toLong, -i * 0.5))): _*)
      q.processAllAvailable()
      q.lastProgress.stateOperators.head.numRowsTotal shouldBe 2L
    } finally q.stop()
  }

  "StreamingAnn.topK" should "converge to the exact top-k regardless of micro-batch boundaries" in {
    import graft.streaming.StreamingAnn
    implicit val sqlCtx = spark.sqlContext
    def vec(seed: Long): Array[Float] = {
      // deterministic pseudo-random unit-ish vectors
      Array.tabulate(8) { d =>
        val z = seed * 0x9e3779b97f4a7c15L + d * 0xbf58476d1ce4e5b9L
        (((z >>> 16) % 1000L).toFloat / 500f) - 1f
      }
    }
    val corpus = (10L until 40L).map(i => (i, vec(i)))
    val queries = Seq((0L, vec(0L)), (1L, vec(1L))).toDF("vec_id", "embedding")
    def runSplit(name: String, splitAt: Int): Map[(Long, Int), Long] = {
      val mem = MemoryStream[(Long, Array[Float])]
      val out = StreamingAnn.topK(spark, mem.toDF().toDF("vec_id", "embedding"), queries, k = 3)
      val q = out.toDF().writeStream.format("memory").queryName(name).outputMode("update").start()
      try {
        val (a, b) = corpus.splitAt(splitAt)
        mem.addData(a: _*); q.processAllAvailable()
        mem.addData(b: _*); q.processAllAvailable()
        // latest snapshot per (query, rank)
        spark.table(name).as[(Long, Int, Long, Double)].collect().zipWithIndex
          .groupBy(x => (x._1._1, x._1._2))
          .map { case (key, xs) => key -> xs.maxBy(_._2)._1._3 }
      } finally q.stop()
    }
    val early = runSplit("ann_s1", 5)
    val late = runSplit("ann_s2", 25)
    // batch-boundary independence: both splits converge to the same ranking
    early shouldBe late
    // and that ranking is the exact batch top-k over the full corpus
    import graft.operators.Similarity
    val exact = Similarity
      .bruteForceTopK(corpus.toDF("vec_id", "embedding"), queries, k = 3)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank").toInt) -> r.getAs[Long]("neighbor_id"))
      .toMap
    early shouldBe exact
  }

  it should "keep state bounded at |Q| keys and dedup re-delivered vectors" in {
    import graft.streaming.StreamingAnn
    implicit val sqlCtx = spark.sqlContext
    val v = Array.tabulate(8)(d => (d + 1).toFloat)
    val queries = Seq((0L, v)).toDF("vec_id", "embedding")
    val mem = MemoryStream[(Long, Array[Float])]
    val out = StreamingAnn.topK(spark, mem.toDF().toDF("vec_id", "embedding"), queries, k = 2)
    val q = out.toDF().writeStream.format("memory").queryName("ann_dedup").outputMode("update").start()
    try {
      mem.addData((5L, v), (6L, v.map(_ * 2f)))
      q.processAllAvailable()
      // at-least-once replay of the same vector must not occupy two slots
      mem.addData((5L, v), (5L, v))
      q.processAllAvailable()
      q.lastProgress.stateOperators.head.numRowsTotal shouldBe 1L
      val latest = spark.table("ann_dedup").as[(Long, Int, Long, Double)].collect().zipWithIndex
        .groupBy(x => (x._1._1, x._1._2))
        .map { case (key, xs) => key -> xs.maxBy(_._2)._1._3 }
      latest((0L, 1)) should (be(5L) or be(6L))
      latest.keys.map(_._2).max shouldBe 2
    } finally q.stop()
  }
}
