package graft

import graft.operators.UnitHotpath
import graft.sources.SegmentProto
import graft.streaming.RealtimeResample

/** End-to-end golden spec for the composed unit-channel hot path:
  * a deterministic series is served through
  * range → eventBins → index-trimmed spikeWaveforms → wire frames,
  * and the emitted bytes must equal a hand-assembled sequential
  * kernel's, field for field and byte for byte.
  */
class UnitHotpathSpec extends SparkSpec {
  import spark.implicits._

  private val pixelUs = 3600000000L // 1 h
  private val stepUs = 600000000L // 10 min -> 6 samples per pixel
  private val n = 600 // 100 hours of samples
  private val c = 24 // spikeDataPointCount
  private val spikeDurUs = 12L * pixelUs // chunkCount 12; 1h*10 < 12h -> send
  private val startUs = 10L * pixelUs
  private val endUs = 50L * pixelUs

  private def v(i: Long): Double = ((i * 2654435761L) % 1013L) / 1013.0
  private def mkTs(rows: Seq[(String, Long, Double)]) =
    rows.toDF("channel", "t", "v")

  private val rows = (0L until n.toLong).map(i => ("u", i * stepUs, v(i)))

  /** The sequential kernel: everything the reference's unit serve does,
    * in plain Scala over the in-memory series.
    */
  private def kernelWire(limit: Option[Long]): Array[Byte] = {
    val inPage = rows.zipWithIndex.filter { case ((_, t, _), _) => t >= startUs && t < endUs }
    // times: fixed pixel bins over the page, avg = (min+max)/2, count
    val binsAll = inPage
      .groupBy { case ((_, t, _), _) => t / pixelUs }
      .toSeq
      .sortBy(_._1)
      .map { case (_, g) =>
        val ts = g.map(_._1._2)
        ((ts.min + ts.max) / 2, g.size.toLong)
      }
    val bins = limit.fold(binsAll)(l => binsAll.take(l.toInt))
    // spikes: full-stream waveforms of c samples, resampled to 12
    // (min,max) chunks, trimmed to the page's event-index range
    val lo = rows.count(_._2 < startUs)
    val hi1 = rows.count(_._2 < endUs)
    val (wlo, whi) = (lo / c, (hi1 - 1) / c)
    val wHiEff = limit.fold(whi.toLong)(l => math.min(whi.toLong, wlo + l - 1))
    val data = (wlo.toLong to wHiEff).flatMap { w =>
      val wf = rows.slice((w * c).toInt, ((w + 1) * c).toInt).map(_._3).toVector
      RealtimeResample.resample(wf, 12).flatMap { case (mn, mx) => Seq(mn, mx) }
    }
    SegmentProto.encodeEventMessage(
      SegmentProto.encodeEventFields(
        source = "u",
        pageStart = startUs,
        pageEnd = endUs,
        samplePeriod = pixelUs,
        pointsPerEvent = 12L,
        times = bins.flatMap { case (a, cnt) => Seq(a, cnt) },
        data = data
      )
    )
  }

  private def engineWire(limit: Option[Long]): Map[String, Array[Byte]] =
    UnitHotpath
      .unitHotPathWire(spark, mkTs(rows), startUs, endUs, pixelUs, c, spikeDurUs, limit)
      .as[(String, Array[Byte])]
      .collect()
      .toMap

  "unitHotPathWire" should "emit byte-identical frames to the sequential kernel (unlimited)" in {
    val got = engineWire(None)
    got.keySet shouldBe Set("u")
    got("u") shouldBe kernelWire(None)
    // sanity on the decoded shape: 40 bins x 2, waveforms 2..12 x 12 chunks x 2
    val e = SegmentProto.decodeTimeSeriesMessage(got("u")).event.get
    e.times.size shouldBe 80
    e.data.size shouldBe 11 * 12 * 2
    e.pointsPerEvent shouldBe 12L
    e.pageStart shouldBe startUs
    e.pageEnd shouldBe endUs
  }

  it should "reproduce the limit branch: first n bins AND first n waveforms" in {
    val got = engineWire(Some(3L))
    got("u") shouldBe kernelWire(Some(3L))
    val e = SegmentProto.decodeTimeSeriesMessage(got("u")).event.get
    e.times.size shouldBe 6
    e.data.size shouldBe 3 * 12 * 2
  }

  it should "reproduce the zero-limit branch: page coordinates only" in {
    val got = engineWire(Some(0L))
    val e = SegmentProto.decodeTimeSeriesMessage(got("u")).event.get
    e.times shouldBe Nil
    e.data shouldBe Nil
    e.pointsPerEvent shouldBe 0L
    e.pageStart shouldBe startUs
    e.pageEnd shouldBe endUs
    e.samplePeriod shouldBe pixelUs
  }

  it should "suppress spike data when pixelWidth * threshold >= spikeDuration" in {
    // spikeDuration of 5 pixels: 1h * 10 >= 5h -> times only
    val got = UnitHotpath
      .unitHotPathWire(spark, mkTs(rows), startUs, endUs, pixelUs, c, 5L * pixelUs, None)
      .as[(String, Array[Byte])]
      .collect()
      .toMap
    val e = SegmentProto.decodeTimeSeriesMessage(got("u")).event.get
    e.times.size shouldBe 80
    e.data shouldBe Nil
    e.pointsPerEvent shouldBe 0L
  }

  "tsUnitHotpath" should "serve every channel of the fixed request with nonempty frames" in {
    val out = UnitHotpath.tsUnitHotpath(spark, sfDir).collect()
    out.length should be > 0
    // every events channel in the page window appears exactly once
    val chans = Tables
      .ts(spark, sfDir)
      .filter($"t" >= graft.operators.Filtering.HotpathRangeStartUs &&
        $"t" < graft.operators.Filtering.HotpathRangeEndUs)
      .select("channel")
      .distinct()
      .as[String]
      .collect()
      .sorted
    out.map(_.getAs[String]("channel")).sorted shouldBe chans
    out.foreach(r => r.getAs[Int]("wire_bytes") should be > 0)
  }
}
