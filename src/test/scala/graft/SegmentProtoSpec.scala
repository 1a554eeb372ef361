package graft

import graft.sources.{SegmentProto, SegmentSink}
import graft.streaming.RealtimeResample.Segment

class SegmentProtoSpec extends SparkSpec {
  import spark.implicits._

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  "SegmentProto" should "emit the exact protobuf wire bytes (golden)" in {
    // hand-computed from the public protobuf wire spec: every tag,
    // varint, LE double and length byte — pins the format so an
    // encoder+decoder bug pair can't hide behind a clean round-trip
    val msg = SegmentProto.encodeTimeSeriesMessage(
      Segment(
        source = "a",
        startTs = 1L,
        samplePeriod = 0.5,
        requestedSamplePeriod = 0L,
        isMinMax = false,
        segmentType = "",
        nrPoints = 1,
        data = Seq(1.0)
      ),
      totalResponses = 1,
      responseSequenceId = 0
    )
    hex(msg) shouldBe
      "0a1a" + // field 1 (segment), len 26
      "0801" + // startTs = 1
      "120161" + // source = "a"
      "29000000000000e03f" + // samplePeriod = 0.5 (fixed64 LE)
      "5001" + // nrPoints = 1
      "5a08000000000000f03f" + // data = [1.0] packed
      "2801" // totalResponses = 1 (responseSequenceId 0 omitted)
  }

  it should "round-trip the reference spec's segment field-for-field" in {
    // the same segment shape SegmentProtobufSpec round-trips in the
    // reference (fields 1-11, 123 data points, type "Continuous")
    val now = 1726000000000L
    val data = (0 until 123).map(_.toDouble)
    val seg = SegmentProto.encodeSegmentFields(
      startTs = now,
      source = "abc123",
      lastUsed = now,
      unit = "V",
      samplePeriod = 1.23,
      pageStart = 123L,
      isMinMax = false,
      unitM = 123L,
      segmentType = "Continuous",
      nrPoints = 123,
      data = data
    )
    val d = SegmentProto.decodeSegmentBytes(seg)
    d.startTs shouldBe now
    d.source shouldBe "abc123"
    d.lastUsed shouldBe now
    d.unit shouldBe "V"
    d.samplePeriod shouldBe 1.23
    d.pageStart shouldBe 123L
    d.isMinMax shouldBe false
    d.unitM shouldBe 123L
    d.segmentType shouldBe "Continuous"
    d.nrPoints shouldBe 123
    d.data shouldBe data
    // later-added fields absent → defaults
    d.requestedSamplePeriod shouldBe 0L
    d.channelName shouldBe ""
  }

  "SegmentProto event branch" should "emit the exact protobuf wire bytes (golden)" in {
    // hand-computed: TimeSeriesMessage{event=2} with Event fields 1-7
    // in the reference's constructor order — pins the unit-channel
    // wire contract the same way the segment golden does
    val msg = SegmentProto.encodeEventMessage(
      SegmentProto.encodeEventFields(
        source = "a",
        pageStart = 1L,
        pageEnd = 2L,
        samplePeriod = 3L,
        pointsPerEvent = 2L,
        times = Seq(5L, 1L),
        data = Seq(1.0)
      ),
      totalResponses = 1,
      responseSequenceId = 0
    )
    hex(msg) shouldBe
      "1219" + // field 2 (event), len 25
      "0a0161" + // source = "a"
      "1001" + // pageStart = 1
      "1802" + // pageEnd = 2
      "2003" + // samplePeriod = 3
      "2802" + // pointsPerEvent = 2
      "32020501" + // times = [5, 1] packed varints
      "3a08000000000000f03f" + // data = [1.0] packed
      "2801" // totalResponses = 1 (responseSequenceId 0 omitted)
  }

  it should "round-trip the reference UnitDataRequestSpec times vector" in {
    // the reference's own expected unit response payload
    // (UnitDataRequestSpec.scala:122): flattened (time, count) pairs
    val times = Seq(0L, 1L, 113464266L, 2L, 534781953L, 947L, 552674525L, 300L)
    val data = Seq(0.7, 178.35, 0.81, 159.22, 11.96, 113.44)
    val enc = SegmentProto.encodeEventMessage(
      SegmentProto.encodeEventFields(
        source = "N:c:797d784e8736466aa28ad8762f70d1a2",
        pageStart = 1485889717000000L,
        pageEnd = 1485889722000000L,
        samplePeriod = 10170L,
        pointsPerEvent = 3L,
        times = times,
        data = data
      ),
      totalResponses = 4,
      responseSequenceId = 2
    )
    val m = SegmentProto.decodeTimeSeriesMessage(enc)
    m.segment shouldBe None
    m.totalResponses shouldBe 4
    m.responseSequenceId shouldBe 2
    val e = m.event.get
    e.source shouldBe "N:c:797d784e8736466aa28ad8762f70d1a2"
    e.pageStart shouldBe 1485889717000000L
    e.pageEnd shouldBe 1485889722000000L
    e.samplePeriod shouldBe 10170L
    e.pointsPerEvent shouldBe 3L
    e.times shouldBe times
    e.data shouldBe data
    // a zero-limit response (the reference's Some(0) branch) carries
    // only the page coordinates
    val zeroLimit = SegmentProto.decodeEventBytes(
      SegmentProto.encodeEventFields(source = "ch", pageStart = 7L, pageEnd = 9L, samplePeriod = 2L)
    )
    zeroLimit.times shouldBe Nil
    zeroLimit.data shouldBe Nil
    zeroLimit.pointsPerEvent shouldBe 0L
  }

  it should "assemble eventBins + spikeWaveforms into the wire payload end to end" in {
    val pixelUs = 3600000000L
    val ts = Tables.ts(spark, sfDir).filter($"channel" === "click")
    val bins = graft.operators.Timeseries.eventBins(ts, pixelUs)
    val wfs = graft.operators.Timeseries
      .spikeWaveforms(spark, ts.limit(64), spikeDataPointCount = 8, chunkCount = 4)
    val msgs = SegmentSink
      .toEventMessages(spark, bins, wfs, 0L, 7L * 86400000000L, pixelUs, pointsPerEvent = 4)
      .collect()
      .toMap
    val e = SegmentProto.decodeTimeSeriesMessage(msgs("click")).event.get
    e.source shouldBe "click"
    e.samplePeriod shouldBe pixelUs
    e.pointsPerEvent shouldBe 4L
    // times = flattened (avg_time, n) in bucket order
    val expectTimes = bins
      .orderBy("bucket")
      .select("avg_time", "n")
      .as[(Long, Long)]
      .collect()
      .flatMap { case (a, n) => Seq(a, n) }
      .toSeq
    e.times shouldBe expectTimes
    // data = flattened (wmin, wmax) in (wf, chunk) order
    val expectData = wfs
      .orderBy("wf", "chunk")
      .select("wmin", "wmax")
      .as[(Double, Double)]
      .collect()
      .flatMap { case (a, b) => Seq(a, b) }
      .toSeq
    e.data shouldBe expectData
  }

  it should "round-trip SegmentSink output through the wire format" in {
    val segs = SegmentSink
      .toSegments(
        spark,
        graft.operators.Timeseries.downsample(Tables.ts(spark, sfDir), 3600000000L),
        3600000000L
      )
      .collect()
    segs should not be empty
    segs.foreach { s =>
      val decoded = SegmentProto.decodeTimeSeriesMessage(
        SegmentProto.encodeTimeSeriesMessage(s, totalResponses = 7, responseSequenceId = 3)
      )
      decoded.totalResponses shouldBe 7
      decoded.responseSequenceId shouldBe 3
      val d = decoded.segment.get
      d.startTs shouldBe s.startTs
      d.source shouldBe s.source
      d.samplePeriod shouldBe s.samplePeriod
      d.requestedSamplePeriod shouldBe s.requestedSamplePeriod
      d.isMinMax shouldBe s.isMinMax
      d.segmentType shouldBe s.segmentType
      d.nrPoints shouldBe s.nrPoints
      d.data shouldBe s.data
      // unmodeled fields come back as proto3 defaults
      d.lastUsed shouldBe 0L
      d.unit shouldBe ""
      d.pageEnd shouldBe 0L
    }
  }
}
