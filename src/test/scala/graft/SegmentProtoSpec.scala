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
