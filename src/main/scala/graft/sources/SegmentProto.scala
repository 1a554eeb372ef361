package graft.sources

import graft.streaming.RealtimeResample.Segment

/** Protobuf wire encoding of the reference's streamed output
  * contract, BOTH branches: `TimeSeriesMessage { segment = 1 }` for
  * continuous channels and `TimeSeriesMessage { event = 2 }` for unit
  * (spike) channels — the bytes a consumer of the reference's
  * websocket stream actually parses (reference: src/test/.../
  * SegmentProtobufSpec.scala round-trips the segment message;
  * server/TimeSeriesFlow.scala emits both; query/
  * TimeSeriesUnitQueryRawHttp.scala:104-118 builds the event one).
  *
  * The reference's .proto ships in an external library, so the field
  * table below is reconstructed from the reference's generated-code
  * usage: ScalaPB case-class parameter order follows field-number
  * order, and the oldest reference spec (SegmentProtobufSpec, 2016)
  * constructs exactly fields 1-11 in order — startTs, source,
  * lastUsed, unit, samplePeriod, pageStart, isMinMax, unitM,
  * segmentType, nrPoints, data — with requestedSamplePeriod, pageEnd,
  * channelName the later additions (query/BaseTimeSeriesQuery.scala:151)
  * taking 12-14. TimeSeriesMessage's destructuring order
  * (server/TimeSeriesFlow.scala:390-397) gives segment=1, event=2,
  * instruction=3, ingestSegment=4, totalResponses=5,
  * responseSequenceId=6.
  *
  * Wire format is plain public protobuf (proto3): varint scalars,
  * fixed64 doubles, length-delimited strings/messages, repeated
  * doubles PACKED, default values omitted. Hand-rolled here — the
  * container has no protobuf dependency, and the writer is ~60 lines.
  */
object SegmentProto {

  // ---------------------------------------------------------------- writer

  private final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def bytes: Array[Byte] = out.toByteArray

    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    private def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)

    /** varint scalar (uint32/uint64/int32/int64/bool); default 0 omitted. */
    def int(field: Int, v: Long): Unit = if (v != 0L) { tag(field, 0); varint(v) }
    def bool(field: Int, v: Boolean): Unit = if (v) { tag(field, 0); varint(1L) }
    def double(field: Int, v: Double): Unit = if (v != 0.0) {
      tag(field, 1)
      var bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
    }
    def string(field: Int, v: String): Unit = if (v != null && v.nonEmpty) {
      val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      tag(field, 2); varint(b.length.toLong); out.write(b)
    }
    def packedDoubles(field: Int, vs: Seq[Double]): Unit = if (vs.nonEmpty) {
      tag(field, 2)
      varint(vs.length * 8L)
      vs.foreach { v =>
        var bits = java.lang.Double.doubleToLongBits(v)
        var i = 0
        while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
      }
    }
    def packedLongs(field: Int, vs: Seq[Long]): Unit = if (vs.nonEmpty) {
      // proto3 repeated int64 defaults to packed: length prefix is the
      // payload BYTE length, so the varints render to a scratch buffer first
      val body = new Writer
      vs.foreach(body.varint)
      tag(field, 2)
      val b = body.bytes
      varint(b.length.toLong)
      out.write(b)
    }
    def message(field: Int, body: Array[Byte]): Unit = {
      tag(field, 2); varint(body.length.toLong); out.write(body)
    }
  }

  /** All 14 Segment fields. Fields the batch sink doesn't model default
    * to proto3 zero values and are omitted from the wire, exactly as
    * the reference's encoder would omit them.
    */
  def encodeSegmentFields(
    startTs: Long,
    source: String,
    lastUsed: Long = 0L,
    unit: String = "",
    samplePeriod: Double = 0.0,
    pageStart: Long = 0L,
    isMinMax: Boolean = false,
    unitM: Long = 0L,
    segmentType: String = "",
    nrPoints: Int = 0,
    data: Seq[Double] = Nil,
    requestedSamplePeriod: Long = 0L,
    pageEnd: Long = 0L,
    channelName: String = ""
  ): Array[Byte] = {
    val w = new Writer
    w.int(1, startTs)
    w.string(2, source)
    w.int(3, lastUsed)
    w.string(4, unit)
    w.double(5, samplePeriod)
    w.int(6, pageStart)
    w.bool(7, isMinMax)
    w.int(8, unitM)
    w.string(9, segmentType)
    w.int(10, nrPoints.toLong)
    w.packedDoubles(11, data)
    w.int(12, requestedSamplePeriod)
    w.int(13, pageEnd)
    w.string(14, channelName)
    w.bytes
  }

  /** All 7 Event fields — the unit-channel (spike) response branch of
    * TimeSeriesMessage (reference query/TimeSeriesUnitQueryRawHttp
    * .scala:104-118). Field numbers from generated-code parameter
    * order, same reconstruction as Segment: every construction site
    * names (source, pageStart, pageEnd, samplePeriod, pointsPerEvent,
    * times, data) in that order → fields 1-7. samplePeriod is
    * integral on the wire — the reference only ever assigns
    * `r.pixelWidth: Long` (µs), and its flow spec equality-checks an
    * integer value. `times` is the flattened (avgTime, count) pair
    * stream of the binned EventSummary rows (buildEventsFromSources:
    * `_events.map(e => (e.avgTime, e.count))`, then flattened;
    * server/TimeSeriesFlow.scala:412-420 re-groups it in twos);
    * `data` is the flattened (min, max) pairs of every resampled
    * spike waveform, `pointsPerEvent` chunks per spike.
    */
  def encodeEventFields(
    source: String = "",
    pageStart: Long = 0L,
    pageEnd: Long = 0L,
    samplePeriod: Long = 0L,
    pointsPerEvent: Long = 0L,
    times: Seq[Long] = Nil,
    data: Seq[Double] = Nil
  ): Array[Byte] = {
    val w = new Writer
    w.string(1, source)
    w.int(2, pageStart)
    w.int(3, pageEnd)
    w.int(4, samplePeriod)
    w.int(5, pointsPerEvent)
    w.packedLongs(6, times)
    w.packedDoubles(7, data)
    w.bytes
  }

  /** `TimeSeriesMessage { event = 2 }` — the unit-channel response
    * frame, the second half of the reference's wire surface.
    */
  def encodeEventMessage(
    eventFields: Array[Byte],
    totalResponses: Int = 1,
    responseSequenceId: Int = 0
  ): Array[Byte] = {
    val w = new Writer
    w.message(2, eventFields)
    w.int(5, totalResponses.toLong)
    w.int(6, responseSequenceId.toLong)
    w.bytes
  }

  /** One wire message per [[SegmentSink.toSegments]] row — the batch
    * analog of the reference's per-response websocket frame.
    */
  def encodeTimeSeriesMessage(
    s: Segment,
    totalResponses: Int = 1,
    responseSequenceId: Int = 0
  ): Array[Byte] = {
    val seg = encodeSegmentFields(
      startTs = s.startTs,
      source = s.source,
      samplePeriod = s.samplePeriod,
      isMinMax = s.isMinMax,
      segmentType = s.segmentType,
      nrPoints = s.nrPoints,
      data = s.data,
      requestedSamplePeriod = s.requestedSamplePeriod
    )
    val w = new Writer
    w.message(1, seg)
    w.int(5, totalResponses.toLong)
    w.int(6, responseSequenceId.toLong)
    w.bytes
  }

  // ---------------------------------------------------------------- reader

  /** Decoded Segment with every wire field (proto3 defaults where the
    * field is absent).
    */
  final case class WireSegment(
    startTs: Long,
    source: String,
    lastUsed: Long,
    unit: String,
    samplePeriod: Double,
    pageStart: Long,
    isMinMax: Boolean,
    unitM: Long,
    segmentType: String,
    nrPoints: Int,
    data: Seq[Double],
    requestedSamplePeriod: Long,
    pageEnd: Long,
    channelName: String
  )

  /** Decoded Event (proto3 defaults where a field is absent). */
  final case class WireEvent(
    source: String,
    pageStart: Long,
    pageEnd: Long,
    samplePeriod: Long,
    pointsPerEvent: Long,
    times: Seq[Long],
    data: Seq[Double]
  )

  final case class WireMessage(
    segment: Option[WireSegment],
    event: Option[WireEvent],
    totalResponses: Int,
    responseSequenceId: Int
  )

  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def fixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      v
    }
    def slice(len: Int): Reader = { val r = new Reader(bytes, pos, pos + len); pos += len; r }
    def utf8(len: Int): String = {
      val s = new String(bytes, pos, len, java.nio.charset.StandardCharsets.UTF_8)
      pos += len
      s
    }
  }

  private def decodeSegment(r: Reader): WireSegment = {
    var startTs, lastUsed, pageStart, unitM, reqSp, pageEnd = 0L
    var source, unit, segmentType, channelName = ""
    var samplePeriod = 0.0
    var isMinMax = false
    var nrPoints = 0
    val data = scala.collection.mutable.ArrayBuffer[Double]()
    while (r.hasNext) {
      val key = r.varint()
      val field = (key >>> 3).toInt
      val wire = (key & 7).toInt
      (field, wire) match {
        case (1, 0) => startTs = r.varint()
        case (2, 2) => source = r.utf8(r.varint().toInt)
        case (3, 0) => lastUsed = r.varint()
        case (4, 2) => unit = r.utf8(r.varint().toInt)
        case (5, 1) => samplePeriod = java.lang.Double.longBitsToDouble(r.fixed64())
        case (6, 0) => pageStart = r.varint()
        case (7, 0) => isMinMax = r.varint() != 0L
        case (8, 0) => unitM = r.varint()
        case (9, 2) => segmentType = r.utf8(r.varint().toInt)
        case (10, 0) => nrPoints = r.varint().toInt
        case (11, 2) =>
          val s = r.slice(r.varint().toInt)
          while (s.hasNext) data += java.lang.Double.longBitsToDouble(s.fixed64())
        case (11, 1) => data += java.lang.Double.longBitsToDouble(r.fixed64()) // unpacked emitter
        case (12, 0) => reqSp = r.varint()
        case (13, 0) => pageEnd = r.varint()
        case (14, 2) => channelName = r.utf8(r.varint().toInt)
        case (f, w) => throw new IllegalArgumentException(s"Segment: unexpected field $f wire $w")
      }
    }
    WireSegment(
      startTs, source, lastUsed, unit, samplePeriod, pageStart, isMinMax, unitM,
      segmentType, nrPoints, data.toSeq, reqSp, pageEnd, channelName
    )
  }

  private def decodeEvent(r: Reader): WireEvent = {
    var pageStart, pageEnd, samplePeriod, pointsPerEvent = 0L
    var source = ""
    val times = scala.collection.mutable.ArrayBuffer[Long]()
    val data = scala.collection.mutable.ArrayBuffer[Double]()
    while (r.hasNext) {
      val key = r.varint()
      ((key >>> 3).toInt, (key & 7).toInt) match {
        case (1, 2) => source = r.utf8(r.varint().toInt)
        case (2, 0) => pageStart = r.varint()
        case (3, 0) => pageEnd = r.varint()
        case (4, 0) => samplePeriod = r.varint()
        case (5, 0) => pointsPerEvent = r.varint()
        case (6, 2) =>
          val s = r.slice(r.varint().toInt)
          while (s.hasNext) times += s.varint()
        case (6, 0) => times += r.varint() // unpacked emitter
        case (7, 2) =>
          val s = r.slice(r.varint().toInt)
          while (s.hasNext) data += java.lang.Double.longBitsToDouble(s.fixed64())
        case (7, 1) => data += java.lang.Double.longBitsToDouble(r.fixed64()) // unpacked emitter
        case (f, w) => throw new IllegalArgumentException(s"Event: unexpected field $f wire $w")
      }
    }
    WireEvent(source, pageStart, pageEnd, samplePeriod, pointsPerEvent, times.toSeq, data.toSeq)
  }

  /** Decode a bare Segment message (the payload of field 1). */
  def decodeSegmentBytes(bytes: Array[Byte]): WireSegment =
    decodeSegment(new Reader(bytes, 0, bytes.length))

  /** Decode a bare Event message (the payload of field 2). */
  def decodeEventBytes(bytes: Array[Byte]): WireEvent =
    decodeEvent(new Reader(bytes, 0, bytes.length))

  def decodeTimeSeriesMessage(bytes: Array[Byte]): WireMessage = {
    val r = new Reader(bytes, 0, bytes.length)
    var segment: Option[WireSegment] = None
    var event: Option[WireEvent] = None
    var totalResponses = 0
    var responseSequenceId = 0
    while (r.hasNext) {
      val key = r.varint()
      ((key >>> 3).toInt, (key & 7).toInt) match {
        case (1, 2) => segment = Some(decodeSegment(r.slice(r.varint().toInt)))
        case (2, 2) => event = Some(decodeEvent(r.slice(r.varint().toInt)))
        case (5, 0) => totalResponses = r.varint().toInt
        case (6, 0) => responseSequenceId = r.varint().toInt
        case (f, w) =>
          throw new IllegalArgumentException(s"TimeSeriesMessage: unexpected field $f wire $w")
      }
    }
    WireMessage(segment, event, totalResponses, responseSequenceId)
  }
}
