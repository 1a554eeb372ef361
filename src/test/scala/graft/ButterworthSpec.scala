package graft

import graft.functions.Butterworth
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class ButterworthSpec extends AnyFlatSpec with Matchers {

  /** The reference's FilterSpec input resource (combined.txt) is the
    * deterministic signal sin(2π·10·t/250) + sin(2π·50·t/250) stored in
    * float32 precision, 1250 samples @ 250 Hz; regenerated here rather
    * than copied.
    */
  private def combinedSignal: Array[Double] =
    (0 until 1250).map { i =>
      (math.sin(2 * math.Pi * 10 * i / 250.0) +
        math.sin(2 * math.Pi * 50 * i / 250.0)).toFloat.toDouble
    }.toArray

  "bandstop(4, 250, 50, 3)" should "reproduce the reference FilterSpec golden outputs" in {
    // Golden vector from the reference's own test
    // (FilterSpec.scala:57-61, notchFilter = Butterworth bandStop(4,250,50,3)
    // applied from a clean state with no prewarm).
    val golden = Vector(0.0, 1.087161635562614, 0.9029426242294433, 0.20389260356351335,
      0.21682008432239974, 0.9644012648863328, 1.4729224362016369, 1.2208633250496284,
      0.6931728654057703, 0.5172583945876954)

    val cascade = Butterworth.bandStop(4, 250.0, 50.0, 3.0)
    val st = new Butterworth.State(cascade)
    val out = st.filterAll(combinedSignal)

    // Tolerance: the regenerated inputs match the reference resource to
    // within 1 float32 ulp (~1.2e-7, the file was produced by a different
    // sin implementation); with near-unit filter gain that bounds the
    // output deviation well under 1e-6.
    out.take(10).zip(golden).foreach { case (o, g) =>
      o shouldBe g +- 1e-6
    }
  }

  it should "attenuate the 50 Hz component and pass the 10 Hz component" in {
    val cascade = Butterworth.bandStop(4, 250.0, 50.0, 3.0)
    cascade.magnitudeAt(2 * math.Pi * 50.0 / 250.0) should be < 1e-6
    cascade.magnitudeAt(2 * math.Pi * 10.0 / 250.0) shouldBe 1.0 +- 1e-3
  }

  "lowPass" should "have unit DC gain and attenuate above cutoff" in {
    val c = Butterworth.lowPass(4, 250.0, 20.0)
    c.magnitudeAt(0.0) shouldBe 1.0 +- 1e-12
    c.magnitudeAt(2 * math.Pi * 20.0 / 250.0) shouldBe math.sqrt(0.5) +- 1e-9 // -3dB at cutoff
    c.magnitudeAt(2 * math.Pi * 80.0 / 250.0) should be < 1e-3
  }

  "highPass" should "have unit Nyquist gain and attenuate below cutoff" in {
    val c = Butterworth.highPass(3, 250.0, 30.0)
    c.magnitudeAt(math.Pi) shouldBe 1.0 +- 1e-12
    c.magnitudeAt(2 * math.Pi * 30.0 / 250.0) shouldBe math.sqrt(0.5) +- 1e-9
    c.magnitudeAt(2 * math.Pi * 3.0 / 250.0) should be < 1e-2
  }

  "bandPass" should "pass the center and attenuate both edges at -3dB" in {
    val c = Butterworth.bandPass(4, 250.0, 40.0, 10.0)
    // -3dB at both band edges fc ± fw/2
    c.magnitudeAt(2 * math.Pi * 35.0 / 250.0) shouldBe math.sqrt(0.5) +- 1e-9
    c.magnitudeAt(2 * math.Pi * 45.0 / 250.0) shouldBe math.sqrt(0.5) +- 1e-9
    c.magnitudeAt(2 * math.Pi * 10.0 / 250.0) should be < 1e-3
    c.magnitudeAt(2 * math.Pi * 40.0 / 250.0) shouldBe 1.0 +- 1e-2
  }

  "bandStop odd order" should "still notch the center with real coefficients" in {
    val c = Butterworth.bandStop(3, 250.0, 50.0, 4.0)
    c.biquads should have size 3
    c.magnitudeAt(2 * math.Pi * 50.0 / 250.0) should be < 1e-6
    c.magnitudeAt(0.0) shouldBe 1.0 +- 1e-6
  }

  "transientLength" should "match the reference estimate (8 cycles, order-scaled)" in {
    // reference: query/TimeSeriesQueryRawHttp.scala:201-216
    // (250/53) * 8 * (1 + 3*0.5) = 94.34 -> 95
    Butterworth.transientLength(4, 53.0, 250.0) shouldBe 95
  }

  "reflectedPrewarm" should "follow the reference padding policy" in {
    // reference: query/TimeSeriesQueryRawHttp.scala:255-313
    val d = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    // enough data: first padLength reversed
    Butterworth.reflectedPrewarm(d, 3).toList shouldBe List(3.0, 2.0, 1.0)
    // single value: repeated
    Butterworth.reflectedPrewarm(Array(7.0), 4).toList shouldBe List(7.0, 7.0, 7.0, 7.0)
    // >= half required: reflection ++ data, head-padded if short
    Butterworth.reflectedPrewarm(Array(1.0, 2.0), 3).toList shouldBe List(2.0, 1.0, 1.0)
    // very short data: tiled reflection pattern
    Butterworth.reflectedPrewarm(Array(1.0, 2.0), 9).toList shouldBe
      List(2.0, 1.0, 1.0, 2.0, 2.0, 1.0, 1.0, 2.0, 2.0)
  }

  "filterBlock" should "converge to the same steady-state as a long-running filter" in {
    val cascade = Butterworth.lowPass(4, 250.0, 20.0)
    val signal = (0 until 2000).map(i => math.sin(2 * math.Pi * 5 * i / 250.0)).toArray

    // continuous filtering of the whole stream
    val continuous = new Butterworth.State(cascade).filterAll(signal)
    // block restart at sample 1000 with reflected prewarm
    val block2 = Butterworth.filterBlock(cascade, signal.drop(1000), 95)

    // after the prewarm transient, the restarted block tracks the
    // continuous result closely
    val tail = block2.drop(200).zip(continuous.drop(1200))
    tail.foreach { case (a, b) => a shouldBe b +- 1e-3 }
  }
}
