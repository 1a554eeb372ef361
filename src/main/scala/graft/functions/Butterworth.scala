package graft.functions

/** Butterworth IIR filter design + application — pure Scala, no deps.
  *
  * Re-expresses the reference engine's per-channel filtering semantics
  * (reference: server/TimeSeriesFlow.scala:921-948 builds
  * lowpass/highpass/bandpass/bandstop Butterworth cascades per channel;
  * server/FilterStateTracker.scala tracks cascade state + reset).
  *
  * The design math is the classical public-domain recipe the reference's
  * filter library also follows: an analog Butterworth lowpass prototype
  * (poles uniformly spaced on the left unit semicircle), mapped to the
  * digital domain via the bilinear transform with tan prewarp for
  * lowpass/highpass, and via the Constantinides digital band
  * transformations (prototype cutoff π/2) for bandpass/bandstop. The
  * result is a cascade of real biquad sections applied in Direct Form II.
  */
object Butterworth {

  /** Minimal complex arithmetic (no external deps). */
  private final case class Cx(re: Double, im: Double) {
    def +(o: Cx): Cx = Cx(re + o.re, im + o.im)
    def -(o: Cx): Cx = Cx(re - o.re, im - o.im)
    def *(o: Cx): Cx = Cx(re * o.re - im * o.im, re * o.im + im * o.re)
    def /(o: Cx): Cx = {
      val d = o.re * o.re + o.im * o.im
      Cx((re * o.re + im * o.im) / d, (im * o.re - re * o.im) / d)
    }
    def unary_- : Cx = Cx(-re, -im)
    def conj: Cx = Cx(re, -im)
    def abs: Double = math.hypot(re, im)
    def sqrt: Cx = {
      val m = math.sqrt(abs)
      val a = math.atan2(im, re) / 2.0
      Cx(m * math.cos(a), m * math.sin(a))
    }
  }
  private object Cx {
    val one: Cx = Cx(1, 0)
    def real(x: Double): Cx = Cx(x, 0)
  }

  /** One second-order section; a0 normalized to 1. */
  final case class Biquad(b0: Double, b1: Double, b2: Double, a1: Double, a2: Double)
      extends Serializable

  /** A biquad cascade with an overall input gain. */
  final case class Cascade(biquads: Vector[Biquad], gain: Double) extends Serializable {

    /** Complex frequency response magnitude at digital frequency w (rad/sample). */
    def magnitudeAt(w: Double): Double = {
      val z1 = Cx(math.cos(-w), math.sin(-w)) // e^{-jw}
      val z2 = z1 * z1
      var h = Cx.real(gain)
      biquads.foreach { q =>
        val num = Cx.real(q.b0) + z1 * q.b1 + z2 * q.b2
        val den = Cx.one + z1 * q.a1 + z2 * q.a2
        h = h * (num / den)
      }
      h.abs
    }
    private implicit class CxScale(c: Cx) {
      def *(s: Double): Cx = Cx(c.re * s, c.im * s)
    }
  }

  /** Mutable per-stream filter state (Direct Form II), the analog of the
    * reference's FilterStateTracker: filter() advances state, reset()
    * returns to a clean state.
    */
  final class State(cascade: Cascade) extends Serializable {
    private val bq = cascade.biquads.toArray
    private val n = bq.length
    private val v1 = new Array[Double](n)
    private val v2 = new Array[Double](n)

    def reset(): Unit = {
      java.util.Arrays.fill(v1, 0.0)
      java.util.Arrays.fill(v2, 0.0)
    }

    /** Export the delay-line state (for persistence across streaming
      * micro-batches).
      */
    def save(): (Array[Double], Array[Double]) = (v1.clone(), v2.clone())

    /** Restore a previously saved delay-line state. */
    def load(nv1: Array[Double], nv2: Array[Double]): Unit = {
      require(nv1.length == n && nv2.length == n, s"state length must be $n")
      System.arraycopy(nv1, 0, v1, 0, n)
      System.arraycopy(nv2, 0, v2, 0, n)
    }

    def filter(x: Double): Double = {
      var acc = x * cascade.gain
      var i = 0
      while (i < n) {
        val q = bq(i)
        val w = acc - q.a1 * v1(i) - q.a2 * v2(i)
        acc = q.b0 * w + q.b1 * v1(i) + q.b2 * v2(i)
        v2(i) = v1(i)
        v1(i) = w
        i += 1
      }
      acc
    }

    def filterAll(xs: Array[Double]): Array[Double] = {
      val out = new Array[Double](xs.length)
      var i = 0
      while (i < xs.length) { out(i) = filter(xs(i)); i += 1 }
      out
    }
  }

  /** Analog lowpass prototype poles in the upper-left half plane
    * (conjugates implied), plus the real pole -1 for odd orders last.
    */
  private def prototypePoles(order: Int): (Vector[Cx], Option[Cx]) = {
    val pairs = (0 until order / 2).map { i =>
      val theta = math.Pi / 2.0 + (2 * i + 1) * math.Pi / (2.0 * order)
      Cx(math.cos(theta), math.sin(theta))
    }.toVector
    val realPole = if ((order & 1) == 1) Some(Cx.real(-1.0)) else None
    (pairs, realPole)
  }

  private def bilinear(s: Cx): Cx = (Cx.one + s) / (Cx.one - s)

  /** Biquad from a complex pole (conjugate implied) and a zero pair
    * given as real quadratic numerator coefficients.
    */
  private def biquadConj(pole: Cx, b0: Double, b1: Double, b2: Double): Biquad =
    Biquad(b0, b1, b2, -2.0 * pole.re, pole.re * pole.re + pole.im * pole.im)

  /** Biquad from two poles that are either both real or a conjugate pair. */
  private def biquadPair(p1: Cx, p2: Cx, b0: Double, b1: Double, b2: Double): Biquad =
    Biquad(b0, b1, b2, -(p1 + p2).re, (p1 * p2).re)

  private def normalized(biquads: Vector[Biquad], wNorm: Double): Cascade = {
    val unscaled = Cascade(biquads, 1.0)
    val mag = unscaled.magnitudeAt(wNorm)
    Cascade(biquads, if (mag > 0) 1.0 / mag else 1.0)
  }

  /** Lowpass: analog prewarp f = tan(π fc/fs), scale prototype poles,
    * bilinear; zeros at z = -1; unit gain at DC.
    */
  def lowPass(order: Int, fs: Double, fc: Double): Cascade = {
    val f = math.tan(math.Pi * fc / fs)
    val (pairs, realPole) = prototypePoles(order)
    val qs = pairs.map(p => biquadConj(bilinear(Cx(p.re * f, p.im * f)), 1.0, 2.0, 1.0)) ++
      realPole.map { p =>
        val zp = bilinear(Cx.real(p.re * f))
        Biquad(1.0, 1.0, 0.0, -zp.re, 0.0)
      }
    normalized(qs, 0.0)
  }

  /** Highpass: analog frequency inversion s -> f/s with f = tan(π fc/fs)
    * (equivalently scale by 1/f and negate the bilinear image); zeros at
    * z = +1; unit gain at Nyquist.
    */
  def highPass(order: Int, fs: Double, fc: Double): Cascade = {
    val f = 1.0 / math.tan(math.Pi * fc / fs)
    val (pairs, realPole) = prototypePoles(order)
    val qs = pairs.map(p => biquadConj(-bilinear(Cx(p.re * f, p.im * f)), 1.0, -2.0, 1.0)) ++
      realPole.map { p =>
        val zp = -bilinear(Cx.real(p.re * f))
        Biquad(1.0, -1.0, 0.0, -zp.re, 0.0)
      }
    normalized(qs, math.Pi)
  }

  /** Band-edge geometry shared by bandpass/bandstop: the reference
    * parameterizes by center frequency and width, so edges are
    * wc2 = 2π(fc-fw/2)/fs and wc = 2π(fc+fw/2)/fs (rad/sample).
    */
  private def bandEdges(fs: Double, fc: Double, fw: Double): (Double, Double) = {
    val ww = 2.0 * math.Pi * fw / fs
    var wc2 = 2.0 * math.Pi * fc / fs - ww / 2.0
    var wc = wc2 + ww
    if (wc2 < 1e-8) wc2 = 1e-8
    if (wc > math.Pi - 1e-8) wc = math.Pi - 1e-8
    (wc2, wc)
  }

  /** Bandpass via the Constantinides LP→BP digital transformation from
    * prototype cutoff π/2: each digital-prototype pole c (bilinear image
    * of an analog pole; the substituted variable z⁻¹ must hit 1/c, so
    * the z-plane poles come out as the roots t of
    *   [(k+1)+c(k-1)] t² - 2αk(1+c) t + [(k-1)+c(k+1)] = 0
    * with α = cos((wc+wc2)/2)/cos((wc-wc2)/2), k = cot((wc-wc2)/2).
    * Prototype zeros at z=-1 split into digital zeros at z=±1.
    */
  def bandPass(order: Int, fs: Double, fc: Double, fw: Double): Cascade = {
    val (wc2, wc) = bandEdges(fs, fc, fw)
    val alpha = math.cos((wc + wc2) * 0.5) / math.cos((wc - wc2) * 0.5)
    val k = 1.0 / math.tan((wc - wc2) * 0.5)

    def transform(c: Cx): (Cx, Cx) = {
      val qa = Cx.real(k + 1) + c * Cx.real(k - 1)
      val qb = (Cx.one + c) * Cx.real(-2.0 * alpha * k)
      val qc = Cx.real(k - 1) + c * Cx.real(k + 1)
      val disc = (qb * qb - Cx.real(4.0) * qa * qc).sqrt
      val t1 = (-qb + disc) / (qa * Cx.real(2.0))
      val t2 = (-qb - disc) / (qa * Cx.real(2.0))
      (t1, t2)
    }

    val (pairs, realPole) = prototypePoles(order)
    val qs = pairs.flatMap { p =>
      val (z1, z2) = transform(bilinear(p))
      Vector(biquadConj(z1, 1.0, 0.0, -1.0), biquadConj(z2, 1.0, 0.0, -1.0))
    } ++ realPole.map { p =>
      val (z1, z2) = transform(bilinear(p))
      biquadPair(z1, z2, 1.0, 0.0, -1.0)
    }
    // normalize at the exact mapped band center: the transform sends
    // w_center to prototype DC where cos(w_center) = α
    normalized(qs, math.acos(alpha))
  }

  /** Bandstop via the Constantinides LP→BS digital transformation from
    * prototype cutoff π/2: each digital-prototype pole c (substituted
    * variable z⁻¹ must hit 1/c) yields z-plane poles as the roots t of
    *   [(1+b)-c(1-b)] t² - 2α(1-c) t + [(1-b)-c(1+b)] = 0
    * with α = cos((wc+wc2)/2)/cos((wc-wc2)/2), b = tan((wc-wc2)/2).
    * All prototype zeros (z=-1) map to the notch pair e^{±jθ0},
    * cos θ0 = α ⇒ numerator (1, -2α, 1) for every section.
    */
  def bandStop(order: Int, fs: Double, fc: Double, fw: Double): Cascade = {
    val (wc2, wc) = bandEdges(fs, fc, fw)
    val alpha = math.cos((wc + wc2) * 0.5) / math.cos((wc - wc2) * 0.5)
    val b = math.tan((wc - wc2) * 0.5)

    def transform(c: Cx): (Cx, Cx) = {
      val qa = Cx.real(1 + b) - c * Cx.real(1 - b)
      val qb = (Cx.one - c) * Cx.real(-2.0 * alpha)
      val qc = Cx.real(1 - b) - c * Cx.real(1 + b)
      val disc = (qb * qb - Cx.real(4.0) * qa * qc).sqrt
      val t1 = (-qb + disc) / (qa * Cx.real(2.0))
      val t2 = (-qb - disc) / (qa * Cx.real(2.0))
      (t1, t2)
    }

    val (pairs, realPole) = prototypePoles(order)
    val nb0 = 1.0
    val nb1 = -2.0 * alpha
    val nb2 = 1.0
    val qs = pairs.flatMap { p =>
      val (z1, z2) = transform(bilinear(p))
      Vector(biquadConj(z1, nb0, nb1, nb2), biquadConj(z2, nb0, nb1, nb2))
    } ++ realPole.map { p =>
      val (z1, z2) = transform(bilinear(p))
      biquadPair(z1, z2, nb0, nb1, nb2)
    }
    normalized(qs, if (fc / fs < 0.25) math.Pi else 0.0)
  }

  /** Build a cascade from the reference's filter-request vocabulary
    * (reference: server/TimeSeriesFlow.scala:921 buildFilter — filter
    * name + [order, freq, (width)] against the channel's rate).
    */
  def design(filter: String, rate: Double, params: Seq[Double]): Cascade = {
    val order = params.head.toInt
    val freq = params(1)
    filter.toLowerCase match {
      case "lowpass" => lowPass(order, rate, freq)
      case "highpass" => highPass(order, rate, freq)
      case "bandpass" => bandPass(order, rate, freq, params(2))
      case "bandstop" => bandStop(order, rate, freq, params(2))
      case other => throw new IllegalArgumentException(s"unknown filter type: $other")
    }
  }

  /** The reference's conservative transient-length estimate used to size
    * the reflected prewarm pad (reference:
    * query/TimeSeriesQueryRawHttp.scala:201-216 — 8 cycles of the cutoff,
    * scaled linearly with order). maxFilterFreq for band filters is
    * center + width (reference: server/TimeSeriesFlow.scala:930-938).
    */
  def transientLength(order: Int, maxFilterFreq: Double, sampleRate: Double): Int = {
    val cyclesAtCutoff = sampleRate / maxFilterFreq
    val conservativeCycles = 8.0
    val orderFactor = 1.0 + (order - 1) * 0.5
    math.ceil(cyclesAtCutoff * conservativeCycles * orderFactor).toInt
  }

  /** Reflected prewarm vector — exact reference policy (reference:
    * query/TimeSeriesQueryRawHttp.scala:255-313): reverse the first
    * `padLength` samples; shorter inputs reflect-and-pad or tile the
    * reflection pattern.
    */
  def reflectedPrewarm(data: Array[Double], padLength: Int): Array[Double] = {
    if (data.isEmpty) return Array.fill(padLength)(0.0)
    if (data.length == 1) return Array.fill(padLength)(data(0))
    if (data.length >= padLength) return data.take(padLength).reverse
    val reflected = data.reverse
    if (data.length >= padLength / 2) {
      val combined = reflected ++ data
      if (combined.length >= padLength) combined.take(padLength)
      else Array.fill(padLength - combined.length)(data(0)) ++ combined
    } else {
      val pattern = reflected ++ data
      Iterator.continually(pattern).flatten.take(padLength).toArray
    }
  }

  /** Filter one contiguous block from a clean state with reflected
    * prewarm (process-but-drop the pad, then emit the filtered block) —
    * the reference's applyFilterWithPadding on a clean filter.
    */
  def filterBlock(cascade: Cascade, data: Array[Double], padLength: Int): Array[Double] = {
    if (data.isEmpty) return data
    val st = new State(cascade)
    val pad = reflectedPrewarm(data, padLength)
    var i = 0
    while (i < pad.length) { st.filter(pad(i)); i += 1 }
    st.filterAll(data)
  }
}
