package graft

import graft.functions.{Butterworth, Winnow}
import graft.streaming.RealtimeResample
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based tests for the pure kernels (no SparkSession). */
object KernelProperties extends Properties("graft.kernels") {

  // ------------------------------------------------------------------ cut
  private val cutGen = for {
    m <- Gen.choose(0, 500)
    n <- Gen.choose(1, 50)
  } yield (Vector.tabulate(m)(identity), n)

  property("cut preserves order and content") = forAll(cutGen) { case (xs, n) =>
    RealtimeResample.cut(xs, n).flatten == xs
  }

  property("cut produces exactly n chunks with balanced sizes") = forAll(cutGen) {
    case (xs, n) =>
      val chunks = RealtimeResample.cut(xs, n)
      val sizes = chunks.map(_.length)
      chunks.length == n && (xs.isEmpty || sizes.max - sizes.min <= 1)
  }

  // ------------------------------------------------------------- resample
  private val dataGen = for {
    m <- Gen.choose(1, 300)
    n <- Gen.choose(1, 40)
    xs <- Gen.listOfN(m, Gen.chooseNum(-1e6, 1e6))
  } yield (xs.toVector, n)

  property("resample chunk (min,max) bound the data they cover") = forAll(dataGen) {
    case (xs, n) =>
      val pairs = RealtimeResample.resample(xs, n)
      pairs.forall { case (mn, mx) => mn <= mx && mn >= xs.min && mx <= xs.max }
  }

  // -------------------------------------------------------------- winnow
  private val alpha = Gen.stringOfN(40, Gen.alphaLowerChar)

  property("winnowing guarantee: shared substring of length k+win-1 shares a fingerprint") =
    forAll(alpha, alpha, alpha) { (shared, p1, p2) =>
      val k = 8
      val win = 4
      // shared region of length >= k + win - 1 = 11 (use all 40 chars)
      val d1 = p1 + shared
      val d2 = shared + p2
      val f1 = Winnow.fingerprints(d1, k, win).toSet
      val f2 = Winnow.fingerprints(d2, k, win).toSet
      (f1 intersect f2).nonEmpty
    }

  property("winnow fingerprints are a subset of all gram hashes") = forAll(alpha) { s =>
    val all = Winnow.fingerprints(s, 5, 1).toSet
    Winnow.fingerprints(s, 5, 3).toSet.subsetOf(all)
  }

  // --------------------------------------------------------- butterworth
  private val designGen = for {
    order <- Gen.choose(1, 8)
    fc <- Gen.choose(5.0, 100.0)
  } yield (order, fc)

  property("lowpass cascade is stable (bounded output on bounded input)") =
    forAll(designGen, Gen.long) { case ((order, fc), seed) =>
      val cascade = Butterworth.lowPass(order, 250.0, fc)
      val rnd = new scala.util.Random(seed)
      val st = new Butterworth.State(cascade)
      val out = Array.fill(2000)(st.filter(rnd.nextDouble() * 2 - 1))
      // unit-gain lowpass of |x|<=1 noise stays well bounded if poles
      // are inside the unit circle
      out.forall(v => math.abs(v) < 100.0)
    }

  property("bandstop biquads all have poles inside the unit circle") =
    forAll(Gen.choose(1, 6), Gen.choose(20.0, 60.0)) { (order, fc) =>
      val cascade = Butterworth.bandStop(order, 250.0, fc, 4.0)
      cascade.biquads.forall { q =>
        // |a2| < 1 and |a1| < 1 + a2 — the stability triangle
        math.abs(q.a2) < 1.0 && math.abs(q.a1) < 1.0 + q.a2 + 1e-9
      }
    }

  // ------------------------------------------------------------- prewarm
  property("reflectedPrewarm always returns exactly padLength values") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-10.0, 10.0)), Gen.choose(1, 64)) { (data, pad) =>
      Butterworth.reflectedPrewarm(data.toArray, pad).length == pad
    }

  // ---------------------------------------------------- repetition stats
  private val wordsGen = for {
    n <- Gen.choose(1, 60)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "xyz"))
  } yield ws

  property("repetition_stats matches the brute-force gram model") = forAll(wordsGen) { ws =>
    val s = ws.mkString(" ")
    val row = graft.functions
      .RepetitionStats(
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(s, org.apache.spark.sql.types.StringType)
      )
      .eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val bigrams = ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toList
    row.getLong(0) == ws.length.toLong &&
    row.getLong(1) == ws.distinct.length.toLong &&
    row.getLong(2) == bigrams.length.toLong &&
    row.getLong(3) == bigrams.distinct.length.toLong &&
    row.getLong(4) == (if (bigrams.isEmpty) 0L
                       else bigrams.groupBy(identity).values.map(_.size).max.toLong)
  }
}
