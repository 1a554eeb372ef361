package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Half-grid straddle audit — turns cross-engine ROUND coin-flips into
  * deterministic red bars BEFORE a driver correctness run sees them.
  *
  * The residual risk of the rounding discipline (rounds 9-10 history:
  * ts_error_rate, ts_cadence, then the round-10 driver-red ts_mk /
  * cluster_nmi) is an output double that sits essentially ON the
  * ROUND half grid at the column's final scale: engines that round by
  * decimal-string (Spark's BigDecimal HALF_UP) and by multiplication
  * (DuckDB) can split such a value to different sides. A PROPERLY
  * 6-rounded (or integer/1e6-quotient) output lands on the grid —
  * scaled fractional part ≈ 0 — so anything found within `eps` of the
  * half grid is evidence that an unrounded (or deeper-scale) quantity
  * leaks into the output, exactly the class that produced the two
  * round-10 failures.
  *
  * Scale shape: the audit is one predicate-pushed scan per result —
  * a single OR filter over the double columns with a `limit` sample —
  * so auditing every verify dump adds one cheap job per query.
  */
object StraddleAudit {

  final case class Straddle(column: String, value: Double)

  /** True when `c` is a finite double within `eps` of the ROUND half
    * grid at `scale` — i.e. |c|·10^scale has fractional part within
    * eps·10^scale of 0.5. Magnitudes ≥ 1e9 are skipped (their scaled
    * image exceeds 2^52 and the fractional part is no longer
    * meaningful — nor roundable differently — at that magnitude).
    *
    * Values ON the 1e-9 grid are exempt: a declared ROUND(·, 9) output
    * (ts_hurst's rs columns, the transcendental-discipline columns) is
    * the SAME 9-rounded double in both engines — nothing ever rounds
    * it at 6, so sitting 1e-9 from the scale-6 half grid (k ≡ 500 mod
    * 1000 nano-units, 3/1000 of legitimate scale-9 values) carries no
    * cross-engine risk. The audit's target is the value with MORE
    * precision than the declared grids — a raw quotient — parked on
    * the half grid.
    */
  /** 2^52: above this, s9 = |v|·1e9 is always an exact integer double
    * and the grid-9 test degenerates to "always on grid" — the
    * exemption must not apply there, or the audit goes blind for
    * 4.5e6 < |v| < 1e9 where the scale-6 fraction is still meaningful.
    */
  private val Grid9Max = 4503599627370496.0

  def straddleCond(c: Column, scale: Int, eps: Double): Column =
    straddleCondAt(c, scale, eps, exemptGrid9 = true)

  /** The grid-9 exemption is for AUDITING OUTPUTS (declared round-9
    * columns legitimately sit 1e-9 from the scale-6 half grid). A
    * PRE-ROUND twin audit must not exempt it: the very value it hunts
    * — a raw quotient parked EXACTLY on the scale-6 half (…0000005) —
    * IS on the 1e-9 grid, which is precisely how a pre-round straddle
    * stays invisible to the output scan (it rounds onto the grid in
    * both engines, to possibly OPPOSITE sides).
    */
  private def straddleCondAt(c: Column, scale: Int, eps: Double, exemptGrid9: Boolean): Column = {
    val p = math.pow(10.0, scale)
    val s = abs(c) * lit(p)
    val f = s - floor(s)
    val s9 = abs(c) * lit(1e9)
    val onGrid9 =
      if (exemptGrid9) s9 < lit(Grid9Max) && abs(s9 - round(s9, 0)) < lit(0.01)
      else lit(false)
    c.isNotNull && !isnan(c) && abs(c) < lit(1e9) &&
      abs(f - lit(0.5)) < lit(eps * p) && !onGrid9
  }

  private def isStraddle(
    v: Double,
    scale: Int,
    eps: Double,
    exemptGrid9: Boolean = true
  ): Boolean = {
    val p = math.pow(10.0, scale)
    val s = math.abs(v) * p
    val s9 = math.abs(v) * 1e9
    val onGrid9 = exemptGrid9 && s9 < Grid9Max && math.abs(s9 - math.rint(s9)) < 0.01
    !v.isNaN && !v.isInfinite && math.abs(v) < 1e9 &&
    math.abs(s - math.floor(s) - 0.5) < eps * p && !onGrid9
  }

  /** Sample (up to `limit` rows) the values in `df`'s double columns
    * that sit within `eps` of the ROUND half grid at `scale`.
    */
  def audit(
    df: DataFrame,
    scale: Int = 6,
    eps: Double = 1e-9,
    limit: Int = 5
  ): Seq[Straddle] = {
    val dcols = df.schema.fields.filter(_.dataType == DoubleType).map(_.name).toSeq
    if (dcols.isEmpty) Nil
    else {
      val anyHit = dcols.map(n => straddleCond(col(n), scale, eps)).reduce(_ || _)
      df.filter(anyHit)
        .select(dcols.map(col): _*)
        .limit(limit)
        .collect()
        .toSeq
        .flatMap { r =>
          dcols.zipWithIndex.collect {
            case (n, i) if !r.isNullAt(i) && isStraddle(r.getDouble(i), scale, eps) =>
              Straddle(n, r.getDouble(i))
          }
        }
        .distinct
    }
  }

  /** Naming contract for pre-round twin frames: `<base>__s<k>` marks a
    * double column as the UNROUNDED twin of a final column that rounds
    * at scale k; columns without the suffix are ignored (grain keys).
    */
  private val TwinCol = "^(.*)__s([0-9])$".r

  /** Audit a PRE-ROUND twin frame (see [[graft.SparkEntry.preRoundTwins]]):
    * each `<base>__s<k>` double column is scanned for values essentially
    * ON the scale-k ROUND half grid — the class the OUTPUT scan is
    * structurally blind to, because a pre-round straddle rounds ONTO
    * the grid in both engines (possibly to opposite sides) before the
    * output audit ever sees it. No grid-9 exemption here (an exact
    * scale-6 half IS a grid-9 value), and the closeness tolerance is
    * 1e-3 of the half-grid spacing at each column's own scale.
    */
  def auditTwins(df: DataFrame, limit: Int = 5): Seq[Straddle] = {
    val twins = df.schema.fields.toSeq.collect {
      case f if f.dataType == DoubleType =>
        f.name match {
          case TwinCol(_, k) => Some(f.name -> k.toInt)
          case _ => None
        }
    }.flatten
    if (twins.isEmpty) Nil
    else {
      def epsFor(k: Int) = math.pow(10.0, -(k + 3))
      val anyHit = twins
        .map { case (n, k) => straddleCondAt(col(n), k, epsFor(k), exemptGrid9 = false) }
        .reduce(_ || _)
      df.filter(anyHit)
        .select(twins.map { case (n, _) => col(n) }: _*)
        .limit(limit)
        .collect()
        .toSeq
        .flatMap { r =>
          twins.zipWithIndex.collect {
            case ((n, k), i)
                if !r.isNullAt(i) &&
                  isStraddle(r.getDouble(i), k, epsFor(k), exemptGrid9 = false) =>
              Straddle(n, r.getDouble(i))
          }
        }
        .distinct
    }
  }
}
