package graft.streaming

import java.math.RoundingMode

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Online Population Stability Index monitor — the streaming twin of
  * the batch [[graft.operators.Timeseries.psiScreen]]: the reference
  * profile (bin range + reference proportions, fitted offline on a
  * baseline window) broadcasts as a literal, each arrival increments
  * its bin count, and every micro-batch snapshots
  * PSI = Σ (p₂−p₁)·round9 ln(p₂/p₁) of the live distribution against
  * the reference — the model-monitoring "input drift" alarm.
  *
  * Equivalence discipline: binning, the 1e-4 clamp, the round-9 ln,
  * per-term round-9 and the DECIMAL-routed term sum mirror the batch
  * operator exactly (scale-10 HALF_UP BigDecimal at the same points),
  * so a monitor fed a channel's second half against its first-half
  * profile reports the BATCH psiScreen value bit-for-bit (spec).
  * Counts are additive, so snapshots are carving-invariant trivially.
  *
  * Scale shape: ONE stateful exchange on channel; state is `bins`
  * longs per channel regardless of stream length.
  */
object StreamingPsi {

  /** Per-channel reference: (amin, amax, reference proportions). */
  case class Reference(amin: Double, amax: Double, p: Seq[Double])

  case class PsiState(counts: Vector[Long])

  case class PsiUpdate(channel: String, n: Long, psi: Double, drifted: Boolean)

  private def dec10(d: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(d).setScale(10, RoundingMode.HALF_UP))

  private def rnd(d: Double, s: Int): Double =
    BigDecimal(java.math.BigDecimal.valueOf(d).setScale(s, RoundingMode.HALF_UP)).toDouble

  private[graft] def bin(v: Double, ref: Reference, bins: Int): Int =
    if (!(ref.amax > ref.amin)) 0
    else math.max(math.min(math.floor((v - ref.amin) / (ref.amax - ref.amin) * bins).toLong, (bins - 1).toLong), 0L).toInt

  private def psiOf(counts: Vector[Long], ref: Reference, eps: Double): (Long, Double) = {
    val n = counts.sum
    if (n == 0L) (0L, 0.0)
    else {
      var acc = BigDecimal(0)
      counts.indices.foreach { i =>
        val p2 = math.max(counts(i).toDouble / n.toDouble, eps)
        val p1 = math.max(ref.p(i), eps)
        acc += dec10(rnd((p2 - p1) * rnd(math.log(p2 / p1), 9), 9))
      }
      (n, rnd(acc.toDouble, 6))
    }
  }

  def monitor(
    spark: SparkSession,
    input: DataFrame, // (channel string, t long µs, v double)
    refs: Map[String, Reference],
    bins: Int = 8,
    eps: Double = 1e-4,
    threshold: Double = 0.1
  ): Dataset[PsiUpdate] = {
    import spark.implicits._
    input
      .select(col("channel"), col("t").cast("long"), col("v").cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[PsiState, PsiUpdate](GroupStateTimeout.NoTimeout) {
        case (channel, rows, state: GroupState[PsiState]) =>
          var counts = state.getOption.map(_.counts).getOrElse(Vector.fill(bins)(0L))
          refs.get(channel) match {
            case Some(ref) =>
              rows.foreach { case (_, _, v) =>
                val b = bin(v, ref, bins)
                counts = counts.updated(b, counts(b) + 1L)
              }
              state.update(PsiState(counts))
              val (n, psi) = psiOf(counts, ref, eps)
              PsiUpdate(channel, n, psi, psi > threshold)
            case None =>
              // un-profiled channel: count arrivals, report no score
              val n = counts.head + rows.size
              counts = counts.updated(0, n)
              state.update(PsiState(counts))
              PsiUpdate(channel, n, Double.NaN, drifted = false)
          }
      }
  }
}
