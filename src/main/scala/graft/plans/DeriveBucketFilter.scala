package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: derive partition-key predicates from time
  * predicates on the partitioned ts layout (graft.sources.TsLayout).
  *
  * The layout stores p_bucket = t / bucketUs as a partition directory
  * key. A user querying `t >= a AND t < b` doesn't mention p_bucket,
  * so the scan would list every partition; this rule conjoins the
  * implied `p_bucket >= a/bucketUs AND p_bucket <= (b-1)/bucketUs`,
  * which Spark then turns into partition pruning — the automatic
  * version of the reference's Postgres range-index lookup.
  *
  * Correctness: for non-negative t and bucketUs > 0, t >= a implies
  * t/bucketUs >= floor(a/bucketUs) (floor is monotone) and t < b
  * implies t/bucketUs <= floor((b-1)/bucketUs), so the added
  * predicates never reject a row the original filter accepts — they
  * only prune partitions that cannot contain matches.
  *
  * The bucket width is resolved PER RELATION: every layout written by
  * [[graft.sources.TsLayout.write]] carries its width in a
  * `_graft_bucket_us` marker, and the rule reads the marker of the
  * scan under each filter (cached lookup), so one session can mix
  * layouts of different widths and each prunes with its own. The
  * session conf `spark.graft.ts.bucketUs` is only a fallback for
  * markerless layouts; with neither marker nor conf the rule is a
  * NO-OP, because deriving bounds with a wrong width silently drops
  * matching rows (and if the scan's marker and other scanned markers
  * conflict within one filter's subtree, the rule also declines). The
  * rule fires only on plans that expose BOTH a long column `t` and a
  * long partition column `p_bucket`, and is idempotent (skips filters
  * that already constrain p_bucket).
  */
case class DeriveBucketFilter() extends Rule[LogicalPlan] {

  private val BucketConfKey = "spark.graft.ts.bucketUs"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val confWidth =
      try Option(conf.getConfString(BucketConfKey, null)).map(_.toLong).filter(_ > 0)
      catch { case _: NumberFormatException => None }

    plan.transform {
      case f @ Filter(cond, child) =>
        val tAttr = child.output.find(a => a.name == "t" && a.dataType == LongType)
        // partition directory values are type-inferred on read, so the
        // bucket column may come back as int
        val bAttr = child.output.find(a =>
          a.name == "p_bucket" && (a.dataType == LongType || a.dataType == IntegerType)
        )
        (tAttr, bAttr, widthFor(child, confWidth)) match {
          case (Some(t), Some(b), Some(bucketUs)) if !mentions(cond, b) =>
            val derived = deriveBounds(cond, t, b, bucketUs)
            if (derived.isEmpty) f
            else Filter(derived.foldLeft(cond)(And), child)
          case _ => f
        }
    }
  }

  /** The width the filtered relation was written with: the marker of
    * the file scan(s) under the filter when they agree, else the
    * session conf, else None (rule declines). Marker lookups go through
    * [[graft.sources.TsLayout.markerWidth]]'s cache, so this is a map
    * probe on every optimization after the first.
    */
  private def widthFor(child: LogicalPlan, confWidth: Option[Long]): Option[Long] = {
    val markerWidths = child
      .collectLeaves()
      .flatMap {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.map(p =>
            graft.sources.TsLayout
              .markerWidth(p.toString, fs.sparkSession.sessionState.newHadoopConf())
          )
        case _ => Seq.empty
      }
      .flatten
      .distinct
    markerWidths match {
      case Seq(w) => Some(w)
      case Seq() => confWidth
      case _ => None // conflicting widths under one filter — refuse to guess
    }
  }

  private def mentions(e: Expression, a: Attribute): Boolean =
    e.references.contains(a)

  /** Collect t-bounds from top-level conjuncts and translate each into
    * a p_bucket bound.
    */
  private def deriveBounds(
    cond: Expression,
    t: Attribute,
    bucket: Attribute,
    bucketUs: Long
  ): Seq[Expression] = {
    def lit(v: Long): Literal =
      if (bucket.dataType == IntegerType) Literal(v.toInt) else Literal(v)
    splitConjuncts(cond).flatMap {
      case GreaterThanOrEqual(a, Literal(v: Long, LongType)) if a.semanticEquals(t) =>
        Some(GreaterThanOrEqual(bucket, lit(Math.floorDiv(v, bucketUs))))
      case GreaterThan(a, Literal(v: Long, LongType)) if a.semanticEquals(t) =>
        Some(GreaterThanOrEqual(bucket, lit(Math.floorDiv(v + 1, bucketUs))))
      case LessThan(a, Literal(v: Long, LongType)) if a.semanticEquals(t) =>
        Some(LessThanOrEqual(bucket, lit(Math.floorDiv(v - 1, bucketUs))))
      case LessThanOrEqual(a, Literal(v: Long, LongType)) if a.semanticEquals(t) =>
        Some(LessThanOrEqual(bucket, lit(Math.floorDiv(v, bucketUs))))
      case EqualTo(a, Literal(v: Long, LongType)) if a.semanticEquals(t) =>
        Some(EqualTo(bucket, lit(Math.floorDiv(v, bucketUs))))
      case _ => None
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
