package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{Exchange, ShuffleExchangeExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.{SortExec, GenerateExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** Dev audit: a GLOBAL Sort's range exchange samples its child to pick
  * partition boundaries, executing the child subtree a SECOND time down
  * to the nearest materialization (shuffle stage or cached relation).
  * When that segment contains heavy operators (windows, joins,
  * generates), the query pays the segment twice (measured: 2.4 s vs
  * 0.95 s on ts_matrix_profile at sf0.1). This sweep prints, for every
  * registry query whose root is Sort(global) <- ShuffleExchange(range),
  * the operators in the resampled segment — the candidates for a
  * persist() pin or restructure.
  */
object SortTailAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"

    def segment(p: SparkPlan): Seq[String] = p match {
      case _: Exchange | _: InMemoryTableScanExec => Nil
      case w: WindowExec => s"Window(${w.windowExpression.size})" +: w.children.flatMap(segment)
      case g: GenerateExec => "Generate" +: g.children.flatMap(segment)
      case j: BroadcastHashJoinExec => "BHJ" +: segment(j.left) // broadcast side is materialized
      case j: ShuffledHashJoinExec => "SHJ" +: j.children.flatMap(segment)
      case j: SortMergeJoinExec => "SMJ" +: j.children.flatMap(segment)
      case o => o.children.flatMap(segment)
    }

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val root = fn(spark, dir).queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        root match {
          case s: SortExec if s.global =>
            // the resampled segment is the RANGE EXCHANGE's child: the
            // boundary sampler runs on it before the shuffle writes
            val seg = s.child match {
              case e: ShuffleExchangeExec => segment(e.child)
              case c => segment(c)
            }
            if (seg.nonEmpty) println(s"[sorttail] $name: ${seg.mkString(", ")}")
          case _ => ()
        }
      } catch { case e: Throwable => println(s"[sorttail] $name: ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
