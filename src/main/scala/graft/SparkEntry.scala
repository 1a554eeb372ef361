package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2/§7. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _),
    "q2_join" -> (Relational.q2Join _),
    "q3_topk" -> (Relational.q3TopK _),
    "q4_window" -> (Relational.q4Window _),
    "q5_semi" -> (Relational.q5Semi _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1Sql,
    "q2_join" -> Relational.q2Sql,
    "q3_topk" -> Relational.q3Sql,
    "q4_window" -> Relational.q4Sql,
    "q5_semi" -> Relational.q5Sql
  )
}
