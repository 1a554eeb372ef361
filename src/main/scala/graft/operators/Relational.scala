package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational coverage (SURVEY.md §2 "Core relational engine").
  *
  * Conventions shared with the DuckDB oracle (driver hash-compares):
  *  - money/quantity sums go through DECIMAL so both engines do exact
  *    arithmetic (double sums are order-dependent across engines);
  *  - averages of small-magnitude values are round(...,6) doubles;
  *  - every result carries a total ORDER BY.
  *
  * Scale notes: groupBy aggregates here are algebraic ⇒ Catalyst plans
  * partial (map-side) aggregation before the single shuffle; dimension
  * tables (nation/region/customer) are broadcast, so q2/q5 shuffle only
  * the fact side.
  */
object Relational {
  private val d204 = DecimalType(20, 4)
  private val d184 = DecimalType(18, 4)
  private val d2710 = DecimalType(27, 10)

  /** Order-independent average (exact decimal sum, then one double
    * division) — plain avg() of doubles depends on partial-aggregation
    * order and can flip a round(...,6) boundary vs the oracle.
    */
  private def detAvg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(d2710)).cast("double") / count(lit(1))

  /** TPC-H Q1-style pricing summary: scan → filter (pushed down) →
    * partial agg → final agg.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // Exact decimal sums internally; final cast to DOUBLE so both engines
        // derive the double from the same exact decimal (hash-stable across
        // DuckDB/pyarrow decimal representations). Product factors pinned to
        // DECIMAL(18,4) so the (37,8) product needs no engine-dependent
        // precision-overflow rescale.
        sum(col("l_quantity").cast(d204)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(d204)).cast("double").as("sum_base_price"),
        // scale-8 product sum is rounded (HALF_UP, both engines) to
        // scale 4 BEFORE the double cast: at scale 8 the unscaled value
        // exceeds 2⁵³ and DuckDB's hugeint→double→÷10⁸ double-rounds,
        // drifting 1 ulp from the correctly-rounded decimal→double.
        // VALIDITY BOUND: scale-4 unscaled values re-cross 2⁵³ when a
        // group's sum exceeds ~9·10¹¹ (sf ≳ 15 for q1's 4 groups) —
        // oracle comparisons beyond that need the rescale lowered to
        // scale 2 or a decimal-string compare; Spark's own result stays
        // correctly rounded at any scale
        round(
          sum(col("l_extendedprice").cast(d184) * (lit(1).cast(d184) - col("l_discount").cast(d184))),
          4
        ).cast("double").as("sum_disc_price"),
        round(detAvg(col("l_quantity")), 6).as("avg_qty"),
        round(detAvg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_disc_price,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6-style revenue forecast: the pure filter-and-sum shape —
    * every predicate (date range, discount band, quantity cap) pushes
    * to the parquet scan, and the single global aggregate is one
    * partial-agg reduction with no grouping shuffle at all. The
    * product sum uses q1's decimal discipline.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24
      )
      .agg(
        round(sum(col("l_extendedprice").cast(d184) * col("l_discount").cast(d184)), 4)
          .cast("double")
          .as("revenue"),
        count(lit(1)).as("n_rows")
      )

  val q6Sql: String =
    """SELECT
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Multi-way join: fact (orders) joined to broadcast dimensions.
    * nation/region/customer are tiny relative to orders ⇒ explicit
    * broadcast keeps this a single-stage, shuffle-free join chain on
    * the fact side.
    */
  def q2Join(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("order_count"),
        sum(col("o_totalprice").cast(d204)).cast("double").as("total_price")
      )
      .orderBy(col("r_name"), col("n_name"))
  }

  val q2Sql: String =
    """SELECT r_name, n_name, COUNT(*) AS order_count,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total_price
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Top-k by aggregated revenue: Catalyst plans TakeOrderedAndProject
    * after the aggregate — no global sort of the full result.
    */
  def q3TopK(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        // Rank on the exact decimal (engine-stable ordering), emit DOUBLE.
        sum(col("l_extendedprice").cast(d184) * (lit(1).cast(d184) - col("l_discount").cast(d184)))
          .as("revenue_dec")
      )
      .orderBy(col("revenue_dec").desc, col("l_orderkey"))
      .limit(10)
      // same scale-4 rescale as q1's sum_disc_price before the double
      // cast; the final output re-sorts on the PROJECTED (double, key)
      // columns so row order is contractual on both engines rather than
      // relying on order preservation through the projection
      .select(col("l_orderkey"), round(col("revenue_dec"), 4).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))

  val q3Sql: String =
    """SELECT l_orderkey, CAST(ROUND(revenue_dec, 4) AS DOUBLE) AS revenue FROM (
      |  SELECT l_orderkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS revenue_dec
      |  FROM lineitem
      |  GROUP BY l_orderkey
      |  ORDER BY revenue_dec DESC, l_orderkey
      |  LIMIT 10) t
      |ORDER BY revenue DESC, l_orderkey""".stripMargin

  /** Window functions: rank orders by price within customer; single
    * shuffle on the partition key.
    */
  def q4Window(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_totalprice"),
        row_number().over(w).cast("long").as("rnk")
      )
      .filter(col("rnk") <= 3)
      .orderBy(col("o_custkey"), col("rnk"))
  }

  val q4Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) t
      |WHERE rnk <= 3
      |ORDER BY o_custkey, rnk""".stripMargin

  /** Left-semi join: orders that have at least one high-value line.
    * Semi-join avoids materializing the join product; the lineitem
    * filter pushes to the scan.
    */
  def q5Semi(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val bigLines = Tables
      .lineitem(spark, dir)
      .filter(col("l_extendedprice") > 50000.0)
      .select(col("l_orderkey"))
    o.join(bigLines, o("o_orderkey") === bigLines("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  val q5Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_extendedprice > 50000.0)
      |ORDER BY o_orderkey""".stripMargin

  /** TPC-H Q7-shaped shipping volume: revenue between every ordered
    * (supplier nation, customer nation) pair per ship year — the
    * deepest join chain in the relational set (lineitem ⋈ supplier ⋈
    * orders ⋈ customer ⋈ nation ⋈ nation). Only the genuinely
    * constant-size sides (the 25-row nation table, twice) carry
    * broadcast HINTS; supplier/orders/customer are left to
    * Catalyst/AQE — at test scale they broadcast, at 100 TB the
    * lineitem⋈orders fact-fact join correctly shuffles on orderkey
    * (or runs exchange-free over co-bucketed tables, the
    * BucketedLayout pattern) rather than pretending an orders
    * broadcast survives. Revenue follows q1's exact-decimal
    * discipline.
    */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n1 = Tables.nation(spark, dir).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    l.join(s, l("l_suppkey") === s("s_suppkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(
          sum(col("l_extendedprice").cast(d184) * (lit(1).cast(d184) - col("l_discount").cast(d184))),
          4
        ).cast("double").as("revenue")
      )
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8-shaped national market share: within one region's
    * customer base and one part type, the share of yearly revenue
    * supplied by a single nation. The classic star-join + conditional
    * aggregation probe.
    *
    * Scale shape: the fact table joins each dimension on its own key
    * (no fact-fact join); the part-type and region filters push into
    * the dimension scans and shrink the fact stream before any wide
    * exchange; nation/region dims broadcast explicitly; the final
    * aggregate is year-cardinality. The share divides two exact
    * DECIMAL sums once, so the double is deterministic.
    */
  def q8Market(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).filter(col("p_type") === "ECONOMY")
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val vol = col("l_extendedprice").cast(d184) * (lit(1).cast(d184) - col("l_discount").cast(d184))
    l.join(p, l("l_partkey") === p("p_partkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(r), col("c_rk") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(
          sum(when(col("supp_nation") === "NATION_2", vol).otherwise(lit(0).cast(d184)))
            .cast("double") /
            sum(vol).cast("double"),
          6
        ).as("mkt_share"),
        round(sum(vol), 4).cast("double").as("revenue")
      )
      .orderBy(col("o_year"))
  }

  val q8Sql: String =
    """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year, COUNT(*) AS n_lines,
      |  ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_2'
      |                      THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
      |                           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
      |                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
      |        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |                 (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
      |        6) AS mkt_share,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |                 (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
      |GROUP BY 1
      |ORDER BY o_year""".stripMargin

  /** TPC-H Q10-shaped returned-item report: the top customers by
    * revenue lost to returns — filter the fact on the return flag,
    * attribute revenue to the ordering customer, decorate with the
    * customer dimension, rank.
    *
    * Scale shape: revenue is aggregated to customer grain BEFORE any
    * dimension join — the lineitem ⋈ orders fact-fact join shuffles
    * once on orderkey (or runs exchange-free over co-bucketed
    * tables), then the customer join sees a customer-cardinality
    * aggregate instead of the raw line stream, and nation broadcasts.
    * The grouping keys the ANSI oracle carries (name, acctbal,
    * nation) are functionally dependent on c_custkey, so pre-agg ≡
    * join-then-group row for row. Top-k is TakeOrderedAndProject —
    * no global sort materializes. Revenue follows q1's exact-decimal
    * discipline; the rank tie-breaks on c_custkey.
    */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("__nk"), col("n_name"))
    val vol = col("l_extendedprice").cast(d184) * (lit(1).cast(d184) - col("l_discount").cast(d184))
    val rev = l
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_lines"), sum(vol).as("__rev"))
    rev
      .join(c, rev("o_custkey") === c("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("__nk"))
      .select(
        col("c_custkey"),
        col("c_name"),
        col("n_name").as("nation"),
        col("c_acctbal"),
        col("n_lines"),
        round(col("__rev"), 4).cast("double").as("revenue")
      )
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, n_name AS nation, c_acctbal, COUNT(*) AS n_lines,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |                 (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name, c_acctbal
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  val q7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(YEAR(l_shipdate) AS BIGINT) AS l_year, COUNT(*) AS n_lines,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |                 (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q18-shape "large order" report: orders whose total lineitem
    * quantity exceeds a threshold, joined back to order + customer
    * detail. (Reference analog: the retrieval-cap screen in
    * query/TimeSeriesQueryUtils.scala:362-369 — flag the requests whose
    * total volume crosses a limit, then report who issued them.)
    *
    * Scale shape: the HAVING aggregate reduces the line stream to
    * order cardinality BEFORE any wide join — the filter keeps only
    * threshold-crossers, so the join-back sees a tiny key set (AQE
    * turns it into a broadcast probe of orders/customer at real
    * selectivity). Quantity sums route through decimal; top-k is
    * TakeOrderedAndProject.
    */
  def q18Big(spark: SparkSession, dir: String, minQty: Double = 250.0): DataFrame = {
    val big = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(d184)).as("__qty"), count(lit(1)).as("n_lines"))
      .filter(col("__qty") > lit(minQty).cast(d184))
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    big
      .join(o, big("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(
        col("c_custkey"),
        col("c_name"),
        col("o_orderkey"),
        col("o_orderdate"),
        col("o_totalprice"),
        col("n_lines"),
        col("__qty").cast("double").as("total_qty")
      )
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(50)
  }

  val q18Sql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      |  COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      |HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 50""".stripMargin

  /** TPC-H Q12-shaped shipping-delay report (this schema carries no
    * l_shipmode, so the Q12 grouping key is the ship-delay band —
    * FLOOR((l_shipdate − o_orderdate) / 365d)): per band, how many
    * lines belong to urgent orders (priority 1/2) vs the rest.
    *
    * Scale shape: ONE fact-fact shuffle (lineitem ⋈ orders on
    * orderkey, or exchange-free over co-bucketed layouts); the
    * conditional counts are algebraic, so the per-band rollup is a
    * map-side partial agg over the join output — the band key is
    * ~14-ary, far below partition cardinality, and partial agg
    * collapses each task's output to band-count rows before the
    * final 14-row exchange.
    */
  def q12Priority(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("__ok"), col("o_orderpriority"), col("o_orderdate"))
    val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, col("l_orderkey") === col("__ok"))
      .withColumn(
        "delay_band",
        floor(datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")) / lit(365.0))
          .cast("long")
      )
      .groupBy(col("delay_band"))
      .agg(
        sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(urgent, 0L).otherwise(1L)).as("low_line_count")
      )
      .orderBy(col("delay_band"))
  }

  val q12Sql: String =
    """SELECT CAST(FLOOR(DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) / 365.0) AS BIGINT) AS delay_band,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1
      |ORDER BY delay_band""".stripMargin

  /** TPC-H Q14-shaped promo-revenue share: over one ship-year, the
    * fraction of discounted revenue coming from PROMO-type parts.
    *
    * Scale shape: the shipdate range predicate pushes to the lineitem
    * scan (PushedFilters), so only the window's lines reach the
    * partkey join; part is the smaller relation and broadcastable at
    * bench SFs (AQE picks broadcast from real sizes — at 100 TB both
    * sides shuffle once on partkey, or run exchange-free when
    * co-bucketed). The final agg is global (no grouping key): one
    * partial-agg reduction, no grouping shuffle. Decimal discipline
    * as q1; the share divides two exact decimal sums as doubles.
    */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables
      .lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp")
      )
    val p = Tables.part(spark, dir).select(col("p_partkey").as("__pk"), col("p_type"))
    val vol = col("l_extendedprice").cast(d184) * (lit(1).cast(d184) - col("l_discount").cast(d184))
    l.join(p, col("l_partkey") === col("__pk"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(
          lit(100.0) *
            sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0).cast(d184))).cast("double") /
            sum(vol).cast("double"),
          6
        ).as("promo_share"),
        round(sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0).cast(d184))), 4)
          .cast("double")
          .as("promo_revenue")
      )
  }

  val q14Sql: String =
    """SELECT COUNT(*) AS n_lines,
      |  ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |                      THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
      |                           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
      |                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
      |        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |                 (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
      |        6) AS promo_share,
      |  CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
      |                 THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
      |                      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
      |                 ELSE CAST(0 AS DECIMAL(18,4)) END), 4) AS DOUBLE) AS promo_revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'""".stripMargin

  /** TPC-H Q19-shaped disjunctive-band revenue: three OR'd
    * (brand, size-band, quantity-band) predicates — the classic
    * "join with a disjunction that can't become a join key" shape.
    *
    * Scale shape: the predicate's part-only conjuncts (brand ∈ {…},
    * size range) are OR-factored by Catalyst into a pushable
    * part-scan filter, and the quantity bound (l_quantity < 50 covers
    * all three arms) pushes to the lineitem scan — both scans prune
    * before the partkey equi-join; only the residual mixed
    * disjunction evaluates on joined rows. The global agg is one
    * partial-agg reduction with no grouping shuffle.
    */
  def q19Bands(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
      .select(col("p_partkey").as("__pk"), col("p_brand"), col("p_size"))
    val vol = col("l_extendedprice").cast(d184) * (lit(1).cast(d184) - col("l_discount").cast(d184))
    val bands =
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#22" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 35)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 50))
    l.join(p, col("l_partkey") === col("__pk"))
      .filter(bands)
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(vol), 4).cast("double").as("revenue")
      )
  }

  val q19Sql: String =
    """SELECT COUNT(*) AS n_lines,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |                 (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
      |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  /** TPC-H Q16-shaped supplier-variety report: per (brand, type,
    * size-band), how many DISTINCT suppliers ship the part — the
    * canonical distinct-aggregate shape, missing from the suite until
    * now.
    *
    * Scale shape: Catalyst plans COUNT(DISTINCT) group-by as the
    * two-phase distinct expansion — partial dedup on
    * (group key, l_suppkey) BEFORE the exchange, so the shuffle
    * carries the deduped key pairs, not the raw line stream, then a
    * second partial/final count over the deduped set. The part-side
    * predicates prune the part scan before its partkey join; top-k is
    * TakeOrderedAndProject.
    */
  def q16Counts(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_suppkey"))
    val p = Tables.part(spark, dir)
      .filter(col("p_type") =!= "PROMO" && col("p_size") <= 25)
      .select(col("p_partkey").as("__pk"), col("p_brand"), col("p_type"), col("p_size"))
    l.join(p, col("l_partkey") === col("__pk"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"), count(lit(1)).as("n_lines"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      .limit(100)
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt, COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_type <> 'PROMO' AND p_size <= 25
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
      |LIMIT 100""".stripMargin

  /** TPC-H Q22-shaped dormant-customer report: per nation, the
    * above-average-balance customers with no URGENT order — the
    * canonical ANTI-join + uncorrelated scalar subquery shape (this
    * schema has no phone column, so the Q22 country-code key is the
    * nation dimension; and because this generator gives every customer
    * at least one order, the dormancy predicate is "no 1-URGENT
    * order" rather than "no order", keeping the anti-join
    * non-degenerate).
    *
    * Scale shape: the scalar average is a one-row aggregate
    * cross-joined (broadcast) onto the customer scan — evaluated once,
    * not per row; the "never ordered" predicate is LeftAnti against
    * the orders custkey projection, which Catalyst executes as a
    * shuffled/broadcast anti-join on the 8-byte key rather than a
    * per-row NOT EXISTS probe; nation broadcasts; the rollup is
    * nation-cardinality with map-side partial aggregation.
    * Portability: the avg threshold and the balance sum both route
    * through exact DECIMAL; the filter compares against the identical
    * unrounded double in both engines.
    */
  def q22Anti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("__nk"), col("n_name"))
    val avgBal = c
      .filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast(d2710)).cast("double") / count(lit(1))).as("__avg_bal"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("__avg_bal"))
      .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .join(broadcast(n), col("c_nationkey") === col("__nk"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal").cast(d184)), 4).cast("double").as("total_bal")
      )
      .orderBy(col("nation"))
  }

  /** TPC-H Q13-shaped order-count distribution: how many customers
    * placed k orders, for every k (including 0 — the LEFT join keeps
    * order-less customers) — the histogram-of-an-aggregate shape.
    * (No order-comment column in this schema; the Q13 exclusion
    * filter becomes "ignore unprioritized orders".)
    *
    * Scale shape: one custkey-keyed outer-join shuffle (conditional
    * counting of the order side), partial-aggregated to customer
    * grain; the second rollup runs at distinct-count cardinality
    * (~tens of rows). All-integer outputs — no float discipline.
    */
  def q13Dist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_custkey"), col("o_orderkey"))
    val perCust = c
      .join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |    AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY c_custkey) cc
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15-shaped top supplier: revenue per supplier over one
    * ship-quarter, then the supplier(s) achieving the maximum — the
    * aggregate-vs-its-own-max shape (Q15's revenue view + scalar
    * subquery).
    *
    * Scale shape: revenue reduces the window's lines to supplier
    * cardinality in one partial-agg shuffle (the pushed date range
    * prunes the scan); the max is a 1-row aggregate over that summary
    * broadcast back as an equality filter — no second pass over the
    * fact. The equality compares EXACT decimal sums (never rounded
    * doubles), so ties are exact in both engines; output rounds at
    * the end.
    */
  def q15Top(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables
      .lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp")
      )
    val vol = col("l_extendedprice").cast(d184) * (lit(1).cast(d184) - col("l_discount").cast(d184))
    val rev = l.groupBy(col("l_suppkey")).agg(sum(vol).as("__rev"), count(lit(1)).as("n_lines"))
    val mx = rev.agg(max(col("__rev")).as("__mx"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    rev
      .crossJoin(broadcast(mx))
      .filter(col("__rev") === col("__mx"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .select(
        col("s_suppkey"),
        col("s_name"),
        col("n_lines"),
        round(col("__rev"), 4).cast("double").as("total_revenue")
      )
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |        (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS r,
      |    COUNT(*) AS n_lines
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, n_lines,
      |  CAST(ROUND(r, 4) AS DOUBLE) AS total_revenue
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE r = (SELECT MAX(r) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17-shaped small-quantity revenue: for one brand, the
    * revenue locked in orders whose quantity is under 20% of the
    * part's own average — the correlated-aggregate shape, decorrelated
    * into a per-part average relation joined back to the fact.
    *
    * Scale shape: the per-part averages aggregate the FULL line
    * stream at partkey cardinality (one partial-agg shuffle — the
    * correlated subquery never re-executes per row), the brand filter
    * prunes the part scan before its join, and the threshold filter
    * is a projection over the co-keyed (partkey) join. The average is
    * exact-decimal-sum / count (identical double both engines) and the
    * 0.2 multiplier applies in one pinned order.
    */
  def q17Small(spark: SparkSession, dir: String, brand: String = "Brand#13"): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val avgQ = l
      .groupBy(col("l_partkey").as("__apk"))
      .agg((sum(col("l_quantity").cast(d2710)).cast("double") / count(lit(1))).as("__avg_qty"))
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === brand)
      .select(col("p_partkey").as("__pk"))
    l.join(p, col("l_partkey") === col("__pk"))
      .join(avgQ, col("l_partkey") === col("__apk"))
      .filter(col("l_quantity") < lit(0.2) * col("__avg_qty"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice").cast(d184)) / lit(7.0).cast(d184), 4)
          .cast("double")
          .as("avg_yearly")
      )
  }

  val q17Sql: String =
    """WITH aq AS (
      |  SELECT l_partkey AS apk,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT COUNT(*) AS n_lines,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) / CAST(7.0 AS DECIMAL(18,4)), 4) AS DOUBLE) AS avg_yearly
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN aq ON l_partkey = apk
      |WHERE p_brand = 'Brand#13' AND l_quantity < 0.2 * avg_qty""".stripMargin

  val q22Sql: String =
    """WITH ab AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS avg_bal
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT n_name AS nation, COUNT(*) AS n_cust,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_bal
      |FROM customer
      |CROSS JOIN ab
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > ab.avg_bal
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY n_name
      |ORDER BY nation""".stripMargin

  /** TPC-H Q9-shaped product-type profit: revenue from lines of parts
    * matching a name pattern, rolled up by supplier nation × ship
    * year. (This schema has no partsupp/supplycost, so "profit" is
    * the discounted revenue — Q9's join topology and rollup grain are
    * preserved: fact × part-filter × supplier × nation, grouped by
    * (nation, year).)
    *
    * Scale shape: the filtered part list, supplier, and nation all
    * broadcast — the fact stream never shuffles for the joins and is
    * cut by the part semi-probe before any aggregation; the single
    * shuffle is the (nation, year) partial agg at rollup
    * cardinality (~25 × ~7 groups). Decimal discipline as q1.
    */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey").as("__pk"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("__sk"), col("s_nationkey").as("__snk"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("__nk"), col("n_name"))
    val amount = col("l_extendedprice").cast(d184) *
      (lit(1).cast(d184) - col("l_discount").cast(d184))
    l.join(broadcast(p), col("l_partkey") === col("__pk"))
      .join(broadcast(s), col("l_suppkey") === col("__sk"))
      .join(broadcast(n), col("__snk") === col("__nk"))
      .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).cast("long").as("o_year"))
      .agg(
        round(sum(amount), 4).cast("double").as("sum_profit"),
        count(lit(1)).as("n_lines")
      )
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Sql: String =
    """SELECT n_name AS nation,
      |  CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS o_year,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |       (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_profit,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2
      |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q11-shaped important-stock scan: parts whose total line
    * value exceeds 1.5× the MEAN part value — the
    * aggregate-vs-scalar-subquery (HAVING against a global total)
    * shape. (No partsupp here; "value" is the part's discounted line
    * revenue. Q11's fixed fraction is itself rescaled by 1/SF in the
    * spec; a mean-relative cut keeps the query non-degenerate at
    * every scale factor without a tuning knob.)
    *
    * Scale shape: ONE partkey-grain partial-agg shuffle produces the
    * per-part relation; the global (total, count) re-aggregates that
    * summary (part cardinality, not line cardinality) into one row
    * broadcast back as a filter. The threshold compares EXACT
    * decimals (value·2·n > 3·total — integer multipliers, no double
    * boundary), so the cut is hash-stable in both engines.
    */
  def q11PartValue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val vol = col("l_extendedprice").cast(d184) *
      (lit(1).cast(d184) - col("l_discount").cast(d184))
    val pv = l.groupBy(col("l_partkey")).agg(sum(vol).as("__val"))
    val tot = pv.agg(sum(col("__val")).as("__tot"), count(lit(1)).as("__n"))
    pv.crossJoin(broadcast(tot))
      .filter(col("__val") * lit(2) * col("__n") > col("__tot") * lit(3))
      .select(
        col("l_partkey").as("p_partkey"),
        round(col("__val"), 4).cast("double").as("part_value")
      )
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  val q11Sql: String =
    """WITH pv AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |        (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS v
      |  FROM lineitem GROUP BY 1)
      |SELECT l_partkey AS p_partkey, CAST(ROUND(v, 4) AS DOUBLE) AS part_value
      |FROM pv
      |WHERE v * 2 * (SELECT COUNT(*) FROM pv) > (SELECT SUM(v) FROM pv) * 3
      |ORDER BY part_value DESC, p_partkey""".stripMargin

  /** TPC-H Q20-shaped dominant suppliers: suppliers who shipped MORE
    * THAN HALF of some name-filtered part's total 1996 volume — the
    * nested-aggregate-subquery shape (Q20's availqty > ½·shipped
    * becomes shipped_by_supplier > ½·shipped_total on this schema).
    *
    * Scale shape: the 1996 date range and the broadcast part probe
    * prune the fact scan FIRST; both aggregates then run over the
    * pruned stream — (part, supplier) grain and part grain — and
    * their join is at summary cardinality on the co-keyed partkey.
    * The half-share test multiplies exact decimals by 2 (no double
    * boundary); the output rollup is supplier-cardinality.
    */
  def q20Potential(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey").as("__pk"))
    val l96 = Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp")
      )
      .join(broadcast(p), col("l_partkey") === col("__pk"))
    val perPS = l96
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast(d204)).as("__sq"))
    val perP = l96
      .groupBy(col("l_partkey").as("__tpk"))
      .agg(sum(col("l_quantity").cast(d204)).as("__tq"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"))
    perPS
      .join(perP, col("l_partkey") === col("__tpk"))
      .filter(col("__sq") * lit(2) > col("__tq"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_parts"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_parts"))
      .orderBy(col("n_parts").desc, col("s_suppkey"))
  }

  val q20Sql: String =
    """WITH l96 AS (
      |  SELECT l_partkey, l_suppkey, l_quantity
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |    AND p_name LIKE '%red%'),
      |ps AS (
      |  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(20,4))) AS sq
      |  FROM l96 GROUP BY 1, 2),
      |pt AS (
      |  SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(20,4))) AS tq
      |  FROM l96 GROUP BY 1)
      |SELECT s_suppkey, s_name, n_parts
      |FROM (
      |  SELECT ps.l_suppkey, COUNT(*) AS n_parts
      |  FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
      |  WHERE ps.sq * 2 > pt.tq
      |  GROUP BY 1) d
      |JOIN supplier ON d.l_suppkey = s_suppkey
      |ORDER BY n_parts DESC, s_suppkey""".stripMargin

  /** TPC-H Q21-shaped sole-fault suppliers: for one nation's
    * suppliers, count returned ('R') lines on multi-supplier orders
    * where NO other supplier on the order had a return — the
    * exists + not-exists double-correlated shape, decorrelated into a
    * semi-join (some other supplier shipped the order) and an
    * anti-join (no other supplier had a return).
    *
    * Scale shape: both probe relations are orderkey-keyed projections
    * of the fact (deduplicated to (order, supplier) grain), so the
    * exists/not-exists pair is two hash joins on the 8-byte orderkey
    * with a residual suppkey inequality — never a per-row subquery.
    * The nation filter broadcasts through supplier; the rollup is
    * supplier-cardinality. All-integer output.
    */
  def q21Waiting(spark: SparkSession, dir: String, nationName: String = "NATION_3"): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val rLines = l
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
    // (order, supplier) grain: who participated / who had a return
    val shippers = l.select(col("l_orderkey").as("__ok"), col("l_suppkey").as("__sk")).distinct()
    val returners = rLines.select(col("l_orderkey").as("__rok"), col("l_suppkey").as("__rsk")).distinct()
    val n = Tables.nation(spark, dir)
      .filter(col("n_name") === nationName)
      .select(col("n_nationkey").as("__nk"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("__nk"))
      .select(col("s_suppkey"), col("s_name"))
    rLines
      .join(
        shippers,
        col("l_orderkey") === col("__ok") && col("l_suppkey") =!= col("__sk"),
        "left_semi"
      )
      .join(
        returners,
        col("l_orderkey") === col("__rok") && col("l_suppkey") =!= col("__rsk"),
        "left_anti"
      )
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
  }

  val q21Sql: String =
    """SELECT s_suppkey, s_name, COUNT(*) AS numwait
      |FROM lineitem l1
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE l1.l_returnflag = 'R'
      |  AND n_name = 'NATION_3'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_suppkey, s_name
      |ORDER BY numwait DESC, s_suppkey""".stripMargin

  /** Multidimensional aggregate via CUBE: the pricing summary at every
    * combination of (returnflag, linestatus) INCLUDING the marginal
    * subtotals and the grand total, disambiguated by grouping_id — the
    * OLAP rollup surface (GROUPING SETS/ROLLUP/CUBE) a dashboard layer
    * asks for in one query instead of four.
    *
    * Scale shape: Catalyst expands the cube in ONE Expand + partial
    * aggregation — each input row fans to its 4 grouping sets map-side
    * and combines before the single shuffle; no per-set rescan.
    * Portability: grouping_id bit order is the SQL-standard
    * (first key = MSB) in both engines; money sums through
    * DECIMAL(20,4) cast to double at the end.
    */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      // pre-aggregate to the (flag, status) base grain FIRST: CUBE's
      // Expand otherwise multiplies every fact row by the number of
      // grouping sets (4×) before the partial agg — 4× the agg-probe
      // volume and 4× the decimal casts for the same exact sums. The
      // cube then runs over the ≤|flag|×|status| summary rows.
      // DECIMAL sums are exact, so the re-aggregated totals (and the
      // summed counts) are bit-identical to the single-level grouping.
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("l_quantity").cast(d204)).as("__sq"),
        sum(col("l_extendedprice").cast(d204)).as("__sp")
      )
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        sum(col("__n")).as("n"),
        sum(col("__sq")).cast("double").as("sum_qty"),
        sum(col("__sp")).cast("double").as("sum_price")
      )
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  /** Hierarchical ROLLUP over the geography dimension chain: customer
    * revenue at nation grain, nation subtotals per region, and the
    * grand total — the drill-down report a dashboard asks for in one
    * query. Complements [[qCube]] (full cross of independent dims):
    * ROLLUP emits only the prefix grouping sets of an ordered
    * hierarchy, the natural shape for region ⊃ nation.
    *
    * Scale shape: the fact reduces at custkey grain BEFORE any
    * dimension join (one fact-side shuffle), then nation/region
    * broadcast through customer; the ROLLUP itself is one Expand + one
    * partial agg over the already-reduced (region, nation) grain.
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("__nk"), col("n_name"), col("n_regionkey"))
    val r = Tables.region(spark, dir)
      .select(col("r_regionkey").as("__rk"), col("r_name"))
    val vol = col("l_extendedprice").cast(d184) * (lit(1).cast(d184) - col("l_discount").cast(d184))
    val custRev = l
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("__n"), sum(vol).as("__rev"))
    custRev
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("__nk"))
      .join(broadcast(r), col("n_regionkey") === col("__rk"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping_id().cast("long").as("gid"),
        sum(col("__n")).as("n_lines"),
        // round-4 BEFORE the double cast: the rounded unscaled value
        // fits 2^53, so the decimal→double conversion is a single
        // correctly-rounded step in both engines (an unrounded scale-8
        // sum converts via two roundings and drifts a ULP)
        round(sum(col("__rev")), 4).cast("double").as("revenue")
      )
      .orderBy(col("gid"), col("r_name"), col("n_name"))
  }

  val qRollupSql: String =
    """SELECT r_name, n_name,
      |  CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
      |  COUNT(*) AS n_lines,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |           * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE)
      |    AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY gid, r_name, n_name""".stripMargin
}
