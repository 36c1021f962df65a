package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics headliners: the query-engine surface of the reference re-run as
  * declarative Spark plans (TPC-H-shaped over the harness tables).
  *
  * Scale notes: every dimension side is explicitly `broadcast()`; aggregates
  * are map-side combinable; filters sit directly on the scans so they reach
  * the parquet reader as PushedFilters.
  */
object Queries {

  /** Pricing summary (TPC-H Q1 shape): single scan, hash aggregate. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.sumD(col("l_quantity")).as("sum_qty"),
        Exact.sumD(col("l_extendedprice")).as("sum_base_price"),
        Exact.sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        Exact.sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        Exact.avgD(col("l_quantity")).as("avg_qty"),
        Exact.avgD(col("l_extendedprice")).as("avg_price"),
        Exact.avgD(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String = s"""
    SELECT l_returnflag, l_linestatus,
      ${Exact.sqlSum("l_quantity")} AS sum_qty,
      ${Exact.sqlSum("l_extendedprice")} AS sum_base_price,
      ${Exact.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
      ${Exact.sqlSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
      ${Exact.sqlAvg("l_quantity")} AS avg_qty,
      ${Exact.sqlAvg("l_extendedprice")} AS avg_price,
      ${Exact.sqlAvg("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** Unshipped-orders revenue (TPC-H Q3 shape): broadcast dim, two joins. */
  def q3Join(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1996-03-15").cast("timestamp")
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(Exact.sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  val q3JoinSql: String = s"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
      ${Exact.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10"""

  /** Local-supplier volume (TPC-H Q5 shape): star join, broadcast dims. */
  def q5MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(Exact.sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5MultiJoinSql: String = s"""
    SELECT n_name,
      ${Exact.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name"""

  /** Top orders per market segment: rank window after a broadcast join. */
  def topkWindow(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
    val o = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  val topkWindowSql: String = """
    SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey) t
    WHERE rn <= 3
    ORDER BY c_mktsegment, rn"""

  /** Gap-based sessionization: 30-minute inactivity closes a session.
    * lag + running sum of session-start flags; the batch shape of what
    * `graft.streaming` does with state.
    */
  def eventsSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tss"))
    val e = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("second", col("ts")).as("tss"),
        col("value"))
    e.withColumn("prev", lag(unix_timestamp(col("tss")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull ||
          unix_timestamp(col("tss")) - col("prev") > 1800, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("tss")).as("session_start"),
        count(lit(1)).as("n_events"),
        Exact.sumD(col("value")).as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val eventsSessionizeSql: String = s"""
    WITH e AS (
      SELECT user_id, date_trunc('second', ts) AS tss, value FROM events),
    flagged AS (
      SELECT user_id, tss, value,
        CASE WHEN epoch(tss) - LAG(epoch(tss)) OVER
            (PARTITION BY user_id ORDER BY tss) > 1800
          OR LAG(epoch(tss)) OVER (PARTITION BY user_id ORDER BY tss) IS NULL
          THEN 1 ELSE 0 END AS new_sess
      FROM e),
    sess AS (
      SELECT user_id, tss, value,
        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tss
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      MIN(tss) AS session_start,
      COUNT(*) AS n_events, ${Exact.sqlSum("value")} AS sum_value
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_id"""

  /** Tumbling-window event rollup (batch analog of the streaming op). */
  def eventsWindowAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), Exact.sumD(col("value")).as("sum_value"))
      .orderBy(col("win"), col("event_type"))
  }

  val eventsWindowAggSql: String = s"""
    SELECT date_trunc('hour', ts) AS win, event_type,
      COUNT(*) AS n, ${Exact.sqlSum("value")} AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY win, event_type"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q3_join" -> (q3Join _),
    "q5_multijoin" -> (q5MultiJoin _),
    "topk_window" -> (topkWindow _),
    "events_sessionize" -> (eventsSessionize _),
    "events_window_agg" -> (eventsWindowAgg _))

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q3_join" -> q3JoinSql,
    "q5_multijoin" -> q5MultiJoinSql,
    "topk_window" -> topkWindowSql,
    "events_sessionize" -> eventsSessionizeSql,
    "events_window_agg" -> eventsWindowAggSql)
}
