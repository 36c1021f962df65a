package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the generalization of the
  * reference's row-count sanity gate (`_bde_CheckTableCount`) to the rule
  * families an ETL engine runs after every load: domain/range rules,
  * primary-key uniqueness, referential integrity, and cross-column
  * (temporal) consistency.
  *
  * Scale design (100 TB): rules are grouped by what they scan —
  * - all DOMAIN/RANGE rules on a table fuse into ONE conditional-aggregate
  *   pass (`count(when(violation, 1))` columns stacked to rows afterward);
  *   adding a rule adds a column to the same scan, not a scan;
  * - UNIQUENESS is one map-side-combining groupBy on the key;
  * - REFERENTIAL integrity is one anti-join (broadcast when the parent is
  *   dimension-sized, shuffle otherwise);
  * - CROSS-TABLE rules ride the same join the query layer would use.
  * Each family contributes one scalar row per rule — the output is O(rules),
  * never O(data).
  */
object Quality {

  private val OrderStatusDomain = Seq("O", "F", "P")

  /** The DQ report for the harness schema: six rules across four families.
    * `lineitem_ship_before_order` genuinely fails on the synthetic data —
    * the gate proves failing rules are counted, not just detected.
    */
  def dqCheck(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)

    // domain/range family: ONE pass per table for all its scan rules
    val ordersScan = o.agg(
      count(when(!col("o_orderstatus").isin(OrderStatusDomain: _*), 1))
        .as("orders_status_domain"),
      count(when(col("o_totalprice") <= 0.0, 1)).as("orders_price_positive"))
    val lineitemScan = l.agg(
      count(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1))
        .as("lineitem_qty_range"))

    // uniqueness family: one groupBy on the key; violations = extra rows
    val pk = o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("n_violations"))
      .select(lit("orders_pk_unique").as("check_name"), col("n_violations"))

    // referential family: one anti-join child → parent
    val fk = l.join(o.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("lineitem_fk_orders").as("check_name"), col("n_violations"))

    // cross-table family: the same join the query layer uses
    val temporal = l.join(o,
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(when(col("l_shipdate") < col("o_orderdate"), 1))
        .as("n_violations"))
      .select(lit("lineitem_ship_before_order").as("check_name"),
        col("n_violations"))

    def stack(agged: DataFrame): DataFrame = {
      val names = agged.columns
      agged.select(expr(s"stack(${names.length}, " +
        names.map(c => s"'$c', $c").mkString(", ") +
        ") as (check_name, n_violations)"))
    }

    stack(ordersScan).unionByName(stack(lineitemScan))
      .unionByName(pk).unionByName(fk).unionByName(temporal)
      .withColumn("status",
        when(col("n_violations") === 0, "ok").otherwise("fail"))
      .orderBy("check_name")
  }

  val dqCheckSql: String = """
    WITH checks AS (
      SELECT 'orders_status_domain' AS check_name,
        count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
          AS n_violations
      FROM orders
      UNION ALL
      SELECT 'orders_price_positive',
        count(*) FILTER (WHERE o_totalprice <= 0.0) FROM orders
      UNION ALL
      SELECT 'lineitem_qty_range',
        count(*) FILTER (WHERE l_quantity < 1.0 OR l_quantity > 50.0)
      FROM lineitem
      UNION ALL
      SELECT 'orders_pk_unique',
        CAST(coalesce(sum(cnt - 1), 0) AS BIGINT)
      FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_orderkey)
      UNION ALL
      SELECT 'lineitem_fk_orders', count(*)
      FROM lineitem WHERE NOT EXISTS
        (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      UNION ALL
      SELECT 'lineitem_ship_before_order',
        count(*) FILTER (WHERE l_shipdate < o_orderdate)
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT check_name, n_violations,
      CASE WHEN n_violations = 0 THEN 'ok' ELSE 'fail' END AS status
    FROM checks ORDER BY check_name"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_check" -> (dqCheck(_, _)))

  val oracles: Map[String, String] = Map(
    "dq_check" -> dqCheckSql)
}
