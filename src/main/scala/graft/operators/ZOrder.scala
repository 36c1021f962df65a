package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two clustering
  * dimensions so that range predicates on EITHER dimension map to a small
  * number of contiguous z-ranges — the standard multi-dimensional layout
  * for parquet/Delta-style min-max pruning at 100 TB (a table laid out by
  * one column prunes only on that column; z-order prunes on both).
  *
  * The z-value is a pure column expression (32 shift/mask terms — all
  * inside whole-stage codegen); the layout step is
  * `repartitionByRange(zval) + sortWithinPartitions(zval)`, so every
  * output file covers a tight z-interval and its parquet footer min/max on
  * BOTH source columns stays narrow.
  */
object ZOrder {

  private val Bits = 16

  /** Bit-interleave of two [`Bits`]-bit non-negative ints: a's bit i lands
    * at position 2i, b's at 2i+1.
    */
  private def interleaveExpr(a: String, b: String): String =
    (0 until Bits).map(i =>
      s"(shiftleft(shiftright($a, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($b, $i) & 1, ${2 * i + 1}))")
      .mkString(" + ")

  private def interleaveSql(a: String, b: String): String =
    (0 until Bits).map(i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  /** Orders keyed by (customer, order-day) with their z-value. */
  private def withZ(orders: DataFrame): DataFrame =
    orders
      .withColumn("ck", col("o_custkey") % 65536)
      .withColumn("d",
        datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
          .cast("bigint") % 65536)
      .withColumn("zval", expr(interleaveExpr("ck", "d")))

  /** Gate query: the z-values of a deterministic order sample — proves the
    * interleave arithmetic bit-for-bit against the oracle.
    */
  def zorderLayout(s: SparkSession, dir: String): DataFrame =
    withZ(Tables.orders(s, dir))
      .filter(col("o_orderkey") % 37 === 0)
      .select(col("o_orderkey"), col("ck"), col("d"), col("zval"))
      .orderBy("o_orderkey")

  val zorderLayoutSql: String = s"""
    WITH t AS (
      SELECT o_orderkey, o_custkey % 65536 AS ck,
        date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 65536
          AS d
      FROM orders)
    SELECT o_orderkey, ck, d, ${interleaveSql("ck", "d")} AS zval
    FROM t WHERE o_orderkey % 37 = 0
    ORDER BY o_orderkey"""

  /** The layout operator itself: range-partition by z-value and sort
    * within partitions, so file-level min/max stats on both dimensions
    * prune. `n` is the target file count.
    */
  def zOrderedLayout(orders: DataFrame, n: Int): DataFrame =
    withZ(orders).repartitionByRange(n, col("zval"))
      .sortWithinPartitions(col("zval"))

  // ------------------------------------------------------ n-dim interleave

  /** Generalized Morton interleave over any number of dimensions: bit i of
    * dimension j lands at position `i·ndims + j`. With `bits` bits per
    * dimension the code needs `bits·ndims ≤ 63` — 3×16 fits a BIGINT. Still
    * a pure column expression (bits·ndims shift/mask terms, codegen'd).
    */
  private[operators] def interleaveNExpr(cols: Seq[String], bits: Int = Bits): String =
    (for { i <- 0 until bits; (c, j) <- cols.zipWithIndex } yield
      s"shiftleft(shiftright($c, $i) & 1, ${i * cols.length + j})")
      .mkString(" + ")

  private def interleaveNSql(cols: Seq[String], bits: Int = Bits): String =
    (for { i <- 0 until bits; (c, j) <- cols.zipWithIndex } yield
      s"((($c >> $i) & 1) << ${i * cols.length + j})")
      .mkString(" + ")

  private val StatusOrd =
    "CASE o_orderstatus WHEN 'F' THEN 0 WHEN 'O' THEN 1 ELSE 2 END"

  /** 3-dim z-value over (customer, order-day, status): range predicates on
    * ANY of the three dimensions prune the laid-out files. Same sampled
    * bit-for-bit gate as the 2-dim path.
    */
  def zorder3Layout(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("ck", col("o_custkey") % 65536)
      .withColumn("d",
        datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
          .cast("bigint") % 65536)
      .withColumn("st", expr(StatusOrd).cast("bigint"))
      .withColumn("zval3", expr(interleaveNExpr(Seq("ck", "d", "st"))))
      .filter(col("o_orderkey") % 37 === 0)
      .select(col("o_orderkey"), col("ck"), col("d"), col("st"), col("zval3"))
      .orderBy("o_orderkey")

  val zorder3LayoutSql: String = s"""
    WITH t AS (
      SELECT o_orderkey, o_custkey % 65536 AS ck,
        date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 65536
          AS d,
        CAST($StatusOrd AS BIGINT) AS st
      FROM orders)
    SELECT o_orderkey, ck, d, st,
      ${interleaveNSql(Seq("ck", "d", "st"))} AS zval3
    FROM t WHERE o_orderkey % 37 = 0
    ORDER BY o_orderkey"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_layout" -> (zorderLayout(_, _)),
    "zorder3_layout" -> (zorder3Layout(_, _)))

  val oracles: Map[String, String] = Map(
    "zorder_layout" -> zorderLayoutSql,
    "zorder3_layout" -> zorder3LayoutSql)
}
