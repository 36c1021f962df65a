package graft

import graft.operators.TpchFill
import org.apache.spark.sql.functions._

/** Specs for the TPC-H fill-in tranche (Q2/Q6/Q8/Q9/Q12/Q21 shapes). */
class TpchFillSpec extends SparkSpec {

  test("q6_forecast: single row equals an unfused recomputation") {
    val rows = TpchFill.q6Forecast(spark, sf).collect()
    assert(rows.length == 1)
    val rev = rows.head.getAs[Double]("revenue")
    // recompute the same predicate set without the fused expression
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .filter(col("l_discount").between(0.04, 0.08))
      .filter(col("l_quantity") < 24)
      .select((col("l_extendedprice") * col("l_discount")).as("r"))
      .agg(Exact.sumD(col("r"))).head().getDouble(0)
    assert(rev == direct)
    assert(rev > 0.0)
  }

  test("q8_share: share equals an independently filtered recomputation") {
    val rows = TpchFill.q8Share(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("o_year")).toSeq == Seq(1996, 1997))
    // recompute numerator/denominator via explicit filters (no CASE-WHEN)
    val asiaCust = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val base = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .select(year(col("o_orderdate")).as("y"), col("s_nationkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("v"))
    val den = base.groupBy("y").agg(Exact.sumDec(col("v")).as("d"))
      .collect().map(r => r.getAs[Int]("y") -> r.getAs[java.math.BigDecimal]("d")).toMap
    val num = base.filter(col("s_nationkey") === 3)
      .groupBy("y").agg(Exact.sumDec(col("v")).as("n"))
      .collect().map(r => r.getAs[Int]("y") -> r.getAs[java.math.BigDecimal]("n")).toMap
    rows.foreach { r =>
      val y = r.getAs[Int]("o_year")
      val expected = num.get(y).map(_.doubleValue).getOrElse(0.0) /
        den(y).doubleValue
      val sh = r.getAs[Double]("mkt_share")
      assert(sh >= 0.0 && sh <= 1.0, s"share $sh out of range")
      assert(math.abs(sh - expected) < 1e-12, s"year $y: $sh != $expected")
    }
  }

  test("q9_profit: every (nation, year) cell; profit is sane") {
    val rows = TpchFill.q9Profit(spark, sf).collect()
    assert(rows.nonEmpty)
    val nations = rows.map(_.getAs[String]("nation")).distinct
    assert(nations.length > 1)
    // descending year within nation (the declared ordering)
    rows.groupBy(_.getAs[String]("nation")).foreach { case (_, rs) =>
      val ys = rs.map(_.getAs[Int]("o_year"))
      assert(ys.zip(ys.tail).forall { case (a, b) => a > b })
    }
  }

  test("q12_lateness: buckets partition the joined scan") {
    val rows = TpchFill.q12Lateness(spark, sf).collect()
    val total = rows.map(r => r.getAs[Long]("high_line_count") +
      r.getAs[Long]("low_line_count")).sum
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .count()
    assert(total == direct, s"bucketed $total != scan $direct")
  }

  test("q21_waiting: every listed supplier is a sole late supplier somewhere") {
    val rows = TpchFill.q21Waiting(spark, sf).collect()
    assert(rows.nonEmpty)
    val counts = rows.map(_.getAs[Long]("numwait"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // cross-check one supplier's count against a direct filter
    val perOS = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(datediff(col("l_shipdate").cast("date"),
        col("o_orderdate").cast("date")) > 90, 1L).otherwise(0L)).as("late"))
    perOS.cache()
    val orders1 = perOS.groupBy("l_orderkey")
      .agg(count(lit(1)).as("ns"), sum("late").as("nl"))
      .filter(col("ns") > 1 && col("nl") === 1)
    val expected = perOS.filter(col("late") === 1)
      .join(orders1, "l_orderkey").count()
    assert(counts.sum == expected, s"${counts.sum} != $expected")
    perOS.unpersist()
  }

  test("q2_mincost: the chosen offer is minimal for its part") {
    val rows = TpchFill.q2MinCost(spark, sf).collect()
    assert(rows.nonEmpty)
    val minUnit = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("mn"))
      .collect().map(r => r.getAs[Long]("l_partkey") -> r.getAs[Double]("mn"))
      .toMap
    rows.foreach { r =>
      val pk = r.getAs[Long]("p_partkey")
      assert(r.getAs[Double]("unit_price") == minUnit(pk),
        s"part $pk not minimal")
      assert(r.getAs[Int]("p_size") >= 45)
    }
    // one row per qualifying part
    assert(rows.map(_.getAs[Long]("p_partkey")).distinct.length == rows.length)
  }
}
