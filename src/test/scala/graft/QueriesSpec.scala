package graft

import graft.operators.Queries

class QueriesSpec extends SparkSpec {

  test("q1_agg returns the six flag/status groups with positive sums") {
    val rows = Queries.q1Agg(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Double]("sum_base_price") > 0))
    val flags = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(flags == flags.sorted)
  }

  test("q3_join keeps top-10 by revenue, descending") {
    val rows = Queries.q3Join(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue")).toSeq
    assert(revs == revs.sortBy(-_))
  }

  test("q3/q5 plans broadcast their dimension sides") {
    val p3 = Queries.q3Join(spark, sf).queryExecution.executedPlan.toString
    assert(p3.contains("BroadcastHashJoin"), "q3 should broadcast customer")
    val p5 = Queries.q5MultiJoin(spark, sf).queryExecution.executedPlan.toString
    assert(p5.contains("BroadcastHashJoin"), "q5 should broadcast dims")
  }

  test("q1 plan pushes the shipdate filter to the parquet scan") {
    val plan = Queries.q1Agg(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan.take(400))
  }

  test("topk_window emits exactly 3 per segment, rank-ordered") {
    val rows = Queries.topkWindow(spark, sf).collect()
    val bySeg = rows.groupBy(_.getString(0))
    assert(bySeg.size == 5)
    assert(bySeg.values.forall(g => g.map(_.getAs[Int]("rn")).sorted.sameElements(Array(1, 2, 3))))
    bySeg.values.foreach { g =>
      val prices = g.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("o_totalprice"))
      assert(prices.sameElements(prices.sortBy(-(_: Double))))
    }
  }

  test("events_sessionize: session ids are dense per user and gaps respected") {
    val rows = Queries.eventsSessionize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, g) =>
      val ids = g.map(_.getAs[Long]("session_id")).sorted
      assert(ids.head == 1 && ids.last == ids.length)
    }
  }

  test("events_window_agg covers all event types per busy hour") {
    val rows = Queries.eventsWindowAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n") > 0))
  }

  test("events_anomaly: z-scores are mean-zero per type, flag matches |z|>3") {
    val rows = Queries.eventsAnomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, g) =>
      // z = (c·n − S)/√(n·S2 − S²): the numerators sum to zero over the
      // type's hours, so the z-scores must too (up to rounding)
      val zsum = g.map(_.getAs[Double]("z")).sum
      assert(math.abs(zsum) < 1e-3, s"type $t z-sum $zsum")
      g.foreach { r =>
        val flagged = r.getAs[Long]("anomaly") == 1L
        val big = math.abs(r.getAs[Double]("z")) > 3.0
        assert(flagged == big || math.abs(math.abs(r.getAs[Double]("z")) - 3.0) < 1e-5)
      }
    }
  }

  test("events_active_sliding: each window covers its three tumbling hours") {
    val rows = Queries.eventsActiveSliding(spark, sf).collect()
      .map(r => r.getAs[java.sql.Timestamp]("win_start") ->
        r.getAs[Long]("n_users")).toMap
    assert(rows.nonEmpty)
    // hourly distinct users (tumbling) bound the sliding window from below
    // and the 3-hour union equals it exactly for any covered hour
    val hourly = Tables.events(spark, sf)
      .selectExpr("date_trunc('hour', ts) as h", "user_id").distinct()
      .collect().groupBy(_.getAs[java.sql.Timestamp]("h"))
      .map { case (h, g) => h -> g.map(_.getAs[Long]("user_id")).toSet }
    hourly.foreach { case (h, users) =>
      val slid = rows.getOrElse(h, 0L)
      val union = (0 to 2).flatMap { k =>
        hourly.getOrElse(
          java.sql.Timestamp.from(h.toInstant.plusSeconds(3600L * k)),
          Set.empty[Long])
      }.toSet
      if (rows.contains(h)) assert(slid == union.size || union.isEmpty, s"$h")
      assert(slid >= 0 && (slid >= users.size || !rows.contains(h)))
    }
  }

  test("events_markov: rows are a stochastic matrix over event types") {
    val rows = Queries.eventsMarkov(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (t, g) =>
      val psum = g.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"$t row sums to $psum")
      assert(g.forall(_.getAs[Long]("n") > 0))
    }
  }

  test("orders_histogram: buckets partition the table, edges consistent") {
    val rows = Queries.ordersHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables.orders(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Double]("lo") == r.getAs[Long]("bucket") * 500.0)
      // the bucket's mass lives inside its edges
      assert(r.getAs[Double]("sum_price") >= r.getAs[Double]("lo") * r.getAs[Long]("n"))
      assert(r.getAs[Double]("sum_price") <
        (r.getAs[Double]("lo") + 500.0) * r.getAs[Long]("n"))
    }
  }

  test("customer_deciles: balanced bins, spend monotone down the deciles") {
    val rows = Queries.customerDeciles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("segment")).foreach { case (seg, g) =>
      val byDec = g.sortBy(_.getAs[Long]("decile"))
      assert(byDec.map(_.getAs[Long]("decile")).toSeq ==
        (1L to byDec.length).toSeq, s"$seg deciles not dense")
      // NTILE balance: bin sizes differ by at most one
      val ns = byDec.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1, s"$seg unbalanced: ${ns.mkString(",")}")
      // average spend per customer decreases down the deciles
      val avg = byDec.map(r => r.getAs[Double]("sum_spend") / r.getAs[Long]("n"))
      assert(avg.zip(avg.tail).forall { case (a, b) => a >= b }, seg)
    }
  }

  test("orders_cube: every grouping set conserves the table mass") {
    val rows = Queries.ordersCube(spark, sf).collect()
    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1)
    val n = grand.head.getAs[Long]("n")
    assert(n == Tables.orders(spark, sf).count())
    for (g <- Seq(0L, 1L, 2L))
      assert(rows.filter(_.getAs[Long]("gid") == g)
        .map(_.getAs[Long]("n")).sum == n, s"set $g")
  }

  test("promo_share: percentages bounded, promo never exceeds total") {
    val rows = Queries.promoShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pct = r.getAs[Double]("promo_pct")
      assert(pct >= 0.0 && pct <= 100.0)
      assert(r.getAs[Double]("promo_rev") <= r.getAs[Double]("total_rev"))
    }
  }

  test("top_supplier: the winner outearns every other supplier in-window") {
    val rows = Queries.topSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val best = rows.map(_.getAs[Double]("total_revenue")).max
    import org.apache.spark.sql.functions._
    val perSupp = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(Exact.sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev"))
      .collect().map(_.getAs[Double]("rev"))
    assert(perSupp.forall(_ <= best))
  }

  test("events_cohort: matrix masses equal the distinct user-hour grid") {
    val rows = Queries.eventsCohort(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("age") >= 0))
    val total = rows.map(_.getAs[Long]("n_users")).sum
    val grid = Tables.events(spark, sf)
      .selectExpr("user_id", "date_trunc('hour', ts) as hr")
      .distinct().count()
    assert(total == grid)
    // every cohort contains its own founding hour
    rows.groupBy(_.getAs[java.sql.Timestamp]("cohort")).foreach { case (c, g) =>
      assert(g.exists(_.getAs[Long]("age") == 0L), s"cohort $c")
    }
  }
}
