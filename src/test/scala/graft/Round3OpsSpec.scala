package graft

import graft.operators.{CorpusFilters, Dedup, Queries, Similarity}
import org.apache.spark.sql.functions._

/** Specs for the round-3 operator additions (corpus filters, rollup /
  * quantile / retention analytics, int8 quantization, batch stream-dedup).
  */
class Round3OpsSpec extends SparkSpec {

  test("text_repetition: fractions bounded, slot count matches word count") {
    val rows = CorpusFilters.textRepetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val top = r.getAs[Double]("top_bigram_frac")
      val dup = r.getAs[Double]("dup_trigram_frac")
      assert(top > 0.0 && top <= 1.0)
      assert(dup >= 0.0 && dup <= 1.0)
    }
    // bigram slots = word count − 1 for a sampled doc
    val d0 = Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .select(size(split(lower(trim(regexp_replace(col("text"), "\\s+", " "))),
        " ")))
      .head().getInt(0)
    val r0 = rows.find(_.getAs[Long]("doc_id") == 0).get
    assert(r0.getAs[Long]("n_bigrams") == d0 - 1)
  }

  test("decontaminate: overlap counts match a direct recount") {
    val out = CorpusFilters.decontaminate(spark, sf).collect()
    assert(out.nonEmpty, "some train docs share shingles with the eval set")
    assert(out.forall(_.getAs[Long]("doc_id") % 101 != 0), "no eval docs")
    assert(out.forall(r =>
      r.getAs[Boolean]("contaminated") == (r.getAs[Long]("n_overlap") >= 3)))
    // recount one doc's overlap directly from the shingle definition
    val probe = out.head.getAs[Long]("doc_id")
    val sh = Dedup.dedupMinhashLsh(spark, sf) // warms the shared shingle memo
    val docs = Tables.documents(spark, sf)
    def shingleSet(pred: org.apache.spark.sql.Column) = docs.filter(pred)
      .select(explode(expr(
        """transform(sequence(1, size(split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' ')) - 2),
             i -> concat_ws(' ',
               element_at(split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' '), i),
               element_at(split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' '), i + 1),
               element_at(split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' '), i + 2)))"""))
        .as("sh"))
      .distinct().collect().map(_.getString(0)).toSet
    val evalSet = shingleSet(col("doc_id") % 101 === 0)
    val probeSet = shingleSet(col("doc_id") === probe)
    val expected = (probeSet intersect evalSet).size
    val got = out.find(_.getAs[Long]("doc_id") == probe).get.getAs[Long]("n_overlap")
    assert(got == expected, s"doc $probe overlap $got != $expected")
  }

  test("q_rollup: subtotals roll up to the grand total") {
    val rows = Queries.qRollup(spark, sf).collect()
    val leaves = rows.filter(_.getAs[Long]("gid") == 0)
    val flagTotals = rows.filter(_.getAs[Long]("gid") == 1)
    val grand = rows.filter(_.getAs[Long]("gid") == 3)
    assert(grand.length == 1)
    assert(leaves.map(_.getAs[Long]("n")).sum == grand.head.getAs[Long]("n"))
    assert(flagTotals.map(_.getAs[Long]("n")).sum == grand.head.getAs[Long]("n"))
    flagTotals.foreach { ft =>
      val flag = ft.getAs[String]("rflag")
      val fl = leaves.filter(_.getAs[String]("rflag") == flag)
      assert(fl.map(_.getAs[Long]("n")).sum == ft.getAs[Long]("n"))
      assert(math.abs(fl.map(_.getAs[Double]("sum_qty")).sum -
        ft.getAs[Double]("sum_qty")) < 1e-6)
    }
  }

  test("q_quantiles: ordered and inside the per-group range") {
    val qs = Queries.qQuantiles(spark, sf).collect()
    val ranges = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(min("l_quantity").as("lo"), max("l_quantity").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    qs.foreach { r =>
      val (p25, p50, p75) = (r.getAs[Double]("p25"), r.getAs[Double]("p50"),
        r.getAs[Double]("p75"))
      val (lo, hi) = ranges(r.getAs[String]("l_returnflag"))
      assert(lo <= p25 && p25 <= p50 && p50 <= p75 && p75 <= hi)
    }
  }

  test("events_retention: counts consistent, rates bounded") {
    val rows = Queries.eventsRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_retained") <= r.getAs[Long]("n_active"))
      val rate = r.getAs[Double]("retention")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    assert(rows.exists(_.getAs[Long]("n_retained") > 0), "some retention")
  }

  test("embed_quantize: int8 error bounded by half a quantization step") {
    val rows = Similarity.embedQuantize(spark, sf).collect()
    assert(rows.length == Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      // |fine − 50000·int8| ≤ 25000 + fine-rounding slack of 1
      assert(r.getAs[Long]("max_err") <= 25001)
      assert(r.getAs[Long]("sse") <= 64L * 25001 * 25001)
    }
  }

  test("ann_pq: complete ranked lists, non-negative integer ADC") {
    val rows = Similarity.annPq(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Int]("rank")).sorted.sameElements(1 to g.length))
      assert(g.length <= 5)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("adc") >= 0, "ADC is a sum of squared distances")
      assert(r.getAs[Long]("vec_id") != r.getAs[Long]("probe_id"))
    }
    // deterministic across runs (codebook + tie-breaks are fixed)
    val again = Similarity.annPq(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("ann_pq: approximate neighbors overlap the exact top-k") {
    val exact = Similarity.annTopk(spark, sf, k = 10).collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, g) => p -> g.map(_.getAs[Long]("vec_id")).toSet }
    val pq = Similarity.annPq(spark, sf).collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, g) => p -> g.map(_.getAs[Long]("vec_id")).toSet }
    // PQ is approximate; require SOME overlap with the exact top-10 across
    // the probe set rather than per-probe recall
    val hits = pq.map { case (p, cands) =>
      (cands intersect exact.getOrElse(p, Set.empty)).size }.sum
    assert(hits > 0, "PQ candidates never intersect exact top-10")
  }

  test("zorder: interleave round-trips and layout ranges are disjoint") {
    import org.apache.spark.sql.functions._
    val rows = operators.ZOrder.zorderLayout(spark, sf).collect()
    rows.take(50).foreach { r =>
      val (ck, d, z) = (r.getAs[Long]("ck"), r.getAs[Long]("d"),
        r.getAs[Long]("zval"))
      // de-interleave the even/odd bits recovers both dimensions
      var (rc, rd) = (0L, 0L)
      (0 until 16).foreach { i =>
        rc |= ((z >> (2 * i)) & 1) << i
        rd |= ((z >> (2 * i + 1)) & 1) << i
      }
      assert(rc == ck && rd == d, s"z $z should decode to ($ck, $d)")
    }
    // range partitioning by zval yields disjoint per-partition z intervals
    val laid = operators.ZOrder.zOrderedLayout(Tables.orders(spark, sf), 4)
    val parts = laid.select(spark_partition_id().as("p"), col("zval"))
      .groupBy("p").agg(min("zval").as("lo"), max("zval").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    parts.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "overlapping z ranges")
      case _ =>
    }
  }

  test("zorder3: the n-dim interleave round-trips all three dimensions") {
    val rows = operators.ZOrder.zorder3Layout(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val z = r.getAs[Long]("zval3")
      // bit i of dim j sits at position i*3 + j
      def dim(j: Int): Long =
        (0 until 16).foldLeft(0L)((acc, i) => acc | (((z >> (i * 3 + j)) & 1) << i))
      assert(dim(0) == r.getAs[Long]("ck"))
      assert(dim(1) == r.getAs[Long]("d"))
      assert(dim(2) == r.getAs[Long]("st"))
    }
  }

  test("orders_moving_revenue: trailing frame bounds the per-row aggregate") {
    val rows = Queries.ordersMovingRevenue(spark, sf).collect()
    assert(rows.length == Tables.orders(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_30d") >= 1, "frame always includes current row")
      assert(r.getAs[Double]("rev_30d") > 0.0)
    }
    // a customer's rows: n_30d never exceeds their total order count
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("n_30d")).max <= g.length)
    }
  }

  test("orders_pivot: pivoted counts reconstruct the flat group-by") {
    val piv = Queries.ordersPivot(spark, sf).collect()
    val flat = Tables.orders(spark, sf)
      .groupBy("o_orderstatus", "o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    piv.foreach { r =>
      val st = r.getString(0)
      prios.zipWithIndex.foreach { case (p, i) =>
        assert(r.getAs[Long](s"n_p${i + 1}") == flat.getOrElse((st, p), 0L))
      }
    }
  }

  test("kmv_by_group: merged per-group sketches equal the direct global sketch") {
    import graft.operators.{Dedup, Sketch}
    val rows = Sketch.kmvByGroup(spark, sf).collect()
    val all = rows.find(_.getString(0) == "ALL").get.getAs[Double]("est_distinct")
    // direct global sketch over the same shingle domain
    val direct = Sketch.kmvDistinct(
        Dedup.shinglesOf(spark, sf).select("sh"), "sh", 64)
      .collect().head.getAs[Double]("est_distinct")
    assert(all == direct,
      s"merged sketch ($all) must equal the direct global sketch ($direct)")
    // estimates are within plausible bounds of the exact counts (k=64 →
    // ~12.5% standard error; allow 4 sigma)
    val exact = graft.operators.Dedup.shinglesOf(spark, sf)
      .select("sh").distinct().count().toDouble
    assert(math.abs(all - exact) / exact < 0.5, s"est $all vs exact $exact")
  }

  test("dq_check: rule families report, failing rule counted not just flagged") {
    val rows = graft.operators.Quality.dqCheck(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows.size == 6)
    // clean rules on this schema
    for (ok <- Seq("orders_pk_unique", "lineitem_fk_orders",
      "orders_status_domain", "orders_price_positive", "lineitem_qty_range"))
      assert(rows(ok) == (0L, "ok"), s"$ok should pass")
    // the synthetic data genuinely violates ship-after-order
    val (n, st) = rows("lineitem_ship_before_order")
    assert(st == "fail" && n > 0, "violations must be counted")
    assert(n < Tables.lineitem(spark, sf).count(), "not everything violates")
  }

  test("versioned_append: incremental revision equals a full rebuild") {
    import graft.operators.{Versioned, VersionedScenarios => VS}
    val rebuilt = Versioned.build(
      Seq(1 -> VS.r1(spark, sf), 2 -> VS.r2(spark, sf), 3 -> VS.r3(spark, sf)),
      "o_orderkey")
    val appended = VS.versionedAppend(spark, sf)
    assert(appended.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(appended).isEmpty,
      "append path must reproduce the rebuild row-for-row")
    // every key has at most one open version
    val multiOpen = appended.filter(col(Versioned.Expired).isNull)
      .groupBy("o_orderkey").count().filter(col("count") > 1).count()
    assert(multiOpen == 0)
  }

  test("incremental_agg: equals a direct aggregate over the merged table") {
    import graft.operators.MergeScenarios
    val incr = MergeScenarios.incrementalAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val direct = MergeScenarios.applyChangeset(spark, sf)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), Exact.sumD(col("o_totalprice")).as("s"))
      .orderBy("o_orderstatus").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(incr.sameElements(direct),
      "incremental state + delta must equal the full rescan exactly")
  }

  test("stream_dedup (batch mode): planted duplicate deliveries collapse") {
    val out = graft.streaming.StreamScenarios.streamDedup(spark, sf).collect()
    val direct = Tables.events(spark, sf).groupBy("event_type")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n") == direct(r.getAs[String]("event_type")),
        "every duplicate delivery was dropped")
    }
  }
}
