package graft

import graft.operators.{JoinShapes, Quantile, ZOrder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-7 operators: the Hilbert ordered-layout writer (the file path the
  * `layout_locality` measurement argues for) and the row-level Bloom probe
  * (the at-scale pruning path next to the audited key-set comparison).
  */
class Round7OpsSpec extends SparkSpec {

  test("hilbert writer: per-file hval ranges disjoint, boxes beat z-order") {
    val laid = ZOrder.hilbertOrderedLayout(Tables.orders(spark, sf), 16)
    val hParts = laid
      .select(spark_partition_id().as("p"), col("hval"), col("ck"), col("dy"))
      .groupBy("p")
      .agg(min("hval").as("lo"), max("hval").as("hi"),
        (max(col("ck")) - min(col("ck")) + 1 +
          (max(col("dy")) - min(col("dy")) + 1)).as("ext"))
      .collect()
    assert(hParts.length > 1, "layout must actually split into files")
    // disjoint hval intervals per output file — what makes every file's
    // parquet footer a tight, non-overlapping index range
    val ranges = hParts.map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, "overlapping hval ranges across files")
      case _ =>
    }
    // measured pruning quality: per-file bounding boxes over the SAME rows
    // and the SAME 256-grid, laid out by Z-order instead — Hilbert's
    // connected file regions must give tighter average boxes (the writer
    // counterpart of the layout_locality gate's bucket audit)
    val base = Tables.orders(spark, sf)
      .withColumn("ck", col("o_custkey") % 256)
      .withColumn("dy",
        datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
          .cast("bigint") % 256)
      .withColumn("zval", expr(ZOrder.interleaveNExpr(Seq("ck", "dy"), 8)))
      .repartitionByRange(16, col("zval"))
      .sortWithinPartitions(col("zval"))
    val zParts = base
      .select(spark_partition_id().as("p"), col("ck"), col("dy"))
      .groupBy("p")
      .agg((max(col("ck")) - min(col("ck")) + 1 +
        (max(col("dy")) - min(col("dy")) + 1)).as("ext"))
      .collect()
    def avg(rows: Array[org.apache.spark.sql.Row]): Double =
      rows.map(_.getAs[Long]("ext").toDouble).sum / rows.length
    val (hAvg, zAvg) = (avg(hParts), avg(zParts))
    assert(hAvg <= zAvg,
      s"hilbert files' boxes ($hAvg) should beat z-order's ($zAvg)")
  }

  test("quantile sketch: every pick's rank window satisfies the bound") {
    val rows = Quantile.qQuantilesSketch(spark, sf).collect()
    assert(rows.length == 3, "one row per quarter")
    rows.foreach { r =>
      val (t, lo, hi, bound) = (r.getAs[Long]("target_rank"),
        r.getAs[Long]("rank_lo"), r.getAs[Long]("rank_hi"),
        r.getAs[Long]("err_bound"))
      // the construction's guarantee: the pick's value-class straddles or
      // approaches the target rank within the summed stride bound
      assert(hi >= t, s"pick's at-or-below rank $hi misses target $t")
      assert(lo < t + bound, s"pick's strictly-below rank $lo exceeds " +
        s"target $t + bound $bound")
      assert(bound <= r.getAs[Long]("n") / 64 + 32,
        "bound must stay within n/S + P")
    }
  }

  test("quantile sketch merge: unioned summaries keep the summed bound") {
    import org.apache.spark.sql.Row
    val li = Tables.lineitem(spark, sf)
      .select(expr("cast(round(l_extendedprice * 100) as bigint)").as("v"),
        col("l_orderkey"), col("l_linenumber"))
    val (evens, odds) = (li.filter(col("l_orderkey") % 2 === 0),
      li.filter(col("l_orderkey") % 2 === 1))
    val key = Seq("l_orderkey", "l_linenumber")
    // merge = plain union of the halves' summaries; shard ids relabel so
    // the per-shard stride metadata stays distinct across the two sources
    val merged = Quantile.summarize(evens, "v", key).unionByName(
      Quantile.summarize(odds, "v", key)
        .withColumn("shard", col("shard") + 32))
    val picks = Quantile.quantiles(merged, Seq(1, 2, 3)).collect()
    assert(picks.length == 3)
    val n = li.count()
    picks.foreach { r =>
      assert(r.getAs[Long]("n") == n, "merged total weight = union size")
      val (t, v, bound) = (r.getAs[Long]("target_rank"),
        r.getAs[Long]("approx_v"), r.getAs[Long]("err_bound"))
      val Row(lo: Long, hi: Long) = li
        .agg(sum(when(col("v") < v, 1L).otherwise(0L)),
          sum(when(col("v") <= v, 1L).otherwise(0L))).head()
      // the merged sketch answers ABOUT THE UNION with the summed bound —
      // the mergeability property that lets per-day / per-source summaries
      // roll up without rescanning
      assert(hi >= t, s"merged pick rank $hi misses target $t")
      assert(lo < t + bound, s"merged pick rank $lo off target $t by > $bound")
    }
  }

  test("bloom row-level probe: broadcast bit-test, no probe-side shuffle") {
    val keys = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("k"))
    val li = Tables.lineitem(spark, sf)
    val pruned = JoinShapes.bloomPruneRows(li, "l_orderkey", keys, "k")
    // zero false negatives by construction: every row of the exact
    // semi-join survives the bit-test filter
    val exact = li.join(keys, li("l_orderkey") === keys("k"), "left_semi")
    assert(exact.join(pruned.select(col("l_orderkey").as("pk")).distinct(),
      col("l_orderkey") === col("pk"), "left_anti").isEmpty,
      "a true key's rows were pruned — false negative")
    // the at-scale plan: the 1-row packed mask broadcasts (nested-loop
    // join) and the fact side feeds it straight from the scan — no
    // shuffle, no aggregate, no distinct on the probe side
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val phys = pruned.queryExecution.sparkPlan
    val bnlj = phys.collectFirst { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnlj.isDefined, "mask must join as a broadcast nested loop")
    val j = bnlj.get
    val streamed = j.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.left
      case _ => j.right
    }
    assert(streamed.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      "probe side must not shuffle for the filter")
    assert(streamed.collect { case a: BaseAggregateExec => a }.isEmpty,
      "probe side must not aggregate for the filter")
  }
}
