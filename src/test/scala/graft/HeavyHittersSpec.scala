package graft

import graft.streaming.{HhPart, StreamTopkSketch, StreamTopkSpace}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class HeavyHittersSpec extends SparkSpec {

  test("topk_sketch: every reported item's bracket holds (lb <= exact <= ub)") {
    val rows = operators.Sketch.topkSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lb, ex, ub) = (r.getAs[Long]("lb"), r.getAs[Long]("exact"),
        r.getAs[Long]("ub"))
      assert(lb <= ex && ex <= ub, s"bracket violated: $r")
    }
    // ranks are the 1..k prefix of the lb-descending order
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    val lbs = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("lb"))
    assert(lbs.zip(lbs.tail).forall { case (a, b) => a >= b })
  }

  test("topk_sketch: the bracket holds for EVERY item, not just the top-k") {
    // recompute the summary structure locally over the tiny sf and check
    // the mergeable-summaries guarantee item by item: lb(i) = sum of kept
    // counts <= true(i) <= lb(i) + sum of error terms of shards that did
    // not keep i — for items no shard kept, the bracket is [0, sum(err)]
    import org.apache.spark.sql.Row
    val obs = operators.Sketch.hhObs(spark, sf).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[String]("bg")))
    val m = operators.Sketch.HhM
    val exact = obs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byShard = obs.groupBy(_._1)
    val kept = scala.collection.mutable.Map.empty[(Long, String), Long]
    val dmax = scala.collection.mutable.Map.empty[Long, Long]
    for ((s, rows) <- byShard) {
      val counts = rows.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (bg, c) => (-c, bg) }
      counts.take(m).foreach { case (bg, c) => kept((s, bg)) = c }
      dmax(s) = if (counts.size > m) counts(m)._2 else 0L
    }
    val dtot = dmax.values.sum
    for (bg <- exact.keys) {
      val lb = byShard.keys.flatMap(s => kept.get((s, bg))).sum
      val covered = byShard.keys
        .filter(s => kept.contains((s, bg))).map(dmax).sum
      val ub = lb + dtot - covered
      assert(lb <= exact(bg) && exact(bg) <= ub,
        s"bracket violated for $bg: [$lb, $ub] vs ${exact(bg)}")
    }
  }

  test("topk_sketch: per-shard cut is a map-side WindowGroupLimit") {
    val p = operators.Sketch.topkSketch(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      "the rank <= m+1 cut must reduce map-side before the shard exchange")
    assert(!p.contains("CartesianProduct"))
  }

  test("join_size_sketch: both brackets contain their exact statistics") {
    val r = operators.Sketch.joinSizeSketch(spark, sf).collect().head
    val (f2l, f2, f2u) = (r.getAs[Long]("f2_lb"), r.getAs[Long]("f2_exact"),
      r.getAs[Long]("f2_ub"))
    assert(f2l <= f2 && f2 <= f2u, s"F2 bracket violated: $r")
    val (t1l, t1, t1u) = (r.getAs[Long]("top1_lb"),
      r.getAs[Long]("top1_exact"), r.getAs[Long]("top1_ub"))
    assert(t1l <= t1 && t1 <= t1u, s"top-1 bracket violated: $r")
    // basic mass relations: every key appears at least once
    assert(f2 >= r.getAs[Long]("n_obs"), "F2 >= N when all f >= 1")
    assert(t1.toDouble * t1 <= f2, "max^2 <= sum of squares")
  }

  test("streaming summary: cross-batch evolution keeps the honest bracket") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[HhPart]
    // m = 2 so compaction genuinely fires on 4 distinct items; batches
    // arrive pre-reduced (item, count), as production's foreachBatch
    // partial aggregation delivers them
    val query = StreamTopkSketch.summaries(input.toDS(), m = 2)
      .writeStream.format("memory").queryName("hh_state")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: a=3, b=2, c=1 → kept (a,3)(b,2), err = 1 (c cut)
      input.addData(HhPart(0, "a", 3), HhPart(0, "b", 2), HhPart(0, "c", 1))
      query.processAllAvailable()
      val s1 = spark.table("hh_state").collect()
        .filter(_.getAs[Long]("shard") == 0L)
        .maxBy(_.getAs[Seq[Any]]("items").toString)
      assert(s1.getAs[Long]("err") == 1L)
      // batch 2: c=3 (restarts from 0 — the MG undercount), d=1
      input.addData(HhPart(0, "c", 3), HhPart(0, "d", 1))
      query.processAllAvailable()
      val rows = spark.table("hh_state").collect()
      val last = rows.last
      val items = last.getSeq[org.apache.spark.sql.Row](
        last.fieldIndex("items"))
        .map(r => r.getAs[String]("bg") -> r.getAs[Long]("cnt")).toMap
      val err = last.getAs[Long]("err")
      // true totals: a=3, b=2, c=4, d=1
      val truth = Map("a" -> 3L, "b" -> 2L, "c" -> 4L, "d" -> 1L)
      for ((bg, t) <- truth) {
        val kept = items.getOrElse(bg, 0L)
        assert(kept <= t, s"$bg kept count overshot: $kept > $t")
        assert(t <= kept + err, s"$bg escaped the bracket: $t > $kept + $err")
      }
      // state stays bounded at m items
      assert(items.size <= 2)
    } finally query.stop()
  }

  test("streaming summary: single batch reproduces the batch cut exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[HhPart]
    val query = StreamTopkSketch.summaries(input.toDS(), m = 2)
      .writeStream.format("memory").queryName("hh_one")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(HhPart(1, "x", 5), HhPart(1, "y", 4),
        HhPart(1, "z", 3), HhPart(1, "w", 1))
      query.processAllAvailable()
      val st = spark.table("hh_one").collect().last
      val items = st.getSeq[org.apache.spark.sql.Row](st.fieldIndex("items"))
        .map(r => (r.getAs[String]("bg"), r.getAs[Long]("cnt")))
      // one merge over the full counts, one cut: top-2 by (count desc, item),
      // err = the (m+1)-th count — the batch construction bit-for-bit
      assert(items == Seq(("x", 5L), ("y", 4L)))
      assert(st.getAs[Long]("err") == 3L)
    } finally query.stop()
  }

  test("space-saving summary: count inheritance keeps per-item brackets " +
    "and a tighter floor than the Misra-Gries sum") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[HhPart]
    val query = StreamTopkSpace.summaries(input.toDS(), m = 2)
      .writeStream.format("memory").queryName("ss_state")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: a=3, b=2, c=1 → kept (a,3,0)(b,2,0), floor = 1 (c's ub)
      input.addData(HhPart(0, "a", 3), HhPart(0, "b", 2), HhPart(0, "c", 1))
      query.processAllAvailable()
      val s1 = spark.table("ss_state").collect().last
      assert(s1.getAs[Long]("floor") == 1L)
      // batch 2: c=3 re-enters inheriting the floor (ub=1+3, err=1), d=1
      // (ub=2, err=1); sorted c(4) a(3) b(2) d(2) → keep c,a; the largest
      // cut ub is b's 2 → floor = 2 (Misra-Gries' err after the same two
      // batches is 1 + 2 = 3 — the sum, strictly looser)
      input.addData(HhPart(0, "c", 3), HhPart(0, "d", 1))
      query.processAllAvailable()
      val st = spark.table("ss_state").collect().last
      val items = st.getSeq[org.apache.spark.sql.Row](st.fieldIndex("items"))
        .map(r => r.getAs[String]("bg") ->
          (r.getAs[Long]("ub"), r.getAs[Long]("err"))).toMap
      val floor = st.getAs[Long]("floor")
      assert(items == Map("c" -> ((4L, 1L)), "a" -> ((3L, 0L))))
      assert(floor == 2L)
      // true totals: a=3, b=2, c=4, d=1 — every invariant item by item
      val truth = Map("a" -> 3L, "b" -> 2L, "c" -> 4L, "d" -> 1L)
      for ((bg, t) <- truth) items.get(bg) match {
        case Some((ub, err)) =>
          assert(ub - err <= t && t <= ub, s"$bg bracket: [$ub-$err, $ub]")
        case None =>
          assert(t <= floor, s"absent $bg escaped the floor: $t > $floor")
      }
      // tighter than the Misra-Gries error sum over the same stream
      assert(floor < 3L, "floor must advance by max, not sum")
      assert(items.size <= 2)
    } finally query.stop()
  }

  test("space-saving summary: single batch reproduces the batch cut " +
    "with zero per-item error") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[HhPart]
    val query = StreamTopkSpace.summaries(input.toDS(), m = 2)
      .writeStream.format("memory").queryName("ss_one")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(HhPart(1, "x", 5), HhPart(1, "y", 4),
        HhPart(1, "z", 3), HhPart(1, "w", 1))
      query.processAllAvailable()
      val st = spark.table("ss_one").collect().last
      val items = st.getSeq[org.apache.spark.sql.Row](st.fieldIndex("items"))
        .map(r => (r.getAs[String]("bg"), r.getAs[Long]("ub"),
          r.getAs[Long]("err")))
      assert(items == Seq(("x", 5L, 0L), ("y", 4L, 0L)))
      assert(st.getAs[Long]("floor") == 3L)
    } finally query.stop()
  }

  test("cms_sketch: never an undercount, for EVERY item") {
    import spark.implicits._
    val S = operators.Sketch
    val obs = S.hhObs(spark, sf).collect().map(_.getAs[String]("bg"))
    val exact = obs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // local replay of the d x w matrix with the JVM's md5
    def bucket(j: Int, bg: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$bg".getBytes("UTF-8"))
      val hex = d.take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % S.CmsW).toInt
    }
    val cells = scala.collection.mutable.Map.empty[(Int, Int), Long]
      .withDefaultValue(0L)
    for (bg <- obs; j <- 0 until S.CmsD)
      cells((j, bucket(j, bg))) = cells((j, bucket(j, bg))) + 1L
    for ((bg, t) <- exact) {
      val est = (0 until S.CmsD).map(j => cells((j, bucket(j, bg)))).min
      assert(est >= t, s"CMS undercounted $bg: $est < $t")
    }
    // and the gate's reported rows agree with the local replay
    val rows = S.cmsSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bg = r.getAs[String]("bg")
      assert(r.getAs[Long]("exact") == exact(bg))
      val est = (0 until S.CmsD).map(j => cells((j, bucket(j, bg)))).min
      assert(r.getAs[Long]("est") == est, s"gate/replay disagree on $bg")
    }
  }

  test("cms_sketch: matrices merge by cell-wise addition") {
    val S = operators.Sketch
    val obs = S.hhObs(spark, sf)
    val left = S.cmsCells(obs.filter(col("shard") % 2 === 0).select("bg"))
    val right = S.cmsCells(obs.filter(col("shard") % 2 =!= 0).select("bg"))
    val merged = left.unionByName(right)
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
    val whole = S.cmsCells(obs.select("bg"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "merge of the halves must equal the one-pass matrix")
  }

  test("streaming CMS: counters add across batches; single batch = batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[streaming.CmsPart]
    val query = streaming.StreamCms.cells(input.toDS())
      .writeStream.format("memory").queryName("cms_state")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(streaming.CmsPart(7, 2), streaming.CmsPart(300, 1))
      query.processAllAvailable()
      input.addData(streaming.CmsPart(7, 1), streaming.CmsPart(300, 2))
      query.processAllAvailable()
      val last = spark.table("cms_state").collect()
        .groupBy(_.getAs[Long]("cell"))
        .view.mapValues(_.map(_.getAs[Long]("cnt")).max).toMap
      assert(last == Map(7L -> 3L, 300L -> 3L))
    } finally query.stop()
  }

  test("stream_topk_space gate: brackets hold on the full observations") {
    val rows = streaming.StreamScenarios
      .streamTopkSpaceMaintain(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("lb") <= r.getAs[Long]("exact") &&
        r.getAs[Long]("exact") <= r.getAs[Long]("ub"), s"bracket: $r")
    }
  }
}
