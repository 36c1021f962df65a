package graft

class RetrievalSpec extends SparkSpec {

  test("hybrid_rrf: fused ranks are dense and rrf-descending per probe") {
    val rows = operators.Retrieval.hybridRrf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq ==
        (1 to sorted.length))
      val scores = sorted.map(_.getAs[Double]("rrf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("hybrid_rrf: the score is exactly the sum of the two reciprocals") {
    val rows = operators.Retrieval.hybridRrf(spark, sf).collect()
    rows.foreach { r =>
      val vr = r.getAs[Int]("vrank")
      val lr = r.getAs[Int]("lrank")
      assert(vr > 0 || lr > 0, "a fused candidate came from some list")
      val want = (if (vr > 0) 1.0 / (60 + vr) else 0.0) +
        (if (lr > 0) 1.0 / (60 + lr) else 0.0)
      assert(math.abs(r.getAs[Double]("rrf") - want) < 5e-7,
        s"rrf mismatch: $r vs $want")
    }
  }

  test("hybrid_rrf: a candidate in both lists outranks any single-list one") {
    // with k = 10 lists and the standard constant 60, the worst both-list
    // score 2/70 exceeds the best single-list score 1/61 — fusion always
    // prefers agreement, the property RRF is used for
    val rows = operators.Retrieval.hybridRrf(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, rs) =>
      val both = rs.filter(r =>
        r.getAs[Int]("vrank") > 0 && r.getAs[Int]("lrank") > 0)
      val single = rs.filter(r =>
        r.getAs[Int]("vrank") == 0 || r.getAs[Int]("lrank") == 0)
      for (b <- both; s <- single)
        assert(b.getAs[Int]("rank") < s.getAs[Int]("rank"),
          s"probe $p: both-list $b ranked below single-list $s")
    }
  }

  test("hybrid_rrf: probe side broadcasts, top-k cuts map-side") {
    val p = operators.Retrieval.hybridRrf(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      "the probe shingle set must broadcast")
    assert(p.contains("WindowGroupLimit"),
      "per-probe list cuts must reduce map-side")
    assert(!p.contains("CartesianProduct"))
  }
}
