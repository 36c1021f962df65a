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

  test("hybrid_rrf_ann: the indexed fusion keeps most of the exact fusion") {
    def lists(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getAs[Long]("probe_id"))
        .view.mapValues(_.map(_.getAs[Long]("cand")).toSet).toMap
    val exact = lists(operators.Retrieval.hybridRrf(spark, sf))
    val ann = lists(operators.Retrieval.hybridRrfAnn(spark, sf))
    assert(ann.keySet == exact.keySet, "same probes on both paths")
    // the lexical list is identical on both paths, so fused overlap is
    // bounded below by the lexical contribution even where the single-
    // table LSH misses vector neighbours; measure the fused recall the
    // deployment would watch
    val overlaps = exact.keys.toSeq.map { p =>
      exact(p).intersect(ann(p)).size.toDouble / exact(p).size
    }
    val mean = overlaps.sum / overlaps.size
    assert(mean >= 0.5, f"fused recall $mean%.2f collapsed — index too lossy")
  }

  test("mmr_rerank: the greedy walk replays exactly from raw embeddings") {
    import org.apache.spark.sql.functions.col
    val fused = operators.Retrieval.hybridRrf(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand"),
        r.getAs[Double]("rrf")))
    val emb = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding"))
          .map(x => math.floor(x.toDouble * 1e7 + 0.5).toLong)).toMap
    def cos(a: Long, b: Long): Double = {
      val (qa, qb) = (emb(a), emb(b))
      val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
      val na = qa.map(x => x * x).sum
      val nb = qb.map(x => x * x).sum
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val want = fused.groupBy(_._1).toSeq.flatMap { case (p, cs) =>
      val cands = cs.map(c => c._2 -> c._3).toMap
      var sel = Vector.empty[(Long, Double)]
      val first = cands.toSeq.minBy { case (c, r) => (-r, c) }
      sel :+= (first._1, 0.5 * first._2)
      while (sel.length < 5) {
        val rest = cands.keys.filterNot(sel.map(_._1).contains)
        val pick = rest.map { c =>
          val ms = sel.map(s => cos(c, s._1)).max
          c -> (0.5 * cands(c) - 0.5 * ms)
        }.minBy { case (c, m) => (-m, c) }
        sel :+= pick
      }
      sel.zipWithIndex.map { case ((c, m), i) => (p, i + 1, c, m) }
    }.toSet
    val got = operators.Retrieval.mmrRerank(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("step"),
        r.getAs[Long]("cand"), r.getAs[Double]("mmr"))).toSet
    assert(got.map(t => (t._1, t._2, t._3)) ==
      want.map(t => (t._1, t._2, t._3)),
      "selection order must equal the local greedy replay")
    val wantScores = want.map(t => (t._1, t._2) -> t._4).toMap
    got.foreach { case (p, k, _, m) =>
      assert(math.abs(m - wantScores((p, k))) < 5e-6,
        s"probe $p step $k score $m vs ${wantScores((p, k))}")
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
