package graft

import graft.operators.{TextOps, TrainPrep}

class Round11OpsSpec extends SparkSpec {

  test("corpus_epochs: exact waterfilling — local replay, budget " +
    "identity, both branches exercised") {
    val rows = TrainPrep.corpusEpochs(spark, sf).collect()
    assert(rows.nonEmpty)
    val caps = rows.map(r => (r.getAs[String]("source"),
      r.getAs[Long]("cap_tokens"))).toMap
    val budget = rows.map(_.getAs[Long]("n_tokens")).sum * 3
    // local iterative waterfilling (the paper's loop) must agree with
    // the closed-form prefix criterion the gate uses
    var remaining = budget
    var active = caps.keys.toSet
    var alloc = Map.empty[String, Long]
    var changed = true
    while (changed) {
      changed = false
      // rational comparison (cap·m < R), matching the gate's integer
      // criterion exactly — floor(R/m) would misclassify cap == ⌊R/m⌋
      // with a nonzero remainder
      val sat = active.filter(s => caps(s) * active.size < remaining)
      if (sat.nonEmpty) {
        sat.foreach { s => alloc += s -> caps(s); remaining -= caps(s) }
        active --= sat
        changed = true
      }
    }
    val share = remaining / math.max(1, active.size)
    active.foreach(s => alloc += s -> share)
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("alloc_tokens") == alloc(s),
        s"waterfill mismatch at $s")
      assert(r.getAs[Boolean]("saturated") == !active.contains(s),
        s"saturation flag mismatch at $s")
    }
    // allocation identity: total ≤ budget, shortfall < residual share
    val total = rows.map(_.getAs[Long]("alloc_tokens")).sum
    assert(total <= budget && budget - total < budget)
    // the planted heterogeneous caps exercise both branches
    assert(rows.exists(_.getAs[Boolean]("saturated")))
    assert(rows.exists(!_.getAs[Boolean]("saturated")))
    // unsaturated sources all share one allocation
    val un = rows.filter(!_.getAs[Boolean]("saturated"))
      .map(_.getAs[Long]("alloc_tokens")).distinct
    assert(un.length == 1)
    // saturated sources sit exactly at cap = e_cap·n_tokens
    rows.filter(_.getAs[Boolean]("saturated")).foreach { r =>
      assert(r.getAs[Long]("alloc_tokens") ==
        r.getAs[Long]("e_cap") * r.getAs[Long]("n_tokens"))
      assert(r.getAs[Double]("epochs") == r.getAs[Long]("e_cap").toDouble)
    }
  }

  test("quality_tradeoff: curve is monotone, endpoints match the corpus, " +
    "local replay agrees") {
    val rows = TrainPrep.qualityTradeoff(spark, sf).collect()
      .sortBy(_.getAs[Double]("tau"))
    assert(rows.length == 10)
    val q = TextOps.textQuality(spark, sf).collect()
      .map(r => (math.round(r.getAs[Double]("quality") * 1000000),
        r.getAs[Int]("n_words").toLong))
    // τ = 0 keeps everything
    assert(rows.head.getAs[Long]("n_docs_kept") == q.length)
    assert(rows.head.getAs[Double]("frac_docs") == 1.0)
    // kept counts are non-increasing in τ
    val kept = rows.map(_.getAs[Long]("n_docs_kept"))
    assert(kept.zip(kept.tail).forall { case (a, b) => a >= b })
    // local replay of every threshold
    rows.zipWithIndex.foreach { case (r, k) =>
      val keep = q.filter(_._1 >= k * 100000L)
      assert(r.getAs[Long]("n_docs_kept") == keep.length)
      assert(r.getAs[Long]("n_tokens_kept") == keep.map(_._2).sum)
      val mean = if (keep.isEmpty) 0L else keep.map(_._1).sum / keep.length
      assert(r.getAs[Long]("mean_quality_q6") == mean)
    }
    // kept-mean quality is non-decreasing in τ (where documents survive)
    val means = rows.filter(_.getAs[Long]("n_docs_kept") > 0)
      .map(_.getAs[Long]("mean_quality_q6"))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b })
  }
}
