package graft

import graft.operators.{GraphOps, Similarity, Sketch}
import org.apache.spark.sql.functions._

/** Round-6 operators: recall audits for IVF/PQ, HLL cardinality sketch,
  * triangle counting.
  */
class Round6OpsSpec extends SparkSpec {

  test("ivf/pq recall audits: bounded, k rows per probe, LSH-comparable") {
    for (df <- Seq(Similarity.ivfRecall(spark, sf),
      Similarity.pqRecall(spark, sf))) {
      val rows = df.collect()
      assert(rows.length == 10, "one row per probe")
      rows.foreach { r =>
        val (h, k) = (r.getAs[Long]("hits"), r.getAs[Long]("k"))
        assert(k == 5)
        assert(h >= 0 && h <= k)
        assert(math.abs(r.getAs[Double]("recall") - h.toDouble / k) < 1e-6)
      }
    }
    // IVF scans nprobe real cells; on this corpus its recall beats the
    // 8-bit single-bucket LSH cut on average (regression pin, not theorem)
    def mean(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg(col("recall"))).head().getDouble(0)
    assert(mean(Similarity.ivfRecall(spark, sf)) >=
      mean(Similarity.annRecall(spark, sf)) - 1e-9)
  }

  test("hll registers: 64 buckets, ranks in range, merge = pairwise max") {
    val regs = Sketch.hllRegisters(spark, sf).collect()
    assert(regs.length <= 64)
    assert(regs.map(_.getAs[Long]("bucket")).distinct.length == regs.length)
    regs.foreach { r =>
      val rank = r.getAs[Long]("maxrank")
      assert(rank >= 1 && rank <= 55, s"rank $rank out of range")
    }
    // mergeability: registers of two disjoint halves combine by max into
    // the full-corpus registers — the property that lets per-partition
    // sketches roll up without rescanning
    val grams = graft.operators.Dedup.shinglesOf(spark, sf)
      .select("sh").distinct()
      .select(expr("cast(conv(substring(md5(sh), 1, 15), 16, 10) as bigint)")
        .as("h"))
      .select((col("h") % 64).as("bucket"), expr("h div 64").as("v"))
      .select(col("bucket"), col("v"),
        when(col("v") === 0L, lit(55L))
          .otherwise(lit(55L) - length(bin(col("v")))).as("rank"))
    def regOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.groupBy(col("bucket")).agg(max(col("rank")).as("m")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = regOf(grams.filter(col("v") % 2 === 0))
    val right = regOf(grams.filter(col("v") % 2 === 1))
    val whole = regOf(grams)
    whole.foreach { case (b, m) =>
      assert(math.max(left.getOrElse(b, 0L), right.getOrElse(b, 0L)) == m,
        s"bucket $b: halves don't merge to the whole")
    }
  }

  test("hll estimate lands within the m=64 error regime of the exact count") {
    val r = Sketch.hllEstimate(spark, sf).head()
    val est = r.getAs[Double]("est_distinct")
    val exact = r.getAs[Long]("exact_distinct")
    assert(exact > 160, "domain must sit above the 2.5m correction range")
    // 1.04/sqrt(64) = 13% standard error; accept 4 sigma
    assert(r.getAs[Double]("rel_err") < 0.52,
      s"est $est vs exact $exact: rel_err ${r.getAs[Double]("rel_err")}")
  }

  test("bloom_prune: zero false negatives, fp rate inside the sizing bound") {
    val r = graft.operators.JoinShapes.bloomPrune(spark, sf).head()
    val (nExact, nPassed) = (r.getAs[Long]("n_exact_keys"),
      r.getAs[Long]("n_passed_keys"))
    // every true key passes (no false negatives): passed ⊇ exact
    assert(nPassed >= nExact)
    assert(r.getAs[Long]("n_fp_keys") == nPassed - nExact)
    assert(r.getAs[Long]("n_rows_passed") >= r.getAs[Long]("n_rows_exact"))
    // with m=8192 bits, k=3 and ~150 keys, load factor is tiny: the
    // theoretical fp ≈ (1-e^{-kn/m})^k < 0.1%; allow an order of margin
    assert(r.getAs[Double]("fp_rate") < 0.01,
      s"fp_rate ${r.getAs[Double]("fp_rate")}")
    // and the filter genuinely prunes: passed keys are a small fraction
    assert(nPassed.toDouble / r.getAs[Long]("n_cand_keys") < 0.1)
  }

  test("corpus_priority_sample: HT weight estimate is calibrated") {
    val rows = graft.operators.TrainPrep.corpusPrioritySample(spark, sf)
      .collect()
    assert(rows.length == 100)
    val tau = rows.head.getAs[Double]("tau")
    rows.foreach { r =>
      assert(r.getAs[Double]("tau") == tau, "tau is a single threshold")
      assert(r.getAs[Double]("priority") >= tau - 1e-4,
        "sampled priorities sit above the threshold")
      assert(r.getAs[Double]("w_hat") >=
        math.min(r.getAs[Long]("w").toDouble, tau) - 1e-9)
    }
    // unbiasedness in expectation: the HT sum should land near the true
    // total length (loose bound — one deterministic draw, not an average)
    val htSum = rows.map(_.getAs[Double]("w_hat")).sum
    val total = Tables.documents(spark, sf)
      .agg(sum(length(col("text")))).head().getLong(0).toDouble
    assert(htSum > total * 0.5 && htSum < total * 2.0,
      s"HT sum $htSum vs true total $total")
  }

  test("hilbert index: bijective over the grid, consecutive cells adjacent") {
    // the property that MAKES it a Hilbert curve: d -> (x,y) is a
    // bijection and consecutive indexes are always unit grid steps (no
    // Z-order seams). Proven over the full 16x16 grid with the same
    // column pipeline the gate uses at 8 bits.
    import spark.implicits._
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x, y))
      .toDF("x", "y")
    val hv = graft.operators.ZOrder.withHilbert(grid, "x", "y", 4)
      .select("x", "y", "hval").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(hv.map(_._3).sorted.toSeq == (0L until 256L),
      "hval is a bijection onto 0..255")
    val byD = hv.map { case (x, y, d) => d -> (x, y) }.toMap
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step $d -> ${d + 1}: ($x1,$y1) -> ($x2,$y2) is not a unit move")
    }
  }

  test("layout_locality: hilbert buckets are tighter than zorder's") {
    val rows = graft.operators.ZOrder.layoutLocality(spark, sf).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Double]("avg_extent"), r.getAs[Long]("max_extent"))).toMap
    val (hAvg, hMax) = rows("hilbert")
    val (zAvg, zMax) = rows("zorder")
    // the measured claim behind choosing hilbert for range layouts:
    // unit-step adjacency keeps every unaligned bucket a connected region
    assert(hAvg < zAvg, s"avg extent: hilbert $hAvg vs zorder $zAvg")
    assert(hMax < zMax, s"max extent: hilbert $hMax vs zorder $zMax")
  }

  test("customer_rfm: quintile census is complete and bounded") {
    val rows = graft.operators.Reshape.customerRfm(spark, sf).collect()
    val segs = rows.map(_.getAs[String]("segment")).distinct
    assert(segs.length == 5, "five market segments")
    rows.foreach { r =>
      Seq("r", "f", "m").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 1 && v <= 5, s"$c quintile $v out of range")
      }
      assert(r.getAs[Long]("n_customers") > 0)
    }
    // census covers every ordering customer exactly once
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val expect = Tables.orders(spark, sf).select("o_custkey").distinct()
      .join(Tables.customer(spark, sf).select(col("c_custkey").as("o_custkey")),
        "o_custkey").count()
    assert(total == expect, s"census $total vs ordering customers $expect")
  }

  test("phash_clusters: components close over the hamming pairs") {
    val pairs = graft.operators.Multimodal.phashPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val cl = graft.operators.Multimodal.phashClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Long]("csize"))).toMap
    // paired images always share a cluster; every clustered doc is in a pair
    pairs.foreach { case (a, b) =>
      assert(cl(a)._1 == cl(b)._1, s"pair ($a,$b) split across clusters")
    }
    assert(cl.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // the planted byte-copies (doc_id + 100000) sit with their source
    cl.keys.filter(_ >= 100000L).foreach { planted =>
      assert(cl(planted)._1 == cl(planted - 100000L)._1,
        s"planted copy $planted not clustered with its source")
    }
    // cluster sizes are consistent
    cl.values.groupBy(_._1).foreach { case (c, ms) =>
      assert(ms.head._2 == ms.size, s"cluster $c size mismatch")
    }
  }

  test("graph_triangles matches a brute-force count on the collected graph") {
    val rows = GraphOps.graphTriangles(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("n_tri")).toMap
    // brute force on the (small) collected kNN edge list
    val edges = Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("nbr")))
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val canon = und.filter { case (a, b) => a < b }.toSeq
    val byA = canon.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var expect = Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- canon; c <- byA.getOrElse(b, Set.empty)
         if byA.getOrElse(a, Set.empty).contains(c)) {
      expect = expect.updated(a, expect(a) + 1)
        .updated(b, expect(b) + 1).updated(c, expect(c) + 1)
    }
    assert(rows == expect.toMap.filter(_._2 > 0),
      s"${rows.size} vs ${expect.size} triangle-bearing vertices")
    assert(rows.nonEmpty, "the kNN graph closes at least one triangle")
  }
}
