package graft

import graft.operators.{Clustering, Dedup}
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  test("dedup_clusters: labels are component minima over the pair graph") {
    val pairs = Dedup.dedupMinhashLsh(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Clustering.dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap

    // reference union-find over the same edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    assert(clusters.keySet == nodes.toSet, "every paired doc is labelled")
    // min-reachable-id labels == union-find roots (roots are minima here
    // because unions always point the larger root at the smaller)
    nodes.foreach(n => assert(clusters(n) == find(n), s"label of $n"))
  }

  test("dedup_clusters: cluster sizes consistent and canonical kept") {
    val rows = Clustering.dedupClusters(spark, sf).collect()
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    rows.foreach { r =>
      assert(r.getAs[Long]("csize") ==
        byCluster(r.getAs[Long]("cluster")).length)
    }
    // each cluster's label is a member of the cluster (the canonical doc)
    byCluster.foreach { case (lab, members) =>
      assert(members.exists(_.getAs[Long]("doc_id") == lab))
      assert(members.map(_.getAs[Long]("doc_id")).min == lab)
    }
  }

  test("kmeans_embed: full assignment, clusters drawn from seed ids") {
    val rows = Clustering.kmeansEmbed(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.length == n, "every vector is assigned")
    val clusters = rows.map(_.getAs[Long]("cluster")).distinct
    assert(clusters.forall(_ % 97 == 0), "cells keep their seed ids")
    assert(clusters.length > 1, "more than one cluster survives")
  }

  test("kmeans_embed: one Lloyd step does not increase within-cluster d2") {
    // the re-assignment against updated means must give each vector a cell
    // no worse than staying put would — spot-check via mean intra-cluster
    // cosine being higher than the global mean pair cosine
    import spark.implicits._
    val asg = Clustering.kmeansEmbed(spark, sf)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val j = asg.join(e, "vec_id")
    val pairsIn = j.as("a").join(j.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .selectExpr(
        """aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
           / (sqrt(aggregate(zip_with(a.v, a.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x))
            * sqrt(aggregate(zip_with(b.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)))
           as cos""")
    val within = pairsIn.agg(avg("cos")).as[Double].head()
    assert(within > 0.0, s"within-cluster mean cosine $within should be positive")
  }

  test("pointer-jumping components agree with min-label propagation") {
    // same pair graph, both algorithms: identical component labels
    val edges = Dedup.dedupMinhashLsh(spark, sf)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val jump = Clustering.ccPointerJump(edges).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    val prop = Clustering.dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(jump == prop)
  }

  test("deep chains: jump loop collapses a 201-node chain") {
    // one-hop propagation would need 200 rounds here; the jump loop's
    // label reach doubles per round, so this finishes in ~log2(200)+2 —
    // if the loop were one-hop this test would time out, not just fail
    import spark.implicits._
    val n = 200L
    val edges = (0L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = Clustering.ccPointerJump(edges).collect()
    assert(labels.forall(_.getAs[Long]("cluster") == 0L),
      "a single chain collapses to its minimum")
    assert(labels.length == n + 1)
  }

  /** Spark jobs launched by `f`, via an isolating job group (statusTracker
    * is fed asynchronously, so poll until the count is stable).
    */
  private def jobsDuring(f: => Unit): Int = {
    val sc = spark.sparkContext
    val group = "kmpll-" + System.nanoTime()
    sc.setJobGroup(group, group)
    try f finally sc.clearJobGroup()
    var n = -1
    var stable = 0
    while (stable < 5) {
      val m = sc.statusTracker.getJobIdsForGroup(group).length
      if (m == n) stable += 1 else { n = m; stable = 0 }
      Thread.sleep(100)
    }
    n
  }

  test("kmeans||: corpus passes scale with rounds, NOT with oversampling ℓ") {
    // warm the shared memoized inputs so neither measured run pays them
    Clustering.kmeansParallel(spark, sf).collect()
    val jSmall = jobsDuring {
      Clustering.kmeansParallelCandidates(spark, sf, l = 4.0).collect(): Unit
    }
    val jBig = jobsDuring {
      Clustering.kmeansParallelCandidates(spark, sf, l = 16.0).collect(): Unit
    }
    // 4× the oversampling (∝ seed count K) must cost ZERO extra jobs —
    // the farthest-point seeder this replaces is one scan PER SEED
    assert(jSmall == jBig, s"jobs: l=4 -> $jSmall, l=16 -> $jBig")
    // ...while one extra round costs a fixed number of extra jobs
    val jMoreRounds = jobsDuring {
      Clustering.kmeansParallelCandidates(spark, sf, l = 4.0,
        rounds = 4).collect(): Unit
    }
    assert(jMoreRounds > jSmall, s"rounds=4 -> $jMoreRounds vs $jSmall")
  }

  test("kmeans||: candidates cover the corpus, weights partition it") {
    val cand = Clustering.kmeansParallel(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(cand.map(_.getAs[Long]("weight")).sum == n,
      "every vector is assigned to exactly one candidate")
    assert(cand.map(_.getAs[Long]("round")).forall(r => r >= 0 && r <= 3))
    val first = cand.minBy(_.getAs[Long]("cand_id"))
    assert(first.getAs[Long]("round") == 0, "round-0 seed is the min vec_id")
    assert(cand.length >= 4, "oversampling yields at least K candidates")
  }

  test("kmeans|| seeds: heaviest-first weighted maxmin over candidates") {
    val cand = Clustering.kmeansParallel(spark, sf).collect()
      .map(r => r.getAs[Long]("cand_id") -> r.getAs[Long]("weight")).toMap
    val seeds = Clustering.kmeansParallelSeeds(spark, sf).collect()
    assert(seeds.length == 4)
    val ids = seeds.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 4, "seeds are distinct")
    assert(ids.forall(cand.contains), "seeds come from the candidate set")
    val maxW = cand.values.max
    val rank0 = seeds.find(_.getAs[Long]("rank") == 0L).get
    assert(cand(rank0.getAs[Long]("vec_id")) == maxW,
      "rank-0 seed is the heaviest candidate")
  }

  test("kmeans||-seeded Lloyd: full assignment, cells drawn from the seeds") {
    val seedIds = Clustering.kmeansParallelSeeds(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val asg = Clustering.kmeansEmbedWithPllSeeds(spark, sf).collect()
    assert(asg.length == Tables.embeddings(spark, sf).count())
    assert(asg.map(_.getAs[Long]("vec_id")).distinct.length == asg.length)
    assert(asg.map(_.getAs[Long]("cluster")).toSet.subsetOf(seedIds))
  }

  test("dedup_semantic: one row per vector, canonical survivor kept") {
    val rows = Clustering.dedupSemantic(spark, sf).collect()
    assert(rows.length == 500)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 500)
    assert(rows.forall(r => Set(0L, 1L)(r.getAs[Long]("keep"))))
    val dropped = rows.count(_.getAs[Long]("keep") == 0L)
    assert(dropped > 0, "threshold should fire on the synthetic corpus")
    // the lowest vec_id of every cluster has no lower-id partner, so it is
    // always the kept canonical representative
    rows.groupBy(_.getAs[Long]("cluster")).foreach { case (c, g) =>
      val lowest = g.minBy(_.getAs[Long]("vec_id"))
      assert(lowest.getAs[Long]("keep") == 1L, s"cluster $c")
    }
  }

  test("doc_prune_proto: the most prototypical quarter per cluster prunes") {
    val rows = Clustering.docPruneProto(spark, sf).collect()
    assert(rows.nonEmpty)
    // exactly one row per corpus vector
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (c, members) =>
      val n = members.length
      val pruned = members.filter(_.getAs[Long]("pruned") == 1L)
      assert(pruned.length == (n + 3) / 4,
        s"cluster $c: ${pruned.length} pruned of $n")
      // ranks are a 1..n permutation ordered by (score, vec_id)
      val byRank = members.sortBy(_.getAs[Int]("proto_rank"))
      assert(byRank.map(_.getAs[Int]("proto_rank")).toSeq == (1 to n))
      val keys = byRank.map(r =>
        (r.getAs[Long]("score"), r.getAs[Long]("vec_id")))
      assert(keys.zip(keys.tail).forall { case (a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) })
      // pruned set = the lowest-score prefix: every pruned score <= kept
      val kept = members.filter(_.getAs[Long]("pruned") == 0L)
      if (pruned.nonEmpty && kept.nonEmpty)
        assert(pruned.map(_.getAs[Long]("score")).max <=
          kept.map(_.getAs[Long]("score")).min)
    }
  }

  test("doc_prune_proto: scores are the c^2-scaled squared distances " +
    "(cluster total matches the SSE identity)") {
    // sum over members of (n2*c^2 - 2c*dot(q,s) + s2) = c^2*sum(n2) - c*s2
    val rows = Clustering.docPruneProto(spark, sf)
      .select("vec_id", "cluster", "score").collect()
    val qn = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000 + 0.5) as bigint))").as("q"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Long](r.fieldIndex("q")).toArray).toMap
    rows.groupBy(_.getAs[Long]("cluster")).foreach { case (_, members) =>
      val qs = members.map(m => qn(m.getAs[Long]("vec_id")))
      val c = members.length.toLong
      val dim = qs.head.length
      val s = Array.tabulate(dim)(i => qs.map(_(i)).sum)
      val s2 = s.map(x => x * x).sum
      val sumN2 = qs.map(_.map(x => x * x).sum).sum
      val expect = c * c * sumN2 - c * s2
      assert(members.map(_.getAs[Long]("score")).sum == expect)
    }
  }

  test("embed_pca_power: the gate replays bit-for-bit locally and the " +
    "Rayleigh quotient converges to the dominant eigenvalue") {
    // local replay of the exact integer algorithm
    val q = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding"))
          .map(x => math.floor(x.toDouble * 128 + 0.5).toLong).toArray)
      .sortBy(_._1)
    val dim = q.head._2.length
    var v = Array.fill(dim)(1L)
    def floordiv(x: Long, p: Long): Long = (x - ((x % p + p) % p)) / p
    for (_ <- 1 to 12) {
      val w = Array.fill(dim)(0L)
      for ((_, qi) <- q) {
        var t = 0L
        var i = 0
        while (i < dim) { t += qi(i) * v(i); i += 1 }
        i = 0
        while (i < dim) { w(i) += qi(i) * t; i += 1 }
      }
      val maxabs = w.map(math.abs).max
      val s = math.max(0, java.lang.Long.toBinaryString(maxabs).length - 12)
      val p2 = 1L << s
      v = w.map(floordiv(_, p2))
    }
    val imax = v.indices.minBy(i => (-math.abs(v(i)), i))
    val g = if (v(imax) < 0) -1L else 1L
    val expect = q.map { case (id, qi) =>
      id -> g * qi.zip(v).map { case (a, b) => a * b }.sum
    }.toMap
    val rows = Clustering.embedPcaPower(spark, sf).collect()
    assert(rows.length == q.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("proj") == expect(r.getAs[Long]("vec_id")),
        s"projection mismatch at vec ${r.getAs[Long]("vec_id")}")
    }
    // convergence: the Rayleigh quotient of the integer iterate must land
    // within 10% of the dominant eigenvalue (direction itself needs an
    // eigengap these flat synthetic embeddings don't have — λ2/λ1 ≈ 0.93)
    val gram = Array.ofDim[Double](dim, dim)
    for ((_, qi) <- q; i <- 0 until dim; j <- 0 until dim)
      gram(i)(j) += qi(i).toDouble * qi(j).toDouble
    def rayleigh(x: Array[Double]): Double = {
      val gx = Array.tabulate(dim)(i =>
        (0 until dim).map(j => gram(i)(j) * x(j)).sum)
      x.zip(gx).map { case (a, b) => a * b }.sum /
        x.map(a => a * a).sum
    }
    var u = Array.fill(dim)(1.0)
    for (_ <- 1 to 300) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => gram(i)(j) * u(j)).sum)
      val n = math.sqrt(w.map(x => x * x).sum)
      u = w.map(_ / n)
    }
    val l1 = rayleigh(u)
    val rv = rayleigh(v.map(_.toDouble))
    assert(rv >= 0.9 * l1, s"Rayleigh quotient did not converge: $rv vs $l1")
    assert(rv > rayleigh(Array.fill(dim)(1.0)),
      "iteration must improve on the start vector")
  }

  // ---- shared local replay helpers of the PCA gate family ----
  private def pcaQ(): Array[(Long, Array[Long])] =
    graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding"))
          .map(x => math.floor(x.toDouble * 128 + 0.5).toLong).toArray)
      .sortBy(_._1)

  private def fdiv(x: Long, p: Long): Long = (x - ((x % p + p) % p)) / p

  private def bits(x: Long): Int = java.lang.Long.toBinaryString(x).length

  /** Local replay of the 12-round integer power loop; `partBits` != 0
    * replays the two-level variant (shard = vec_id % 4, partial sums
    * downscaled to partBits before the cross-shard add). Returns the
    * converged direction and whether any partial-sum cut fired.
    */
  private def pcaLocalLoop(q: Array[(Long, Array[Long])],
                           partBits: Int = 0): (Array[Long], Boolean) = {
    val dim = q.head._2.length
    var v = Array.fill(dim)(1L)
    var cutFired = false
    for (_ <- 1 to 12) {
      val w = Array.fill(dim)(0L)
      if (partBits == 0) {
        for ((_, qi) <- q) {
          var t = 0L; var i = 0
          while (i < dim) { t += qi(i) * v(i); i += 1 }
          i = 0
          while (i < dim) { w(i) += qi(i) * t; i += 1 }
        }
      } else {
        val part = Array.fill(4, dim)(0L)
        for ((id, qi) <- q) {
          val sh = (id % 4).toInt
          var t = 0L; var i = 0
          while (i < dim) { t += qi(i) * v(i); i += 1 }
          i = 0
          while (i < dim) { part(sh)(i) += qi(i) * t; i += 1 }
        }
        val m = part.flatMap(_.map(math.abs)).max
        val pp = 1L << math.max(0, bits(m) - partBits)
        if (pp > 1) cutFired = true
        for (sh <- 0 until 4; i <- 0 until dim) w(i) += fdiv(part(sh)(i), pp)
      }
      val p2 = 1L << math.max(0, bits(w.map(math.abs).max) - 12)
      v = w.map(fdiv(_, p2))
    }
    (v, cutFired)
  }

  private def pcaSignOf(v: Array[Long]): Long = {
    val imax = v.indices.minBy(i => (-math.abs(v(i)), i))
    if (v(imax) < 0) -1L else 1L
  }

  test("embed_pca_deflate: scaled deflation replays bit-for-bit, is " +
    "exactly orthogonal pre-downscale, and the second direction converges") {
    val q = pcaQ()
    val dim = q.head._2.length
    val (v1, _) = pcaLocalLoop(q)
    val nv = v1.map(x => x * x).sum
    // scaled deflation: q' = q·⟨v1,v1⟩ − ⟨q,v1⟩·v1, exactly ⊥ v1
    val w = q.map { case (id, qi) =>
      val t = qi.zip(v1).map { case (a, b) => a * b }.sum
      id -> qi.indices.map(i => qi(i) * nv - t * v1(i)).toArray
    }
    w.foreach { case (id, wi) =>
      assert(wi.zip(v1).map { case (a, b) => a * b }.sum == 0L,
        s"deflated vector $id not orthogonal to v1")
    }
    val m = w.flatMap(_._2.map(math.abs)).max
    val pd = 1L << math.max(0, bits(m) - 18)
    val q2 = w.map { case (id, wi) => id -> wi.map(fdiv(_, pd)) }
    val (v2, _) = pcaLocalLoop(q2)
    val g = pcaSignOf(v2)
    val expect = q2.map { case (id, qi) =>
      id -> g * qi.zip(v2).map { case (a, b) => a * b }.sum
    }.toMap
    val rows = Clustering.embedPcaDeflate(spark, sf).collect()
    assert(rows.length == q.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("proj2") == expect(r.getAs[Long]("vec_id")),
        s"proj2 mismatch at vec ${r.getAs[Long]("vec_id")}")
    }
    // convergence on the DEFLATED Gram: same Rayleigh criterion as the
    // top-direction spec, against ITS dominant eigenvalue
    val gram = Array.ofDim[Double](dim, dim)
    for ((_, qi) <- q2; i <- 0 until dim; j <- 0 until dim)
      gram(i)(j) += qi(i).toDouble * qi(j).toDouble
    def rayleigh(x: Array[Double]): Double = {
      val gx = Array.tabulate(dim)(i =>
        (0 until dim).map(j => gram(i)(j) * x(j)).sum)
      x.zip(gx).map { case (a, b) => a * b }.sum / x.map(a => a * a).sum
    }
    var u = Array.fill(dim)(1.0)
    for (_ <- 1 to 300) {
      val t = Array.tabulate(dim)(i =>
        (0 until dim).map(j => gram(i)(j) * u(j)).sum)
      val n = math.sqrt(t.map(x => x * x).sum)
      u = t.map(_ / n)
    }
    val l1 = rayleigh(u)
    val rv = rayleigh(v2.map(_.toDouble))
    assert(rv >= 0.9 * l1, s"second direction did not converge: $rv vs $l1")
    // the second direction is a genuinely NEW direction: near-orthogonal
    // to the first (the deflated space is exactly ⊥ v1 pre-downscale;
    // only the 2^-18 quantization leaks back — measured |cos| < 2e-4).
    // NOT asserted: R₀(v2) < R₀(v1) — with this flat spectrum
    // (λ2/λ1 ≈ 0.93) the truncated iterate v1 is not the exact top
    // eigenvector, so the orthogonal complement can legitimately hold a
    // direction scoring higher on the original Gram.
    val cos12 = v1.zip(v2).map { case (a, b) => a.toDouble * b }.sum /
      math.sqrt(v1.map(x => x.toDouble * x).sum *
        v2.map(x => x.toDouble * x).sum)
    assert(math.abs(cos12) < 0.01,
      s"second direction not orthogonal to the first: cos=$cos12")
  }

  /** Local replay of one scaled-deflation step. */
  private def pcaLocalDeflate(q: Array[(Long, Array[Long])],
                              v: Array[Long]): Array[(Long, Array[Long])] = {
    val nv = v.map(x => x * x).sum
    val w = q.map { case (id, qi) =>
      val t = qi.zip(v).map { case (a, b) => a * b }.sum
      id -> qi.indices.map(i => qi(i) * nv - t * v(i)).toArray
    }
    val m = w.flatMap(_._2.map(math.abs)).max
    val pd = 1L << math.max(0, bits(m) - 18)
    w.map { case (id, wi) => id -> wi.map(fdiv(_, pd)) }
  }

  test("embed_pca_third: twice-deflated power run replays bit-for-bit " +
    "and the third direction is new") {
    val q = pcaQ()
    val (v1, _) = pcaLocalLoop(q)
    val q2 = pcaLocalDeflate(q, v1)
    val (v2, _) = pcaLocalLoop(q2)
    val q3 = pcaLocalDeflate(q2, v2)
    val (v3, _) = pcaLocalLoop(q3)
    val g = pcaSignOf(v3)
    val expect = q3.map { case (id, qi) =>
      id -> g * qi.zip(v3).map { case (a, b) => a * b }.sum
    }.toMap
    val rows = Clustering.embedPcaThird(spark, sf).collect()
    assert(rows.length == q.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("proj3") == expect(r.getAs[Long]("vec_id")),
        s"proj3 mismatch at vec ${r.getAs[Long]("vec_id")}")
    }
    def cos(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum /
        math.sqrt(a.map(x => x.toDouble * x).sum *
          b.map(x => x.toDouble * x).sum)
    assert(math.abs(cos(v3, v2)) < 0.01,
      s"third direction not orthogonal to second: ${cos(v3, v2)}")
    assert(math.abs(cos(v3, v1)) < 0.02,
      s"third direction not orthogonal to first: ${cos(v3, v1)}")
  }

  test("embed_pca_twolevel: two-level partial-sum scaling replays " +
    "bit-for-bit, the cut fires at this scale, and the direction agrees") {
    val q = pcaQ()
    val (v2l, cutFired) = pcaLocalLoop(q, partBits = 24)
    assert(cutFired,
      "PcaPartBits must be low enough that the shard cut fires at test " +
        "scale — otherwise the gate exercises nothing")
    val g = pcaSignOf(v2l)
    val expect = q.map { case (id, qi) =>
      id -> g * qi.zip(v2l).map { case (a, b) => a * b }.sum
    }.toMap
    val rows = Clustering.embedPcaTwoLevel(spark, sf).collect()
    assert(rows.length == q.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("proj") == expect(r.getAs[Long]("vec_id")),
        s"proj mismatch at vec ${r.getAs[Long]("vec_id")}")
    }
    // the quantized partial sums must not move the direction: cosine with
    // the single-level iterate stays ≈ 1
    val (v1l, _) = pcaLocalLoop(q)
    val dot = v1l.zip(v2l).map { case (a, b) => a.toDouble * b.toDouble }.sum
    val cos = dot / math.sqrt(v1l.map(x => x.toDouble * x).sum *
      v2l.map(x => x.toDouble * x).sum)
    assert(cos >= 0.98, s"two-level direction drifted: cos=$cos")
  }

  test("dedup_cascade: stages fire in cost order with honest attribution") {
    val rows = Clustering.dedupCascade(spark, sf).collect()
    val n = graft.Tables.documents(spark, sf).count()
    assert(rows.length == n + rows.count(_.getAs[Long]("doc_id") >= 100000))
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // every planted copy is removed at the exact stage by a base doc
    rows.filter(_.getAs[Long]("doc_id") >= 100000).foreach { r =>
      assert(r.getAs[String]("stage") == "exact", s"planted not exact: $r")
      assert(r.getAs[Long]("by_id") < 100000)
    }
    // removed docs point at a lower-id partner; kept docs at nothing
    rows.foreach { r =>
      if (r.getAs[String]("stage") == "kept") assert(r.isNullAt(2))
      else assert(r.getAs[Long]("by_id") < r.getAs[Long]("doc_id"))
    }
    // near-removals are real verified pairs whose partner SURVIVED exact
    val pairs = operators.Dedup.dedupMinhashLsh(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.filter(_.getAs[String]("stage") == "near").foreach { r =>
      val (id, by) = (r.getAs[Long]("doc_id"), r.getAs[Long]("by_id"))
      assert(pairs.contains((by, id)), s"near pair ($by,$id) not verified")
      assert(byId(by).getAs[String]("stage") != "exact",
        "near partner must have survived stage 1")
    }
    // the cascade genuinely fires beyond stage 1 on this corpus
    assert(rows.exists(_.getAs[String]("stage") == "near") ||
      rows.exists(_.getAs[String]("stage") == "semantic"))
  }
}
