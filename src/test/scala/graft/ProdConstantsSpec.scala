package graft

import graft.operators.{Clustering, Hnsw, Similarity}
import org.apache.spark.sql.functions._

/** Production-constants stress: the gates run the algebra at small knobs
  * (K=4 seeds, M=3/ef=2 HNSW, 2 LSH tables) so the oracle chains stay
  * tractable; this suite re-runs the SAME operators at the constants a
  * deployment would use — k-means|| oversampling at codebook scale over a
  * replicated corpus, HNSW navigation at M=16/ef=64, LSH at 8 tables —
  * and converts the "fixed job count / bounded round" design arguments
  * into measurements.
  */
class ProdConstantsSpec extends SparkSpec {

  /** Spark jobs launched by `f` (same isolation as ClusteringSpec). */
  private def jobsDuring(f: => Unit): Int = {
    val sc = spark.sparkContext
    val group = "prod-" + System.nanoTime()
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

  private def secs(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  test("k-means|| at codebook scale: jobs independent of l on a 16x corpus") {
    // 16× replicated corpus (8000 vectors, distinct ids), ℓ = 2·K for
    // K = 256 — the constants a production codebook trainer would use
    graft.functions.GraftFunctions.register(spark)
    val qn = Tables.embeddings(spark, sf)
      .crossJoin(spark.range(16).toDF("rep"))
      .select((col("vec_id") + col("rep") * 100000L).as("vec_id"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000 + 0.5) as bigint))")
          .as("q"))
      .withColumn("n2", expr("q_dot(q, q)"))
      .persist()
    assert(qn.count() == 8000)
    try {
      var candSmall: Long = 0L
      var candProd: Long = 0L
      val jSmall = jobsDuring {
        candSmall = Clustering.kmeansParallelCandidatesOver(qn, l = 8.0)
          .count()
      }
      var tProd = 0.0
      val jProd = jobsDuring {
        tProd = secs {
          candProd = Clustering.kmeansParallelCandidatesOver(qn, l = 512.0)
            .count()
        }
      }
      // the production claim: 64× the oversampling (K: 4 → 256) costs
      // ZERO extra corpus passes — job count identical
      assert(jSmall == jProd, s"jobs: l=8 -> $jSmall, l=512 -> $jProd")
      // and the oversampling actually scales: candidate count grows with
      // ℓ toward the codebook size (expected ≈ 1 + rounds·ℓ admits)
      assert(candProd > candSmall, s"candidates: $candSmall -> $candProd")
      assert(candProd >= 256L,
        s"l=512 over 3 rounds must oversample a K=256 codebook: $candProd")
      // bounded wall-clock per round (fixed scans, not per-seed scans):
      // generous bound — a per-seed seeder would need 256 corpus scans
      assert(tProd < 120.0, f"k-means|| at l=512 took $tProd%.1f s")
    } finally { qn.unpersist(): Unit }
  }

  test("HNSW at M=16/ef=64: bounded descent, recall never below ef=2") {
    val t = secs {
      val wide = Hnsw.navigateWith(spark, sf, beam = 64, m = 16).collect()
      val narrow = Hnsw.hnswSearchBeam(spark, sf).collect()
      def top1(rows: Array[org.apache.spark.sql.Row]): Map[Long, Double] =
        rows.filter(_.getAs[Int]("rank") == 1)
          .map(r => r.getAs[Long]("probe_id") -> r.getAs[Double]("cos")).toMap
      val w = top1(wide); val n = top1(narrow)
      assert(w.keySet == n.keySet, "same probe set at both constants")
      // widening ef 2 → 64 and M 3 → 16 must never lose the best hit
      n.foreach { case (p, c) =>
        assert(w(p) >= c, s"probe $p: ef=64 top-1 ${w(p)} < ef=2 top-1 $c")
      }
    }
    // the descent is layers × ef × M bounded joins — production constants
    // must not change the complexity class (a corpus-scan descent would
    // blow far past this bound even at harness scale)
    assert(t < 180.0, f"M=16/ef=64 navigation took $t%.1f s")
  }

  test("LSH at 8 tables: one pass, candidate coverage monotone in tables") {
    var t8 = 0.0
    val j2 = jobsDuring { Similarity.annLshMulti(spark, sf).collect(): Unit }
    var wide: Array[org.apache.spark.sql.Row] = Array.empty
    val j8 = jobsDuring {
      t8 = secs { wide = Similarity.annLshMulti(spark, sf, tables = 8)
        .collect() }
    }
    // more tables widen the posexplode, not the pass structure: the job
    // count must not grow with the table count
    assert(j8 <= j2 + 1, s"jobs: 2 tables -> $j2, 8 tables -> $j8")
    // candidate sets are supersets table-by-table, so every probe's k-th
    // best cosine is monotone non-decreasing in the table count
    val narrow = Similarity.annLshMulti(spark, sf).collect()
    def byProbe(rows: Array[org.apache.spark.sql.Row]): Map[(Long, Int), Double] =
      rows.map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rank")) ->
        r.getAs[Double]("cos")).toMap
    val w = byProbe(wide); val n = byProbe(narrow)
    n.foreach { case ((p, rk), c) =>
      w.get((p, rk)).foreach(cw =>
        assert(cw >= c, s"probe $p rank $rk: 8-table cos $cw < 2-table $c"))
    }
    assert(t8 < 120.0, f"8-table LSH took $t8%.1f s")
  }

  test("probe cap binds on a 30x corpus: audit probe count is O(1), not O(corpus)") {
    // ScaleUp-shaped 30× replication: vec_id offset by rep × 1e8 (≡ 0 mod
    // 50, so every replica preserves the 1-in-50 stratification)
    val base = Tables.embeddings(spark, sf).select(col("vec_id"))
    val nBase = base.count()
    val scaled = base.crossJoin(spark.range(30).toDF("rep"))
      .select((col("vec_id") + col("rep") * 100000000L).as("vec_id"))
    val uncapped = scaled.filter(col("vec_id") % 50 === 0).count()
    val capped = Similarity.probesOf(scaled.toDF()).count()
    val baseProbes = Similarity.probesOf(base.toDF()).count()
    // at gate scale the bound is a no-op (every stratified probe kept) —
    // the property that keeps all seven audit-family gate hashes unchanged
    assert(baseProbes == base.filter(col("vec_id") % 50 === 0).count(),
      s"cap must not bind at gate scale ($baseProbes of $nBase)")
    // at 30× the cap BINDS: the probe set stays the base corpus's sample
    // instead of growing 30× — the exact-baseline side is O(cap × corpus)
    assert(uncapped == 30 * baseProbes, s"uncapped grew to $uncapped")
    assert(capped == baseProbes,
      s"capped probe set must not grow with the corpus: $capped != $baseProbes")
    assert(baseProbes <= Similarity.ProbeCap,
      s"ProbeCap ${Similarity.ProbeCap} must sit above the gate probe count $baseProbes")
    // the lexical (doc-side) twin in Retrieval obeys the same discipline
    val docs = Tables.documents(spark, sf).select(col("doc_id"))
    val dScaled = docs.crossJoin(spark.range(30).toDF("rep"))
      .select((col("doc_id") + col("rep") * 100000000L).as("doc_id"))
    val dCapped = dScaled.filter(col("doc_id") % 50 === 0 &&
      col("doc_id") < graft.operators.Retrieval.DocProbeIdBound).count()
    val dBase = docs.filter(col("doc_id") % 50 === 0).count()
    assert(dCapped == dBase, s"doc probe cap must bind at 30x: $dCapped != $dBase")
  }

  test("probesOf emptiness guard FIRES on an offset-id corpus (r14 review: " +
    "the dropped-column assert was ColumnPruned into dead code)") {
    // every id ≡ 1 mod 50 — nonempty corpus, zero stratified probes; the
    // job must fail loudly, not return an empty probe set that every
    // recall audit would trivially "match" on
    val off = Tables.embeddings(spark, sf)
      .select((col("vec_id") * 50 + 1).as("vec_id"))
    val ex = intercept[Exception] { Similarity.probesOf(off).count() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("EMPTY probe set")),
      s"expected the probesOf guard message, got: ${msgs(ex).mkString(" | ")}")
    // and the guard stays a no-op on the real corpus (values unchanged:
    // the folded assert contributes +0 to vec_id)
    val ids = Similarity.probesOf(
        Tables.embeddings(spark, sf).select(col("vec_id")))
      .collect().map(_.getLong(0)).sorted
    assert(ids.nonEmpty && ids.forall(i => i % 50 == 0),
      s"guard fold must not perturb probe ids: ${ids.take(3).mkString(",")}")
  }
}
