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
    // allocation identity: total ≤ budget, and the shortfall is exactly
    // the floor-division leftover — strictly less than the number of
    // unsaturated sources (each gets ⌊R/m⌋, so R − m·⌊R/m⌋ < m)
    val total = rows.map(_.getAs[Long]("alloc_tokens")).sum
    val nUnsat = rows.count(!_.getAs[Boolean]("saturated"))
    assert(total <= budget && budget - total < nUnsat.toLong,
      s"shortfall ${budget - total} not < $nUnsat unsaturated sources")
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
  test("mm_interleave: structure replays locally, token accounting exact") {
    val rows = operators.Multimodal.mmInterleave(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(
            graft.operators.TextNorm.norm, " ")).as("nw"))
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("nw")).toMap
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nw = docs(id).toLong
      val ps = if (id % 3 == 0)
        Seq(id % (nw + 1), (id * 7) % (nw + 1)).distinct.sorted
      else Seq.empty[Long]
      assert(r.getAs[Long]("n_images") == ps.length)
      assert(r.getAs[Long]("n_text_tokens") == nw)
      assert(r.getAs[Long]("n_total_tokens") == nw + 64L * ps.length)
      // local segment-string replay
      val bounds = 0L +: ps :+ nw
      val parts = bounds.sliding(2).zipWithIndex.flatMap { case (Seq(a, b), i) =>
        val t = if (b - a > 0) Seq(s"T:${b - a}") else Nil
        val img = if (i < ps.length) Seq("I") else Nil
        t ++ img
      }.toSeq
      assert(r.getAs[String]("structure") == parts.mkString(","),
        s"structure mismatch at doc $id")
    }
    // both shapes appear: interleaved docs and pure-text docs
    assert(rows.exists(_.getAs[Long]("n_images") > 0))
    assert(rows.exists(_.getAs[Long]("n_images") == 0))
  }

  test("pack_attention_spans: spans are contiguous, totals match the " +
    "pack assignment") {
    val spans = operators.TextOps.packAttentionSpans(spark, sf).collect()
    val pack = operators.TextOps.packSequences(spark, sf).collect()
      .groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("seq_id")))
    assert(spans.nonEmpty && spans.length == pack.size)
    spans.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[Long]("seq_id"))
      val docs = pack(key)
      assert(r.getAs[Long]("n_docs") == docs.length)
      assert(r.getAs[Long]("n_tokens") ==
        docs.map(_.getAs[Int]("n_tokens").toLong).sum)
      val sp = r.getAs[String]("spans").split(",").map { t =>
        val Array(a, b) = t.split(":"); (a.toLong, b.toLong)
      }
      assert(sp.length == docs.length)
      // contiguity: each doc starts where the previous one ends
      sp.sliding(2).foreach {
        case Array((s1, l1), (s2, _)) => assert(s2 == s1 + l1)
        case _ =>
      }
      assert(sp.head._1 >= 0 && sp.head._1 < 2048)
      assert(r.getAs[Long]("max_span") == sp.map(_._2).max)
    }
  }
  test("tokenizer_parity: counts equal each tokenizer's own gate, " +
    "fertility and winner replay locally") {
    val rows = operators.Unigram.tokenizerParity(spark, sf).collect()
    val b = operators.Bpe.tokenizeBpe(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))).toMap
    val u = operators.Unigram.tokenizeUnigram(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_pieces")).toMap
    assert(rows.length == b.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nw, nb) = b(id)
      val nu = u(id)
      assert(r.getAs[Long]("n_bpe_tokens") == nb)
      assert(r.getAs[Long]("n_unigram_pieces") == nu)
      assert(r.getAs[Long]("fert_bpe_q6") == nb * 1000000L / nw)
      assert(r.getAs[Long]("fert_ug_q6") == nu * 1000000L / nw)
      val win = if (nb < nu) "bpe" else if (nu < nb) "unigram" else "tie"
      assert(r.getAs[String]("winner") == win)
    }
    // the comparison has signal: not every document ties
    assert(rows.exists(_.getAs[String]("winner") != "tie"))
  }
  test("source_card: volumes, PII and near-dup exposure replay from " +
    "the component gates") {
    val rows = operators.Quality.sourceCard(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length)
    val bySrc = docs.groupBy(_._2)
    val ndIds = operators.Dedup.dedupMinhashLsh(spark, sf).collect()
      .flatMap(r => Seq(r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ids = bySrc(src).map(_._1)
      assert(r.getAs[Long]("n_docs") == ids.length)
      // PII flag from the planting arithmetic (the oracle's derivation);
      // the gate detects by regex — agreement is the point
      val pii = ids.count(d => d % 7 == 0 || d % 5 == 0 || d % 9 == 0 ||
        d % 11 == 0)
      assert(r.getAs[Long]("n_pii_docs") == pii)
      assert(r.getAs[Long]("n_neardup_docs") == ids.count(ndIds))
    }
    // quality and duplication signals are alive at this scale
    assert(rows.map(_.getAs[Long]("n_neardup_docs")).sum > 0)
    assert(rows.forall(_.getAs[Long]("mean_quality_q6") > 0))
  }
  test("doc_truncate: middle-out cut replays locally, short docs " +
    "pass through") {
    val rows = TrainPrep.docTruncate(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.operators.TextNorm.norm.as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { r =>
      val ws = docs(r.getAs[Long]("doc_id")).split(" ")
      val kept =
        if (ws.length <= 64) ws
        else ws.take(40) ++ Array("<TRUNC>") ++ ws.takeRight(24)
      assert(r.getAs[Boolean]("truncated") == (ws.length > 64))
      assert(r.getAs[Long]("n_kept") == kept.length)
      assert(r.getAs[String]("trunc_hash") == md5(kept.mkString(" ")))
    }
    assert(rows.exists(_.getAs[Boolean]("truncated")))
    assert(rows.exists(!_.getAs[Boolean]("truncated")))
  }

  test("corpus_anneal: phase 2 re-exposes exactly the top quality " +
    "fifth, positions contiguous per (phase, shard)") {
    val rows = TrainPrep.corpusAnneal(spark, sf).collect()
    val q = TextOps.textQuality(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        math.round(r.getAs[Double]("quality") * 1000000)))
    val n = q.length
    val expectAnneal = q.sortBy { case (id, q6) => (-q6, id) }
      .take(n / 5).map(_._1).toSet
    val p1 = rows.filter(_.getAs[Int]("phase") == 1)
    val p2 = rows.filter(_.getAs[Int]("phase") == 2)
    assert(p1.length == n && p2.length == n / 5)
    assert(p2.map(_.getAs[Long]("doc_id")).toSet == expectAnneal)
    rows.groupBy(r => (r.getAs[Int]("phase"), r.getAs[Long]("shard")))
      .foreach { case (_, g) =>
        val ps = g.map(_.getAs[Long]("position")).sorted
        assert(ps.head == 1L && ps.last == ps.length,
          "positions must be 1..k per (phase, shard)")
      }
  }
}
