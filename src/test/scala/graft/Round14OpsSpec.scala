package graft

import graft.streaming.{EdgeObs, KnPart, StreamCluster, StreamKn}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Round-14 operator specs: the composed end-to-end pipeline ledger.
  * The driver's oracle gate checks values; these pin the STAGE-CONTRACT
  * arithmetic a hash can't articulate — conservation, hand-off equality,
  * and an independent local replay of the head stages.
  */
class Round14OpsSpec extends SparkSpec {

  private lazy val ledger: Array[Row] =
    operators.Pipeline.pipelineE2e(spark, sf).collect()

  private def detail(r: Row): Map[String, Long] =
    r.getAs[String]("detail").split(",")
      .map(_.split("=")).map(kv => kv(0) -> kv(1).toLong).toMap

  test("pipeline_e2e: stage chain shape and hand-off equality") {
    assert(ledger.length == 9)
    assert(ledger.map(_.getAs[String]("stage")).toSeq == Seq("extract",
      "quality", "dedup_exact", "near_dedup", "decontaminate", "split",
      "truncate", "pack", "shard"))
    for (r <- ledger) {
      // conservation: in = kept + dropped, nothing negative
      assert(r.getAs[Long]("docs_in") ==
        r.getAs[Long]("docs_kept") + r.getAs[Long]("docs_dropped"))
      assert(r.getAs[Long]("docs_dropped") >= 0)
      // no stage mints tokens
      assert(r.getAs[Long]("tokens_out") <= r.getAs[Long]("tokens_in"))
    }
    // the hand-off: stage k's input IS stage k-1's survivors
    for (k <- 1 until 9) {
      assert(ledger(k).getAs[Long]("docs_in") ==
        ledger(k - 1).getAs[Long]("docs_kept"),
        s"stage $k docs hand-off")
      assert(ledger(k).getAs[Long]("tokens_in") ==
        ledger(k - 1).getAs[Long]("tokens_out"),
        s"stage $k tokens hand-off")
    }
    // split, pack and shard recategorize — they must not drop anything
    for (k <- Seq(5, 7, 8)) {
      assert(ledger(k).getAs[Long]("docs_dropped") == 0L)
      assert(ledger(k).getAs[Long]("tokens_out") ==
        ledger(k).getAs[Long]("tokens_in"))
    }
  }

  test("pipeline_e2e: head stages replay locally (extract/quality/exact)") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.trim.replaceAll("\\s+", " "))
    // extract: raw + the mod-5 duplicate feed
    val planted = docs.filter(_._1 % 5 == 0)
      .map { case (id, t) => (id + 100000L, t) }
    val union = docs ++ planted
    assert(ledger(0).getAs[Long]("docs_in") == union.length)
    assert(detail(ledger(0))("planted") == planted.length)
    assert(ledger(0).getAs[Long]("tokens_in") ==
      union.map(_._2.split(" ").length.toLong).sum)
    // quality: the Gopher rule suite with the original-id augmentation
    val stop = operators.Stoplists.en.toSet
    def verdict(id: Long, norm: String): (Boolean, Seq[Boolean]) = {
      val aid = id % 100000L
      val aug = norm +
        (if (aid % 7 == 0) " # # # # # #" else "") +
        (if (aid % 13 == 0) " 0 1 2 3 4 5 6 7 8 9 10 11" else "")
      val ws = aug.split(" ")
      val n = ws.length
      val meanW = aug.replace(" ", "").length.toDouble / n
      val sym = ws.count(_ == "#").toDouble / n
      val alpha = ws.count(_.exists(c => c >= 'a' && c <= 'z')).toDouble / n
      val hits = ws.count(stop.contains)
      val flags = Seq(n >= 25 && n <= 100000, meanW >= 3.0 && meanW <= 10.0,
        sym <= 0.05, alpha >= 0.9, hits >= 2)
      (flags.forall(identity), flags)
    }
    val verdicts = union.map { case (id, t) => (id, t, verdict(id, t)) }
    val s1 = verdicts.filter(_._3._1)
    assert(ledger(1).getAs[Long]("docs_kept") == s1.length)
    assert(ledger(1).getAs[Long]("tokens_out") ==
      s1.map(_._2.split(" ").length.toLong).sum)
    val d1 = detail(ledger(1))
    val names = Seq("r_words", "r_mean_len", "r_symbols", "r_alpha",
      "r_stopwords")
    for ((nm, i) <- names.zipWithIndex)
      assert(d1(nm) == verdicts.count(!_._3._2(i)), s"failure count $nm")
    // the duplicate feed must actually SURVIVE into the dedup stage —
    // the hand-off this gate exists to test (a quality-dead feed would
    // trivially pass an empty stage 2)
    val groups = s1.groupBy(_._2)
    val dups = groups.filter(_._2.length >= 2)
    assert(dups.nonEmpty)
    assert(detail(ledger(2))("dup_groups") == dups.size)
    assert(ledger(2).getAs[Long]("docs_kept") == groups.size)
    // keep-min-id: dropped docs are exactly the non-min group members
    assert(ledger(2).getAs[Long]("docs_dropped") ==
      dups.values.map(_.length - 1).sum)
  }

  test("pipeline_e2e: cascade, decontamination and layout accounting") {
    // near_dedup keeps exactly one member per cluster
    val d3 = detail(ledger(3))
    assert(d3("members") >= 2 * d3("clusters"))
    assert(ledger(3).getAs[Long]("docs_dropped") ==
      d3("members") - d3("clusters"))
    // decontaminate: doc drops are eval-membership, token drops are
    // eval docs + stripped spans
    val d4 = detail(ledger(4))
    assert(ledger(4).getAs[Long]("docs_dropped") == d4("eval_docs"))
    assert(d4("tokens_stripped") >= 0)
    assert(ledger(4).getAs[Long]("tokens_in") -
      ledger(4).getAs[Long]("tokens_out") >= d4("tokens_stripped"))
    // split partitions exactly
    val d5 = detail(ledger(5))
    assert(d5("train") + d5("val") + d5("test") ==
      ledger(5).getAs[Long]("docs_kept"))
    assert(d5("moved") <= ledger(5).getAs[Long]("docs_kept"))
    // truncation: every truncated doc ends at exactly head+tail+marker
    // = 65 tokens, so they contribute 65 each to the output total
    val d6 = detail(ledger(6))
    assert(ledger(6).getAs[Long]("tokens_out") >= 65 * d6("truncated"))
    if (d6("truncated") == 0)
      assert(ledger(6).getAs[Long]("tokens_out") ==
        ledger(6).getAs[Long]("tokens_in"))
    // pack/shard: bins and shards exist and conserve tokens (checked in
    // the chain test); shard count is capped by the plan's 16
    assert(detail(ledger(7))("bins") >= 1)
    val d8 = detail(ledger(8))
    assert(d8("shards") >= 1 && d8("shards") <= 16)
    assert(d8("check") > 0)
  }

  // ------------------------------------------- stream_cluster_maintain

  /** Latest maintained forest per shard → flat (a, b) edge frame (the
    * update-mode memory sink appends every state version; `n_seen` is
    * the monotone version order). Collected driver-side: a self-join on
    * a memory-sink view trips conflicting-attribute resolution, and the
    * spec state is a handful of rows.
    */
  private def latestForest(table: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rows = spark.table(table).collect()
    val edges = rows.groupBy(_.getAs[Long]("shard")).values.toSeq
      .map(_.maxBy(_.getAs[Long]("n_seen")))
      .flatMap(_.getAs[scala.collection.Seq[Row]]("fedges")
        .map(e => (e.getAs[Long]("a"), e.getAs[Long]("b"))))
    edges.toDF("a", "b")
  }

  test("stream_cluster_maintain: late edge merges two components") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EdgeObs]
    val query = StreamCluster.forests(input.toDS())
      .writeStream.format("memory").queryName("cc_state")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: two disjoint components, on different state shards
      input.addData(EdgeObs(1, 1, 2), EdgeObs(3, 3, 4))
      query.processAllAvailable()
      val c1 = operators.Clustering.clustersFromForest(latestForest("cc_state"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("cluster"), r.getAs[Long]("csize"))).toMap
      assert(c1 == Map(1L -> (1L, 2L), 2L -> (1L, 2L),
        3L -> (3L, 2L), 4L -> (3L, 2L)))
      // batch 2: a LATE cross-component edge — the merge the batch
      // re-propagation cannot price incrementally
      input.addData(EdgeObs(2, 2, 3))
      query.processAllAvailable()
      val c2 = operators.Clustering.clustersFromForest(latestForest("cc_state"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("cluster"), r.getAs[Long]("csize"))).toMap
      assert(c2 == Map(1L -> (1L, 4L), 2L -> (1L, 4L),
        3L -> (1L, 4L), 4L -> (1L, 4L)))
      // batch 3: at-least-once replay of an old pair — state unchanged
      input.addData(EdgeObs(1, 1, 2))
      query.processAllAvailable()
      val c3 = operators.Clustering.clustersFromForest(latestForest("cc_state"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("cluster"), r.getAs[Long]("csize"))).toMap
      assert(c3 == c2)
    } finally query.stop()
  }

  test("stream_cluster_maintain: single batch equals batch propagation") {
    // the gate's own equivalence, pinned row-for-row (the oracle checks
    // values; this pins the frames against each other directly)
    val batch = operators.Clustering.dedupClusters(spark, sf).collect()
    val stream = graft.streaming.StreamScenarios
      .streamClusterMaintain(spark, sf).collect()
    assert(batch.map(_.toSeq).toSeq == stream.map(_.toSeq).toSeq)
    // and split_by_cluster reads the maintained state hash-identically
    val sBatch = operators.Clustering.splitByCluster(spark, sf).collect()
    val sStream = graft.streaming.StreamScenarios
      .streamSplitMaintain(spark, sf).collect()
    assert(sBatch.map(_.toSeq).toSeq == sStream.map(_.toSeq).toSeq)
  }

  // --------------------------------------------------------- doc_ppl_kn

  /** The fixed-point log2 replayed locally (the llog2 contract). */
  private def llog2L(x: Long): Long = {
    require(x >= 1)
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val p = 1L << (bl - 1)
    val fr = (x * 1024L) / p - 1024L
    val cor = fr * (1024L - fr) * 357L
    (bl - 1).toLong * 1024L + fr + cor / (1024L * 1024L)
  }

  test("doc_ppl_kn: per-doc nll replays from the local KN model") {
    val out = operators.Filtering.docPplKn(spark, sf).collect()
    assert(out.nonEmpty)
    // both flag sides must be populated — a one-sided gate is vacuous
    assert(out.exists(_.getAs[Long]("flagged") == 1L))
    assert(out.exists(_.getAs[Long]("flagged") == 0L))
    // local model: trigram occurrences per doc + the type-table stats
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.trim
          .replaceAll("\\s+", " ").split(" "))
    val occ = docs.flatMap { case (id, ws) =>
      if (ws.length < 3) Seq.empty
      else (0 until ws.length - 2).map(i =>
        (id, (ws(i), ws(i + 1), ws(i + 2))))
    }
    val cd = occ.groupBy(identity).map { case ((id, t), v) =>
      (id, t) -> v.length.toLong }
    val c123 = occ.groupBy(_._2).map { case (t, v) => t -> v.length.toLong }
    val types = c123.keys.toSeq
    val c12 = types.groupBy(t => (t._1, t._2))
      .map { case (k, ts) => k -> ts.map(c123).sum }
    val m = types.groupBy(t => (t._1, t._2)).map { case (k, ts) =>
      k -> ts.map(_._3).distinct.length.toLong }
    val a = types.groupBy(t => (t._2, t._3)).map { case (k, ts) =>
      k -> ts.map(_._1).distinct.length.toLong }
    val b = a.keys.toSeq.groupBy(_._1).map { case (w2, ks) =>
      w2 -> ks.map(a).sum }
    val hh = a.keys.toSeq.groupBy(_._1).map { case (w2, ks) =>
      w2 -> ks.map(_._2).distinct.length.toLong }
    val c3 = a.keys.toSeq.groupBy(_._2).map { case (w3, ks) =>
      w3 -> ks.map(_._1).distinct.length.toLong }
    val g = a.size.toLong
    def nb(t: (String, String, String)): Long = {
      val n2 = math.max(4 * a((t._2, t._3)) - 3, 0L) * g +
        3 * hh(t._2) * c3(t._3)
      val n3 = math.max(4 * c123(t) - 3, 0L) * (4 * b(t._2) * g) +
        3 * m((t._1, t._2)) * n2
      val d3 = 16 * c12((t._1, t._2)) * b(t._2) * g
      llog2L(d3) - llog2L(n3)
    }
    val expNll = cd.toSeq.groupBy(_._1._1).map { case (id, xs) =>
      id -> xs.map { case ((_, t), c) => c * nb(t) }.sum }
    for (r <- out) {
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("nll") == expNll(id), s"doc $id nll")
      val nt = r.getAs[Long]("n_trigrams")
      assert(r.getAs[Long]("avg_nll") ==
        Math.floorDiv(r.getAs[Long]("nll"), nt))
    }
    // probabilities are genuine: nll per occurrence is positive
    // (P < 1 for every trigram in a non-degenerate corpus)
    assert(out.forall(r => r.getAs[Long]("nll") > 0))
  }

  // ------------------------------------------------------ text_pii breadth

  test("text_pii: card/IPv6/MAC fire both ways; Luhn rejects the near-miss") {
    val rows = operators.TextOps.textPii(spark, sf).collect()
    def luhnOk(card: String): Boolean = {
      val ds = card.replace("-", "").map(_.asDigit)
      val sum = ds.zipWithIndex.map { case (d, i0) =>
        if ((16 - i0) % 2 == 0) { val t = 2 * d; if (t > 9) t - 9 else t }
        else d
      }.sum
      sum % 10 == 0
    }
    // the planted VALID card really passes Luhn by local replay
    for (id <- Seq(13L, 26L, 65L)) {
      val pay = id.toString.reverse.padTo(15, '5').reverse.mkString
      val sum15 = pay.map(_.asDigit).zipWithIndex.map { case (d, i0) =>
        if ((i0 + 1) % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t }
        else d
      }.sum
      val chk = (10 - sum15 % 10) % 10
      assert(luhnOk(s"$pay$chk".grouped(4).mkString("-")))
      assert(!luhnOk((pay + ((chk + 5) % 10)).grouped(4).mkString("-")))
    }
    // each class fires exactly on its modulus, both ways
    for ((m, c) <- Seq[(Long, String)](13L -> "n_cards", 19L -> "n_macs",
      23L -> "n_ipv6")) {
      val (planted, clean) = rows.partition(_.getLong(0) % m == 0)
      assert(planted.nonEmpty, s"$c plant set empty")
      assert(planted.forall(_.getAs[Int](c) >= 1), s"$c must fire on %$m")
      assert(clean.forall(_.getAs[Int](c) == 0), s"$c fired off-plant")
    }
    // the near-miss card: regex shape counts it, the validator rejects it
    val bad = rows.filter(r => r.getLong(0) % 17 == 0 && r.getLong(0) % 13 != 0)
    assert(bad.nonEmpty)
    assert(bad.forall(_.getAs[Int]("n_card_like") >= 1))
    assert(bad.forall(_.getAs[Int]("n_cards") == 0),
      "Luhn validator accepted a near-miss card")
    // a doc planted with BOTH cards: shape sees 2, checksum keeps 1
    val both = rows.filter(_.getLong(0) % 221 == 0).filter(_.getLong(0) > 0)
    for (r <- both) {
      assert(r.getAs[Int]("n_card_like") == 2)
      assert(r.getAs[Int]("n_cards") == 1)
    }
  }

  // ---------------------------------------------------------- wordpiece

  test("wordpiece: training scores and greedy tokenization replay locally") {
    val merges = operators.Wordpiece.wordpieceTrain(spark, sf).collect()
    assert(merges.length > 0)
    for (r <- merges) {
      // the q9 score is exactly ⌊c·10⁹/(ca·cb)⌋
      assert(r.getAs[Long]("score_q9") ==
        r.getAs[Long]("pair_count") * 1000000000L /
          (r.getAs[Long]("left_count") * r.getAs[Long]("right_count")))
      // the merged piece is left + right-with-##-stripped
      val Array(a, b) = r.getAs[String]("pair").split(" ")
      assert(r.getAs[String]("piece") ==
        a + (if (b.startsWith("##")) b.substring(2) else b))
    }
    // local greedy replay over the trained vocab
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.trim
          .replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty))
    val singles = docs.flatMap(_._2).distinct.flatMap(w =>
      w.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else "##" + c })
    val vocab = (singles ++ merges.map(_.getAs[String]("piece"))).toSet
    def greedy(w: String): (Long, Seq[String], Long) = {
      var pos = 0
      val out = Seq.newBuilder[String]
      var n = 0L
      while (pos < w.length) {
        val pre = if (pos == 0) "" else "##"
        val m = (w.length - pos to 1 by -1).map(l =>
          pre + w.substring(pos, pos + l)).find(vocab.contains)
        m match {
          case Some(p) =>
            out += p; n += 1
            pos += p.length - (if (pos == 0) 0 else 2)
          case None => return (1L, Seq("[UNK]"), 1L)
        }
      }
      (n, out.result(), 0L)
    }
    val out = operators.Wordpiece.tokenizeWordpiece(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((id, ws) <- docs if ws.nonEmpty) {
      val segs = ws.map(greedy)
      val r = out(id)
      assert(r.getAs[Long]("n_words") == ws.length)
      assert(r.getAs[Long]("n_wp_tokens") == segs.map(_._1).sum,
        s"doc $id piece count")
      assert(r.getAs[Long]("n_unk") == segs.map(_._3).sum)
      val stream = segs.flatMap(_._2).mkString(" ")
      val h = md.digest(stream.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("tok_hash") == h, s"doc $id token stream")
    }
  }

  test("tokenize_wordpiece_oov: unseen words segment; unknown chars UNK") {
    val rows = operators.Wordpiece.tokenizeWordpieceOov(spark, sf).collect()
    assert(rows.nonEmpty)
    val corpus = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.trim.replaceAll("\\s+", " ")
        .split(" ")).toSet
    val (even, odd) = rows.partition(_.getAs[String]("base_word").length % 2 == 0)
    assert(even.nonEmpty && odd.nonEmpty)
    for (r <- rows) {
      // every probe word is genuinely out of the training vocabulary
      assert(!corpus.contains(r.getAs[String]("oov_word")))
      if (r.getAs[String]("base_word").length % 2 == 0) {
        // all-known characters: MUST segment, never UNK
        assert(r.getAs[Long]("is_unk") == 0L)
        assert(r.getAs[Long]("n_pieces") >= 2)
        // the pieces reassemble to the word (## stripped, spaces out)
        assert(r.getAs[String]("pieces").split(" ")
          .map(p => if (p.startsWith("##")) p.substring(2) else p)
          .mkString == r.getAs[String]("oov_word"))
      } else {
        // the digit suffix is unrepresentable: whole word UNK
        assert(r.getAs[Long]("is_unk") == 1L)
        assert(r.getAs[Long]("n_pieces") == 1L)
        assert(r.getAs[String]("pieces") == "[UNK]")
      }
    }
  }

  test("tokenizer_parity: three-way winner is the strict minimum") {
    val rows = operators.Unigram.tokenizerParity(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val counts = Map(
        "bpe" -> r.getAs[Long]("n_bpe_tokens"),
        "unigram" -> r.getAs[Long]("n_unigram_pieces"),
        "wordpiece" -> r.getAs[Long]("n_wp_tokens"))
      val mn = counts.values.min
      val winners = counts.filter(_._2 == mn).keys.toSeq
      val exp = if (winners.length == 1) winners.head else "tie"
      assert(r.getAs[String]("winner") == exp)
      assert(r.getAs[Long]("fert_wp_q6") ==
        counts("wordpiece") * 1000000L / r.getAs[Long]("n_words"))
    }
  }

  test("kn_discount_sweep: totals replay and the estimate is coherent") {
    val rows = operators.Filtering.knDiscountSweep(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("discount_q6")).toSeq ==
      Seq(250000L, 500000L, 750000L))
    // the D = 3/4 row IS the shipped filter's aggregate
    val base = operators.Filtering.docPplKn(spark, sf).collect()
    val r3 = rows.find(_.getAs[Long]("discount_q6") == 750000L).get
    assert(r3.getAs[Long]("n_docs") == base.length)
    assert(r3.getAs[Long]("nll_total") ==
      base.map(_.getAs[Long]("nll")).sum)
    assert(r3.getAs[Long]("n_flagged") ==
      base.count(_.getAs[Long]("flagged") == 1L))
    assert(r3.getAs[Long]("mean_avg_nll") ==
      Math.floorDiv(base.map(_.getAs[Long]("avg_nll")).sum, base.length))
    // Chen–Goodman estimate from locally recomputed type counts
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).toLowerCase.trim.replaceAll("\\s+", " ")
        .split(" "))
    val c123 = docs.flatMap(ws =>
        if (ws.length < 3) Seq.empty
        else (0 until ws.length - 2).map(i => (ws(i), ws(i + 1), ws(i + 2))))
      .groupBy(identity).map(_._2.length)
    val n1 = c123.count(_ == 1).toLong
    val n2 = c123.count(_ == 2).toLong
    for (r <- rows) {
      assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2t") == n2)
      assert(r.getAs[Long]("d_est_q6") ==
        n1 * 1000000L / math.max(1L, n1 + 2 * n2))
      assert(r.getAs[Long]("n_flagged") >= 0 &&
        r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
      // every discount scores the same doc population
      assert(r.getAs[Long]("n_docs") == base.length)
    }
  }

  test("stream_kn_maintain: counts accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KnPart]
    val query = StreamKn.counts(input.toDS())
      .writeStream.format("memory").queryName("kn_state")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(KnPart("a", "b", "c", 2), KnPart("x", "y", "z", 1))
      query.processAllAvailable()
      input.addData(KnPart("a", "b", "c", 3))
      query.processAllAvailable()
      val rows = spark.table("kn_state").collect()
      val abc = rows.filter(r => r.getString(0) == "a")
        .map(_.getAs[Long]("c123")).max
      assert(abc == 5L)
      val xyz = rows.filter(r => r.getString(0) == "x")
        .map(_.getAs[Long]("c123")).max
      assert(xyz == 1L)
    } finally query.stop()
  }
}
