package graft

import graft.operators.TrainPrep

/** Round-12 operator specs (the driver's oracle gate checks values; these
  * pin the ALGEBRAIC contracts a hash can't articulate).
  */
class Round12OpsSpec extends SparkSpec {

  /** The schedule's per-epoch shuffle hash, replayed locally: first 8 hex
    * chars of md5("<doc_id>:ep<epoch>") as an unsigned long.
    */
  private def epHash(docId: Long, epoch: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$docId:ep$epoch".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  test("epoch_positions: per-epoch token conservation, greedy-maximal " +
    "partial epoch, contiguous per-shard positions") {
    val sched = TrainPrep.epochPositions(spark, sf).collect()
    assert(sched.nonEmpty)
    val alloc = TrainPrep.corpusEpochs(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("alloc_tokens"),
          r.getAs[Long]("n_docs"))).toMap
    val bySourceEpoch = sched.groupBy(r =>
      (r.getAs[String]("source"), r.getAs[Long]("epoch")))
    val corpusDocs = {
      import org.apache.spark.sql.functions._
      Tables.documents(spark, sf)
        .select(col("doc_id"), col("source"),
          size(split(operators.TextNorm.norm, " ")).cast("long").as("n_w"))
        .collect()
        .groupBy(_.getAs[String]("source"))
        .view.mapValues(_.map(r =>
          (r.getAs[Long]("doc_id"), r.getAs[Long]("n_w")))).toMap
    }

    alloc.foreach { case (src, (nTok, al, nDocs)) =>
      val eFull = al / nTok
      val rem = al % nTok
      // every COMPLETE epoch carries the source verbatim: all docs, all
      // tokens, exactly once
      (1L to eFull).foreach { e =>
        val rows = bySourceEpoch.getOrElse((src, e), Array.empty)
        assert(rows.length == nDocs, s"$src epoch $e doc count")
        assert(rows.map(_.getAs[Long]("n_w")).sum == nTok,
          s"$src epoch $e token conservation")
      }
      // the partial epoch is the greedy-maximal prefix of THAT epoch's
      // hash order whose running token count fits the residual — replay
      // the md5 order locally and compare the included doc sets exactly
      val partRows = bySourceEpoch.getOrElse((src, eFull + 1), Array.empty)
      if (rem == 0) assert(partRows.isEmpty, s"$src: no residual, no partial")
      else {
        val docs = corpusDocs(src)
        val ordered = docs.sortBy { case (id, _) => (epHash(id, eFull + 1), id) }
        var cum = 0L
        val expect = ordered.takeWhile { case (_, w) =>
          cum += w; cum <= rem
        }.map(_._1).toSet
        assert(partRows.map(_.getAs[Long]("doc_id")).toSet == expect,
          s"$src partial epoch is not the greedy-maximal hash-order prefix")
        val got = partRows.map(_.getAs[Long]("n_w")).sum
        assert(got <= rem, s"$src partial epoch over-allocates")
      }
      // scheduled-token identity: at most alloc, and what's missing is
      // only the partial epoch's whole-document shortfall
      val total = (1L to eFull + 1).flatMap(e =>
        bySourceEpoch.getOrElse((src, e), Array.empty[org.apache.spark.sql.Row]))
        .map(_.getAs[Long]("n_w")).sum
      assert(total <= al)
    }
    // positions are contiguous 1..n within every (epoch, shard) and
    // ordered by the fresh per-epoch hash
    sched.groupBy(r => (r.getAs[Long]("epoch"), r.getAs[Long]("shard")))
      .foreach { case ((e, sh), rows) =>
        val sorted = rows.sortBy(_.getAs[Long]("position"))
        assert(sorted.map(_.getAs[Long]("position")).toSeq ==
          (1L to rows.length).toSeq, s"positions not contiguous in ($e,$sh)")
        val hs = sorted.map(r => (epHash(r.getAs[Long]("doc_id"), e),
          r.getAs[Long]("doc_id")))
        assert(hs.toSeq == hs.sortBy(identity).toSeq,
          s"($e,$sh) not in fresh-hash order")
        hs.foreach { case (h, _) =>
          assert(h % 8 == sh, s"doc sharded into the wrong shard in ($e,$sh)")
        }
      }
    // repeat exposures genuinely reshuffle: some document changes shard
    // between epoch 1 and epoch 2
    val shardOf = sched.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("epoch")) -> r.getAs[Long]("shard")).toMap
    val moved = shardOf.keys.filter(_._2 == 1L).exists { case (id, _) =>
      shardOf.get((id, 2L)).exists(_ != shardOf((id, 1L)))
    }
    assert(moved, "per-epoch fresh hashes should move docs across shards")
  }

  test("text_layout_pruning: each sort's primary dimension prunes hard, " +
    "its secondary barely, crawl order not at all") {
    val t = graft.operators.ZOrder.textLayoutPruning(spark, sf).collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[String]("dim")) ->
        r.getAs[Double]("avg_files_read")).toMap
    assert(t.size == 6)
    // crawl order cannot prune source queries: every file holds every
    // source (the %20 planting), so every probe reads all 25 files
    assert(t(("crawl", "source")) == 25.0)
    // primary-dimension pruning is dramatic: the per-value file span
    assert(t(("sorted", "source")) < 4.0)
    assert(t(("qsorted", "quality")) < t(("crawl", "quality")) / 2)
    // the lexicographic-sort trap: the SECONDARY dimension barely beats
    // crawl (quality is i.i.d. within each source stratum)
    assert(t(("sorted", "quality")) <= t(("crawl", "quality")))
    assert(t(("sorted", "quality")) > t(("qsorted", "quality")),
      "secondary-dim pruning should be far weaker than primary-dim")
    // ordering across layouts on each dimension
    assert(t(("sorted", "source")) < t(("qsorted", "source")))
    assert(t(("qsorted", "source")) < t(("crawl", "source")))
    assert(t(("qsorted", "quality")) < t(("sorted", "quality")))
  }

  test("tokenize_unigram_bf: byte fallback replays Java's UTF-8, " +
    "unplanted documents are bit-identical to the plain path") {
    import graft.operators.Unigram
    val bf = Unigram.tokenizeUnigramBf(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val plain = Unigram.tokenizeUnigram(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(bf.keySet == plain.keySet && bf.nonEmpty)
    // the planted suffix ' café πλ' adds exactly the UTF-8 byte count of
    // its uncovered characters as byte tokens — replay with Java's codec
    val expBytes = "éπλ".getBytes("UTF-8").length
    assert(expBytes == 6)
    bf.foreach { case (id, r) =>
      val p = plain(id)
      if (id % 7 == 0) {
        assert(r.getAs[Boolean]("planted"))
        assert(r.getAs[Long]("n_byte_tokens") == expBytes)
        // 'café' contributes its covered prefix as 1-3 trained pieces
        val cafPieces = r.getAs[Long]("n_pieces") -
          r.getAs[Long]("n_pieces_plain") - expBytes
        assert(cafPieces >= 1 && cafPieces <= 3,
          s"doc $id: unexpected covered-piece count $cafPieces for 'caf'")
        assert(r.getAs[String]("tok_hash") != p.getAs[String]("tok_hash"))
      } else {
        // no OOV content → the expanded stream IS the plain stream
        assert(r.getAs[Long]("n_byte_tokens") == 0L)
        assert(r.getAs[Long]("n_pieces") == r.getAs[Long]("n_pieces_plain"))
        assert(r.getAs[Long]("n_pieces") == p.getAs[Long]("n_pieces"))
        assert(r.getAs[String]("tok_hash") == p.getAs[String]("tok_hash"))
      }
    }
  }

  /** First 8 hex chars of md5(s) as an unsigned long (the layout hash). */
  private def md5head(sIn: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(sIn.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  test("shard_plan: contiguous token extents, conservation, balance, " +
    "and the additive member digest replayed locally") {
    import org.apache.spark.sql.functions._
    val plan = TrainPrep.shardPlan(spark, sf).collect()
      .sortBy(_.getAs[Long]("shard_id"))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(operators.TextNorm.norm, " ")).cast("long").as("n_w"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_w")))
    val total = docs.map(_._2).sum
    val maxDoc = docs.map(_._2).max
    val ssize = (total + 15) / 16
    assert(maxDoc < ssize,
      "corpus precondition: no document spans a whole shard")
    // all 16 shards present (every shard range contains some doc start
    // when maxDoc < ssize), ids dense from 0
    assert(plan.map(_.getAs[Long]("shard_id")).toSeq == (0L until 16L))
    // extents tile the token axis exactly: [0, total) with no gaps
    assert(plan.head.getAs[Long]("start_offset") == 0L)
    assert(plan.last.getAs[Long]("end_offset") == total)
    plan.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("end_offset") == b.getAs[Long]("start_offset"),
        s"gap between shard ${a.getAs[Long]("shard_id")} and next")
    }
    plan.foreach { r =>
      assert(r.getAs[Long]("end_offset") - r.getAs[Long]("start_offset") ==
        r.getAs[Long]("n_tokens"), "extent width == token mass")
    }
    // conservation + balance (every shard within one document of target)
    assert(plan.map(_.getAs[Long]("n_tokens")).sum == total)
    assert(plan.map(_.getAs[Long]("n_docs")).sum == docs.length)
    plan.init.foreach { r =>
      assert(math.abs(r.getAs[Long]("n_tokens") - ssize) < 2 * maxDoc,
        s"shard ${r.getAs[Long]("shard_id")} off balance")
    }
    // replay the layout locally: md5 shuffle order, running offsets,
    // starting-offset shard membership, additive member digest
    val ordered = docs.sortBy { case (id, _) => (md5head(s"$id:sp"), id) }
    var cum = 0L
    val members = ordered.map { case (id, w) =>
      val start = cum; cum += w; (id, start / ssize)
    }.groupBy(_._2)
    plan.foreach { r =>
      val sid = r.getAs[Long]("shard_id")
      val ms = members(sid).map(_._1)
      assert(r.getAs[Long]("n_docs") == ms.length)
      assert(r.getAs[Long]("first_doc") == ms.head)
      assert(r.getAs[Long]("last_doc") == ms.last)
      assert(r.getAs[Long]("member_check") ==
        ms.map(id => md5head(s"$id:ck")).sum, s"shard $sid digest")
    }
  }

  test("quality_rules: per-rule flags replay locally and every rule " +
    "fires both ways across the corpus") {
    import graft.operators.{CorpusFilters, Stoplists}
    val rows = CorpusFilters.qualityRules(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length == 500)
    val texts = Tables.documents(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text")).toMap
    val flags = Seq("r_words", "r_mean_len", "r_symbols", "r_alpha",
      "r_stopwords")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val aug = texts(id).trim.toLowerCase.replaceAll("\\s+", " ") +
        (if (id % 7 == 0) " # # # # # #" else "") +
        (if (id % 13 == 0) " 0 1 2 3 4 5 6 7 8 9 10 11" else "")
      val ws = aug.split(" ")
      val n = ws.length
      val meanW = ws.map(_.length).sum.toDouble / n
      val sym = ws.count(_ == "#").toDouble / n
      val alpha = ws.count(_.exists(c => c >= 'a' && c <= 'z')).toDouble / n
      val stop = ws.count(Stoplists.en.contains)
      assert(r.getAs[Long]("n_words") == n)
      assert(r.getAs[Boolean]("r_words") == (n >= 25 && n <= 100000))
      assert(r.getAs[Boolean]("r_mean_len") == (meanW >= 3.0 && meanW <= 10.0))
      assert(r.getAs[Boolean]("r_symbols") == (sym <= 0.05))
      assert(r.getAs[Boolean]("r_alpha") == (alpha >= 0.9))
      assert(r.getAs[Boolean]("r_stopwords") == (stop >= 2))
      assert(r.getAs[Long]("n_failed") ==
        flags.count(f => !r.getAs[Boolean](f)))
      assert(r.getAs[Boolean]("keep") == (r.getAs[Long]("n_failed") == 0L))
    }
    flags.foreach { f =>
      assert(rows.exists(_.getAs[Boolean](f)), s"$f never passes")
      assert(rows.exists(!_.getAs[Boolean](f)), s"$f never fails")
    }
    assert(rows.exists(_.getAs[Boolean]("keep")))
    assert(rows.exists(!_.getAs[Boolean]("keep")))
  }

  test("embed_mrl: full-width row is the identity audit and the dim-8 " +
    "audit replays exactly against a local truncated brute force") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.01"
    val rows = Similarity.embedMrl(spark, dir).collect()
    val byDim = rows.groupBy(_.getAs[Long]("dim"))
    assert(byDim.keySet == Set(8L, 16L, 32L, 64L))
    // identity self-check: truncating to the full width changes nothing
    byDim(64L).foreach(r => assert(r.getAs[Double]("recall") == 1.0))
    rows.foreach { r =>
      assert(r.getAs[Long]("k") == 5L)
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0 && hits <= 5)
      assert(r.getAs[Double]("recall") ==
        math.round(hits.toDouble / 5.0 * 1e6) / 1e6)
    }
    // local truncated brute force for dim 8
    val vecs = Tables.embeddings(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 1e7 + 0.5).toLong).toArray).toMap
    def topk(d: Int, probe: Long): Set[Long] = {
      val pq = vecs(probe).take(d)
      val pn = math.sqrt(pq.map(x => x * x).sum.toDouble)
      vecs.toSeq.filter(_._1 != probe).map { case (id, q0) =>
        val q = q0.take(d)
        val dot = pq.zip(q).map { case (a, b) => a * b }.sum
        val cos = dot.toDouble / (pn * math.sqrt(q.map(x => x * x).sum.toDouble))
        (id, cos)
      }.sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
    }
    byDim(8L).foreach { r =>
      val p = r.getAs[Long]("probe_id")
      val expect = (topk(8, p) intersect topk(64, p)).size
      assert(r.getAs[Long]("hits") == expect,
        s"probe $p dim-8 hits ${r.getAs[Long]("hits")} != local $expect")
    }
    // the audit is informative: truncation to 8 of 64 dims loses recall
    // somewhere (otherwise the gate measures nothing)
    assert(byDim(8L).exists(_.getAs[Double]("recall") < 1.0))
  }

  test("decontaminate_spans: eval-overlap removals replay locally and " +
    "eval documents never appear in the output") {
    import graft.operators.CorpusFilters
    val dir = "/root/testdata/sf0.01"
    val rows = CorpusFilters.decontaminateSpans(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.nonEmpty, "no contaminated spans found")
    assert(rows.keySet.forall(_ % 101 != 0), "eval doc in output")
    val docs = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.toLowerCase.replaceAll("\\s+", " ")
          .split(" ").toVector).toMap
    def gram(ws: Vector[String], p: Int) = ws.slice(p, p + 3).mkString(" ")
    val evalGrams = docs.filter(_._1 % 101 == 0).values.flatMap(ws =>
      (0 to ws.length - 3).map(p => gram(ws, p))).toSet
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    var affected = 0
    docs.filter(_._1 % 101 != 0).foreach { case (id, ws) =>
      val remT = (0 to ws.length - 3)
        .filter(p => evalGrams.contains(gram(ws, p)))
        .flatMap(p => p to p + 2).toSet
      if (remT.isEmpty) assert(!rows.contains(id), s"doc $id falsely affected")
      else {
        affected += 1
        val r = rows(id)
        assert(r.getAs[Long]("n_removed") == remT.size, s"doc $id n_removed")
        assert(r.getAs[Long]("n_kept") == ws.length - remT.size)
        val clean = ws.zipWithIndex.collect {
          case (tok, i) if !remT.contains(i) => tok
        }.mkString(" ")
        assert(r.getAs[String]("clean_hash") == md5hex(clean),
          s"doc $id clean hash")
      }
    }
    assert(affected == rows.size)
  }

  test("lsh_tuning: the S-curve replays the literal multiplication " +
    "chain, is monotone in s, and candidate sets nest across configs") {
    import graft.operators.Dedup
    val rows = Dedup.lshTuning(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 45)
    val configs = rows.map(r => (r.getAs[Long]("b"), r.getAs[Long]("r")))
      .distinct.sortBy(_._1)
    assert(configs.toSeq ==
      Seq((1L, 16L), (2L, 8L), (4L, 4L), (8L, 2L), (16L, 1L)))
    rows.foreach { row =>
      val (b, r) = (row.getAs[Long]("b").toInt, row.getAs[Long]("r").toInt)
      val s0 = row.getAs[Double]("s")
      // the analytic curve, replayed with the same left-fold chain
      val sr = (1 to r).map(_ => s0).product
      val p = 1.0 - (1 to b).map(_ => 1.0 - sr).product
      assert(row.getAs[Double]("p_collide") ==
        math.round(p * 1e6) / 1e6.toDouble, s"($b,$r) s=$s0")
    }
    // monotone in s per config; candidate volume nests: splitting the
    // signature into more, shorter bands only ADDS candidates
    val byCfg = rows.groupBy(r => r.getAs[Long]("b"))
    byCfg.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Double]("s")).map(_.getAs[Double]("p_collide"))
      assert(sorted.zip(sorted.tail).forall { case (a, c) => a <= c })
    }
    val candByB = byCfg.view.mapValues(_.head.getAs[Long]("n_cand")).toMap
    assert(candByB(16L) >= candByB(8L))
    assert(candByB(8L) >= candByB(4L))
    assert(candByB(4L) >= candByB(2L))
    assert(candByB(2L) >= candByB(1L))
    // the table is informative at the gate corpus: the coarsest banding
    // generates candidates
    assert(candByB(16L) > 0)
  }

  test("bpe_vocab_sweep: fertility is monotone in the merge cut, the " +
    "character baseline replays, and the full cut matches tokenize_bpe") {
    import graft.operators.{Bpe, TextNorm}
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val rows = Bpe.bpeVocabSweep(spark, dir).collect()
      .sortBy(_.getAs[Long]("n_merges"))
    assert(rows.map(_.getAs[Long]("n_merges")).toSeq ==
      Seq(0L, 5L, 10L, 15L, 20L))
    // word mass is cut-invariant; pieces only shrink as merges apply
    assert(rows.map(_.getAs[Long]("n_word_tokens")).distinct.length == 1)
    val pieces = rows.map(_.getAs[Long]("n_pieces"))
    assert(pieces.zip(pieces.tail).forall { case (a, b) => a >= b })
    val fert = rows.map(_.getAs[Double]("fertility"))
    assert(fert.zip(fert.tail).forall { case (a, b) => a >= b })
    assert(fert.head > fert.last, "the sweep must show a real tradeoff")
    // m=0 is the character baseline: pieces == characters, symbols == chars
    val docs = Tables.documents(spark, dir)
      .select(split(TextNorm.norm, " ").as("ws")).collect()
      .flatMap(_.getSeq[String](0))
    assert(rows.head.getAs[Long]("n_pieces") == docs.map(_.length).sum)
    assert(rows.head.getAs[Long]("n_symbols") ==
      docs.flatMap(_.toCharArray).distinct.length)
    // the full cut agrees with the tokenization gate's per-doc counts
    val tokTotal = Bpe.tokenizeBpe(spark, dir).collect()
      .map(_.getAs[Long]("n_bpe_tokens")).sum
    assert(rows.last.getAs[Long]("n_pieces") == tokTotal)
  }

  test("ivf_nprobe_sweep: recall and candidate volume are monotone in " +
    "nprobe and the shipped nprobe row matches ivf_recall") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.01"
    val rows = Similarity.ivfNprobeSweep(spark, dir).collect()
    val byNp = rows.groupBy(_.getAs[Long]("nprobe"))
    assert(byNp.keySet == Set(1L, 2L, 4L))
    val probes = byNp(1L).map(_.getAs[Long]("probe_id")).toSet
    assert(probes.nonEmpty)
    byNp.values.foreach(rs =>
      assert(rs.map(_.getAs[Long]("probe_id")).toSet == probes))
    probes.foreach { p =>
      def at(np: Long, c: String) = byNp(np)
        .find(_.getAs[Long]("probe_id") == p).get.getAs[Long](c)
      assert(at(1, "n_scanned") <= at(2, "n_scanned"))
      assert(at(2, "n_scanned") <= at(4, "n_scanned"))
      assert(at(1, "hits") <= at(2, "hits"))
      assert(at(2, "hits") <= at(4, "hits"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("k") == 5L)
      assert(r.getAs[Double]("recall") ==
        math.round(r.getAs[Long]("hits").toDouble / 5.0 * 1e6) / 1e6)
    }
    // the np = 2 slice IS the shipped index's recall audit
    val shipped = Similarity.ivfRecall(spark, dir).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("hits")).toMap
    byNp(2L).foreach(r =>
      assert(r.getAs[Long]("hits") ==
        shipped(r.getAs[Long]("probe_id")), "np=2 != ivf_recall"))
    // more cells must buy recall somewhere, or the knob measures nothing
    assert(byNp(4L).map(_.getAs[Long]("hits")).sum >
      byNp(1L).map(_.getAs[Long]("hits")).sum)
  }

  test("quality_drift: buckets, shares and chi-square terms replay " +
    "locally from the per-doc quality frame") {
    import graft.operators.{Quality, TextOps}
    val dir = "/root/testdata/sf0.01"
    val rows = Quality.qualityDrift(spark, dir).collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == (0L until 10L))
    val q = TextOps.textQuality(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        math.min(9L, math.round(r.getAs[Double]("quality") * 1e6) / 100000L))
    val ref = q.filter(_._1 % 2 == 0).groupBy(_._2).view.mapValues(_.size)
    val cur = q.filter(_._1 % 2 != 0).groupBy(_._2).view.mapValues(_.size)
    val (tRef, tCur) = (ref.values.sum.toLong, cur.values.sum.toLong)
    var chiTotal = 0.0
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      val nr = ref.getOrElse(k, 0).toLong
      val nc = cur.getOrElse(k, 0).toLong
      assert(r.getAs[Long]("n_ref") == nr, s"bucket $k n_ref")
      assert(r.getAs[Long]("n_cur") == nc, s"bucket $k n_cur")
      assert(r.getAs[Boolean]("no_ref") == (nr == 0))
      val e = (tCur * nr).toDouble / tRef.toDouble
      val expect = if (nr > 0) {
        val d = nc.toDouble - e
        math.round(d * d / e * 1e6) / 1e6.toDouble
      } else 0.0
      assert(r.getAs[Double]("chi2_term") == expect, s"bucket $k chi2")
      chiTotal += expect
    }
    // shares are distributions; the parity split of a finite sample has
    // nonzero divergence somewhere (the monitor actually measures)
    assert(math.abs(rows.map(_.getAs[Double]("ref_share")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("cur_share")).sum - 1.0) < 1e-4)
    assert(chiTotal > 0.0)
  }

  test("kmv_set_ops: the theta-sample algebra replays locally from the " +
    "per-language minima and estimates track the exact overlaps") {
    import graft.operators.{Dedup, Sketch}
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val rows = Sketch.kmvSetOps(spark, dir).collect()
      .map(r => (r.getAs[String]("lang_a"), r.getAs[String]("lang_b")) -> r)
      .toMap
    assert(rows.size == 10, "5 languages -> 10 unordered pairs")
    // rebuild the (lang, shingle-hash) domain locally
    val wl = Dedup.shinglesOf(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
      .select(col("lang"), col("sh")).distinct().collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("sh")))
    def h01(x: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16).toDouble / 4294967296.0
    }
    val byLang = wl.groupBy(_._1).view
      .mapValues(_.map(p => h01(p._2)).distinct.sorted).toMap
    val k = 64
    val mins = byLang.view.mapValues(_.take(k)).toMap
    val theta = mins.map { case (l, m) =>
      l -> (if (m.size < k) 1.0 else m.max)
    }
    val exact = wl.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for {
      la <- byLang.keys; lb <- byLang.keys if la < lb
    } {
      val r = rows((la, lb))
      val th = math.min(theta(la), theta(lb))
      val sA = mins(la).filter(_ < th).toSet
      val sB = mins(lb).filter(_ < th).toSet
      val ns = (sA ++ sB).size
      val ni = (sA intersect sB).size
      assert(r.getAs[Double]("est_union") ==
        math.round(ns / th * 100) / 100.0, s"($la,$lb) est_union")
      assert(r.getAs[Double]("est_inter") ==
        math.round(ni / th * 100) / 100.0, s"($la,$lb) est_inter")
      val xu = (exact(la) ++ exact(lb)).size.toLong
      val xi = (exact(la) intersect exact(lb)).size.toLong
      assert(r.getAs[Long]("exact_union") == xu)
      assert(r.getAs[Long]("exact_inter") == xi)
      // KMV with k=64 has relative std err ~1/sqrt(62) ~ 13%; allow 4 sigma
      assert(math.abs(r.getAs[Double]("est_union") - xu) < 0.5 * xu + 5,
        s"($la,$lb) union estimate implausible")
      assert(math.abs(r.getAs[Double]("est_jaccard") -
        r.getAs[Double]("exact_jaccard")) < 0.5,
        s"($la,$lb) jaccard estimate implausible")
    }
  }

  test("corpus_novelty: per-window first-seen census replays locally " +
    "and the decay curve opens at 1.0") {
    import graft.operators.CorpusFilters
    val dir = "/root/testdata/sf0.01"
    val rows = CorpusFilters.corpusNovelty(spark, dir).collect()
      .sortBy(_.getAs[Long]("w"))
    assert(rows.map(_.getAs[Long]("w")).toSeq == (0L until 10L))
    val docs = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.toLowerCase.replaceAll("\\s+", " ")
          .split(" ").toVector)
    val mx = docs.map(_._1).max
    def winOf(id: Long) = math.min(9L, id * 10 / (mx + 1))
    val occ = docs.flatMap { case (id, ws) =>
      if (ws.length >= 3)
        (0 to ws.length - 3).map(p =>
          (winOf(id), id, ws.slice(p, p + 3).mkString(" ")))
      else Seq.empty
    }
    val firstW = occ.groupBy(_._3).view.mapValues(_.map(_._1).min).toMap
    rows.foreach { r =>
      val w = r.getAs[Long]("w")
      val mine = occ.filter(_._1 == w)
      assert(r.getAs[Long]("n_docs") == mine.map(_._2).distinct.length)
      assert(r.getAs[Long]("n_occ") == mine.length)
      val dist = mine.map(_._3).distinct
      assert(r.getAs[Long]("n_grams_distinct") == dist.length)
      val fresh = dist.count(g => firstW(g) == w)
      assert(r.getAs[Long]("n_new_grams") == fresh, s"window $w fresh")
      assert(r.getAs[Double]("novelty_rate") ==
        math.round(fresh.toDouble / dist.length * 1e6) / 1e6.toDouble)
    }
    // the first window is all-new by definition; the curve must DECAY
    // (later windows mostly re-see early grams) or the gate measures
    // nothing on this corpus
    assert(rows.head.getAs[Double]("novelty_rate") == 1.0)
    assert(rows.last.getAs[Double]("novelty_rate") <
      rows.head.getAs[Double]("novelty_rate"))
  }

  test("c4_filters: line rules and document drops replay locally and " +
    "every rule fires both ways") {
    import graft.operators.CorpusFilters
    val dir = "/root/testdata/sf0.01"
    val rows = CorpusFilters.c4Filters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 500)
    def md5hex2(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val texts = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.toLowerCase.replaceAll("\\s+", " "))
    texts.foreach { case (id, t) =>
      val ws = t.split(" ").toVector
      val nChunks = (ws.length + 6) / 7
      val chunks = (1 to nChunks).map { i =>
        ws.slice((i - 1) * 7, math.min(i * 7, ws.length)).mkString(" ") +
          (if ((id + i) % 4 == 0) "" else ".")
      }
      val lines = chunks ++
        (if (id % 31 == 0) Seq("lorem ipsum dolor sit amet.") else Nil) ++
        (if (id % 37 == 0) Seq("function() { return 0; }") else Nil)
      val kept = lines.filter(l =>
        l.split(" ").length >= 3 && l.endsWith("."))
      val dropped = id % 31 == 0 || id % 37 == 0
      val r = rows(id)
      assert(r.getAs[Long]("n_lines") == lines.length, s"doc $id lines")
      assert(r.getAs[Long]("n_kept_lines") == kept.length, s"doc $id kept")
      assert(r.getAs[Boolean]("doc_dropped") == dropped)
      assert(r.getAs[Boolean]("has_lorem") == (id % 31 == 0))
      assert(r.getAs[Boolean]("has_brace") == (id % 37 == 0))
      assert(r.getAs[Long]("n_kept_words") ==
        (if (dropped) 0L else kept.map(_.split(" ").length).sum.toLong))
      assert(r.getAs[String]("clean_hash") ==
        md5hex2(if (dropped) "" else kept.mkString(" ")), s"doc $id hash")
    }
    // both rule families fire both ways across the corpus
    assert(rows.values.exists(_.getAs[Boolean]("doc_dropped")))
    assert(rows.values.exists(!_.getAs[Boolean]("doc_dropped")))
    assert(rows.values.exists(r =>
      r.getAs[Long]("n_kept_lines") < r.getAs[Long]("n_lines")))
    assert(rows.values.exists(r => r.getAs[Long]("n_kept_lines") > 0))
  }

  test("sft_mask_spans: rendered-stream mask replays token by token " +
    "and spans are exactly the assistant turns") {
    import graft.operators.TrainPrep
    val dir = "/root/testdata/sf0.01"
    val rows = TrainPrep.sftMaskSpans(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 500)
    def md5hex3(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Tables.documents(spark, dir).collect().foreach { d =>
      val id = d.getAs[Long]("doc_id")
      val n = d.getAs[String]("text").trim.toLowerCase
        .replaceAll("\\s+", " ").split(" ").length.toLong
      val k = 2 + 2 * (id % 2)
      def b(i: Long) = i * n / k
      // build the full 0/1 mask token-by-token: '0' marker, then the
      // turn's words as '1' (assistant, even i) or '0' (user)
      val mask = (1L to k).map { i =>
        "0" + (if (i % 2 == 0) "1" else "0") * (b(i) - b(i - 1)).toInt
      }.mkString
      val spans = (1L to k).filter(_ % 2 == 0)
        .map(i => s"${b(i - 1) + i + 1}:${b(i) - b(i - 1)}").mkString(",")
      val r = rows(id)
      assert(r.getAs[Long]("n_turns") == k)
      assert(r.getAs[Long]("n_tokens") == n + k)
      assert(r.getAs[Long]("n_tokens") == mask.length.toLong,
        s"doc $id stream length")
      assert(r.getAs[Long]("n_trainable") == mask.count(_ == '1').toLong)
      assert(r.getAs[Long]("n_spans") == k / 2)
      assert(r.getAs[String]("spans") == spans, s"doc $id spans")
      assert(r.getAs[String]("mask_hash") == md5hex3(mask), s"doc $id mask")
      // every span points at a run of 1s bounded by 0s — the
      // train-on-user / train-on-marker bug class is structurally
      // impossible if this holds for every document
      spans.split(",").foreach { sp =>
        val Array(st, ln) = sp.split(":").map(_.toInt)
        val run = mask.slice(st - 1, st - 1 + ln)
        assert(run.forall(_ == '1'), s"doc $id span $sp not trainable")
        assert(mask.charAt(st - 2) == '0', s"doc $id span $sp left edge")
        assert(st - 1 + ln >= mask.length || mask.charAt(st - 1 + ln) == '0',
          s"doc $id span $sp right edge")
      }
    }
  }

  test("hard_negatives_knn: near-dups are never negatives, every anchor " +
    "has exactly one positive, role cuts respect the shared bar") {
    import graft.operators.Similarity
    // the sf0.001 corpus plants no cos >= bar pair in the LSH buckets,
    // so exercise the triple-miner contract at sf0.01
    val dir = "/root/testdata/sf0.01"
    val rows = Similarity.hardNegativesKnn(spark, dir).collect()
    assert(rows.nonEmpty, "no triples mined")
    val dupPairs = Similarity.dedupEmbedding(spark, dir).collect()
      .flatMap { r =>
        val a = r.getAs[Long]("id_a"); val b = r.getAs[Long]("id_b")
        Seq((a, b), (b, a))
      }.toSet
    assert(dupPairs.nonEmpty)
    val (pos, neg) = rows.partition(_.getAs[String]("role") == "positive")
    // every VERIFIED near-dup pair is excluded from the negatives — the
    // false-negative poisoning the shared bar exists to prevent
    neg.foreach { r =>
      val p = (r.getAs[Long]("anchor_id"), r.getAs[Long]("vec_id"))
      assert(!dupPairs.contains(p), s"near-dup pair $p emitted as negative")
      assert(r.getAs[Double]("cos") < 0.45)
    }
    // exactly one positive per anchor, at or above the bar, and every
    // negative's anchor has one
    val posAnchors = pos.map(_.getAs[Long]("anchor_id"))
    assert(posAnchors.distinct.length == posAnchors.length)
    pos.foreach { r =>
      assert(r.getAs[Double]("cos") >= 0.45)
      assert(r.getAs[Int]("pick") == 1)
    }
    neg.groupBy(_.getAs[Long]("anchor_id")).foreach { case (a, ns) =>
      assert(posAnchors.contains(a), s"anchor $a has negatives, no positive")
      assert(ns.length <= 2)
      assert(ns.map(_.getAs[Int]("pick")).sorted.toSeq ==
        (1 to ns.length).toSeq)
    }
  }
}
