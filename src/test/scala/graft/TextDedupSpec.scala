package graft

import graft.operators.{Dedup, TextOps}

class TextDedupSpec extends SparkSpec {

  test("text_quality: ratios bounded and composite consistent") {
    val rows = TextOps.textQuality(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[Double]("stopword_ratio") >= 0.0)
      assert(r.getAs[Double]("punct_ratio") == 0.0) // corpus has no punctuation
      assert(r.getAs[Double]("mean_word_len") > 0.0)
    }
  }

  test("token_count: whitespace tokens match BPE tokens on this corpus") {
    // the harness corpus is pure lowercase words, so the two lexers agree
    val rows = TextOps.tokenCount(spark, sf).collect()
    assert(rows.forall(r =>
      r.getAs[Int]("n_ws_tokens") == r.getAs[Int]("n_bpe_tokens")))
  }

  test("text_langid: scores bounded, argmax matches predicted") {
    val rows = TextOps.textLangid(spark, sf).collect()
    rows.foreach { r =>
      val scores = Seq("en", "es", "fr", "de", "zh")
        .map(l => l -> r.getAs[Double](s"score_$l"))
      val best = scores.maxBy(_._2)._2
      assert(scores.find(_._2 == best).exists(_ => true))
      assert(r.getAs[Double](s"score_${r.getAs[String]("lang_pred")}") == best)
    }
  }

  test("doc_fingerprint: identical docs share all fingerprints") {
    val fps = TextOps.docFingerprint(spark, sf)
    val a = fps.filter("doc_id = 0").select("block", "fp").collect().toSet
    assert(a.nonEmpty)
  }

  test("corpus_sample: stable strata quotas, deterministic membership") {
    val a = TextOps.corpusSample(spark, sf).collect()
    val b = TextOps.corpusSample(spark, sf).collect()
    assert(a.map(_.getLong(0)).sameElements(b.map(_.getLong(0))), "reproducible")
    assert(a.forall(_.getAs[Long]("bucket") < 500))
    val en = a.count(_.getAs[String]("lang") == "en")
    assert(en > 0 && a.length > en, "multiple strata survive")
  }

  test("pack_sequences: bins respect the token budget per stratum") {
    val rows = TextOps.packSequences(spark, sf).collect()
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("seq_id")))
      .foreach { case ((_, seq), g) =>
        val tokens = g.map(_.getAs[Int]("n_tokens").toLong).sum
        // a bin only exceeds budget by at most its last (overflowing) doc
        assert(tokens - g.map(_.getAs[Int]("n_tokens").toLong).max <= 2048,
          s"bin $seq overfilled")
      }
    assert(rows.map(_.getAs[Long]("seq_id")).max > 0, "multiple bins used")
  }

  test("corpus_mix: sources interleave at their configured weights") {
    val rows = operators.TextOps.corpusMix(spark, sf).collect()
    // deterministic: a second run yields the identical order
    val again = operators.TextOps.corpusMix(spark, sf).collect()
    assert(rows.map(_.getLong(0)).sameElements(again.map(_.getLong(0))))
    // within any mix_pos prefix, even (3x) sources contribute ~3x the docs
    // of odd (1x) sources, per their availability
    val prefix = rows.take(rows.length / 2)
    val even = prefix.count(r => r.getString(1).stripPrefix("src").toInt % 2 == 0)
    val odd = prefix.length - even
    assert(even > odd, s"expected 3x-weighted sources to dominate: $even vs $odd")
    // per-source ranks stay ordered by doc_id
    rows.groupBy(_.getString(1)).foreach { case (_, g) =>
      val byRank = g.sortBy(_.getAs[Int]("rn")).map(_.getLong(0))
      assert(byRank.sameElements(byRank.sorted))
    }
  }

  test("corpus_mix_temp: schedule positions replay locally and sqrt-" +
    "temperature upweights low-resource sources") {
    val rows = operators.TextOps.corpusMixTemp(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    assert(rows.length == docs.length)
    // local replay: rank within source by doc_id, w = floor(sqrt(n)),
    // pos = floor(rn * K / w)
    val bySrc = docs.groupBy(_._2)
    val expect = bySrc.toSeq.flatMap { case (_, ds) =>
      val w = math.floor(math.sqrt(ds.length.toDouble)).toLong
      ds.map(_._1).sorted.zipWithIndex.map { case (id, i) =>
        id -> (((i + 1).toLong, ds.length.toLong, w, (i + 1) * 1048576L / w))
      }
    }.toMap
    rows.foreach { r =>
      val (rn, n, w, pos) = expect(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("rn") == rn)
      assert(r.getAs[Long]("n_source") == n)
      assert(r.getAs[Long]("w") == w)
      assert(r.getAs[Long]("pos_q") == pos,
        s"pos mismatch at doc ${r.getAs[Long]("doc_id")}")
    }
    // temperature semantics: in any schedule prefix, a source's share
    // exceeds its raw share iff it is smaller than average — check the
    // smallest vs the largest source over the first half
    val sizes = bySrc.view.mapValues(_.length).toMap
    val (smallest, largest) =
      (sizes.minBy(x => (x._2, x._1))._1, sizes.maxBy(x => (x._2, x._1))._1)
    val prefix = rows.sortBy(r => (r.getAs[Long]("pos_q"),
      r.getAs[String]("source"), r.getAs[Long]("doc_id")))
      .take(rows.length / 2)
    def share(src: String, of: Array[org.apache.spark.sql.Row]) =
      of.count(_.getAs[String]("source") == src).toDouble / of.length
    val rawSmall = sizes(smallest).toDouble / docs.length
    val rawLarge = sizes(largest).toDouble / docs.length
    assert(share(smallest, prefix) > rawSmall,
      "low-resource source not upweighted in the schedule prefix")
    assert(share(largest, prefix) < rawLarge,
      "high-resource source not downweighted in the schedule prefix")
  }

  test("text_pii: planted PII detected and scrubbed, clean docs untouched") {
    val rows = operators.TextOps.textPii(spark, sf).collect()
    // each pattern class fires exactly on its planted modulus
    val classes = Seq[(Long, String)](
      7L -> "n_emails", 7L -> "n_urls", 5L -> "n_phones",
      9L -> "n_ids", 11L -> "n_ips")
    for ((m, c) <- classes) {
      val (planted, clean) = rows.partition(_.getLong(0) % m == 0)
      assert(planted.nonEmpty)
      assert(planted.forall(_.getAs[Int](c) >= 1), s"$c must fire on %$m")
      assert(clean.forall(_.getAs[Int](c) == 0), s"$c fired off-plant")
    }
    // a doc on several moduli (e.g. 315 = 5*7*9) carries every class at once
    rows.filter(_.getLong(0) % 315 == 0).foreach { r =>
      assert(r.getAs[Int]("n_emails") >= 1 && r.getAs[Int]("n_phones") >= 1
        && r.getAs[Int]("n_ids") >= 1)
    }
  }

  test("kmv sketch: estimate within 30% of exact, exact under k distinct") {
    val row = operators.Sketch.corpusDistinctKmv(spark, sf).collect().head
    val est = row.getAs[Double]("est_distinct")
    val exact = row.getAs[Long]("exact_distinct").toDouble
    assert(exact > 256, "scenario needs more distinct values than k")
    assert(math.abs(est - exact) / exact < 0.30, s"est=$est exact=$exact")
    // under k distinct values the sketch degrades to the exact count
    import spark.implicits._
    val small = (1 to 50).map(i => s"v$i").toDF("sh")
    val smallRow = operators.Sketch.kmvDistinct(small, "sh", 256).collect().head
    assert(smallRow.getAs[Double]("est_distinct") == 50.0)
  }

  test("dedup_exact: planted copies collapse to groups of two") {
    val rows = Dedup.dedupExact(spark, sf).collect()
    val dups = rows.filter(_.getAs[Long]("n_copies") == 2)
    // every 7th doc is planted as a duplicate: ceil(500/7) = 72 groups
    assert(dups.length == 72)
    assert(rows.forall(r => r.getAs[Long]("keep_id") < 100000))
  }

  test("dedup_ngram_jaccard and minhash_lsh agree on high-sim pairs") {
    val exact = Dedup.dedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "harness corpus plants near-duplicates")
    // LSH with 4 bands × 4 rows at J≥0.8 has recall ~1 on these pairs
    assert(lsh == exact)
  }

  test("dedup_simhash finds the planted near-dup pairs") {
    val rows = Dedup.dedupSimhash(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("hamming") <= 3))
  }

  test("dedup plans: no cartesian products (candidates via equi-joins)") {
    Seq(Dedup.dedupMinhashLsh(spark, sf), Dedup.dedupSimhash(spark, sf))
      .foreach { df =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"), "must bucket-join, not cross")
      }
  }

  test("bm25_topk: scores positive, monotone in tf at equal length") {
    val rows = TextOps.bm25Topk(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Double]("score") > 0))
    // every returned doc matches at least one query term
    assert(rows.forall(r => r.getAs[Long]("tf_join") > 0 ||
      r.getAs[Long]("tf_vector") > 0 || r.getAs[Long]("tf_spark") > 0))
    // the cutoff is real: the 20th score is no smaller than any excluded doc
    val all = TextOps.bm25Topk(spark, sf)
    assert(all.count() == 20)
  }

  test("text_normalize: digest matches a locally normalized sample") {
    val rows = TextOps.textNormalize(spark, sf).collect()
    assert(rows.length == 500)
    val doc = Tables.documents(spark, sf).filter("doc_id = 7")
      .select("text").collect().head.getString(0)
    val norm = doc.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val r7 = rows.find(_.getAs[Long]("doc_id") == 7L).get
    assert(r7.getAs[String]("norm_md5") == md)
    assert(r7.getAs[Long]("n_norm") == norm.length.toLong)
  }

  test("csv reader honors the malformed-row policy instead of aborting") {
    val dir = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft-csv-spec")
    dir.mkdirs()
    val f = new java.io.File(dir, "part-000.csv")
    val w = new java.io.PrintWriter(f)
    w.println("doc_id,text,lang,source,n_chars")
    w.println("1,good row,en,src0,8")
    w.println("BAD,not a long,en,src0,11") // malformed doc_id
    w.println("3,another good,fr,src1,12")
    w.close()
    val permissive = sources.CsvCorpus.read(spark, f.getPath).collect()
    assert(permissive.length == 3)
    assert(permissive.count(_.isNullAt(0)) == 1, "bad cell nulled, row kept")
    val dropped = sources.CsvCorpus.read(spark, f.getPath,
      mode = "DROPMALFORMED").collect()
    assert(dropped.length == 2 && dropped.forall(!_.isNullAt(0)))
  }

  test("dedup_levenshtein: pairs come from the LSH candidates, dist exact") {
    val rows = operators.Dedup.dedupLevenshtein(spark, sf).collect()
    assert(rows.nonEmpty, "the planted near-dups must surface")
    val texts = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.foreach { r =>
      val (a, b, d) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("dist"))
      assert(a < b)
      assert(d >= 0 && d <= 20)
      // recompute one-sided: JVM reference DP on the same 256-prefix
      def lev(x: String, y: String): Int = {
        val (s1, s2) = (x.take(256), y.take(256))
        val dp = Array.tabulate(s2.length + 1)(identity)
        for (i <- 1 to s1.length) {
          var prev = dp(0); dp(0) = i
          for (j <- 1 to s2.length) {
            val t = dp(j)
            dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
              prev + (if (s1(i - 1) == s2(j - 1)) 0 else 1))
            prev = t
          }
        }
        dp(s2.length)
      }
      assert(lev(texts(a), texts(b)) == d, s"pair ($a,$b)")
    }
  }

  test("jsonl roundtrip preserves the corpus exactly, shards by partition") {
    val docs = Tables.documents(spark, sf)
    val dir = s"${sys.props("java.io.tmpdir")}/graft-jsonl-spec"
    sources.JsonlCorpus.write(docs.repartition(3), dir)
    val back = sources.JsonlCorpus.read(spark, dir)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    val shards = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.contains(".json"))
    assert(shards == 3, "one shard per upstream partition")
  }

  test("dedup_incremental: classification agrees with the verified pairs") {
    val pairs = Dedup.dedupMinhashLsh(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def isBatch(x: Long) = x % 5 == 4
    val partners = pairs.flatMap { case (a, b) => Seq(b -> a, a -> b) }
      .filter { case (x, _) => isBatch(x) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = operators.Dedup.dedupIncremental(spark, sf).collect()
    // exactly the batch docs, each classified once
    val n = graft.Tables.documents(spark, sf)
      .filter("doc_id % 5 = 4").count()
    assert(rows.length == n)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val ps = partners.getOrElse(id, Array.empty[Long])
      val base = ps.filter(!isBatch(_))
      val lower = ps.filter(p => isBatch(p) && p < id)
      r.getAs[String]("status") match {
        case "dup_of_base" =>
          assert(base.nonEmpty && r.getAs[Long]("partner") == base.min)
        case "dup_in_batch" =>
          assert(base.isEmpty && lower.nonEmpty &&
            r.getAs[Long]("partner") == lower.min)
        case "new" =>
          assert(base.isEmpty && lower.isEmpty && r.isNullAt(2))
        case other => fail(s"unknown status $other")
      }
    }
    // the corpus genuinely exercises at least one dup class
    assert(rows.exists(_.getAs[String]("status") != "new"))
  }

  test("streaming minhash: min-folds evolve across batches and are " +
    "replay-idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{MhObs, StreamMinhash}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val input = MemoryStream[MhObs]
    val query = StreamMinhash.signatures(input.toDS(), n = 2)
      .writeStream.format("memory").queryName("mh_state")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: one shingle with (h1, h2) = (100, 7)
      // m1 = (100 + 7) % 2^32 = 107, m2 = (100 + 14) % 2^32 = 114
      input.addData(MhObs(1, 100, 7))
      query.processAllAvailable()
      def sigs(): Seq[Long] = {
        val r = spark.table("mh_state").collect().last
        r.getSeq[Long](r.fieldIndex("sigs"))
      }
      assert(sigs() == Seq(107L, 114L))
      // batch 2: a shingle with smaller m2 only — minima fold per-hash
      input.addData(MhObs(1, 108, 1))
      query.processAllAvailable()
      assert(sigs() == Seq(107L, 110L))
      // replay the same observation — minima unchanged (idempotent)
      input.addData(MhObs(1, 108, 1))
      query.processAllAvailable()
      assert(sigs() == Seq(107L, 110L))
    } finally query.stop()
  }

  test("doc_winnow: local replay matches and the winnowing guarantees hold") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").replaceAll("\\s+", " ").trim.toLowerCase)
    def gramHash(words: Array[String], p: Int): Long = {
      val g = words.slice(p, p + 4).mkString(" ")
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    // local winnow: per window the (h asc, p desc)-first gram
    val localSel = docs.map { case (id, t) =>
      val ws = t.split(" ")
      val n = ws.length - 3
      val sel = scala.collection.mutable.Set.empty[(Int, Long)]
      if (n >= 1) {
        val hs = Array.tabulate(n)(i => gramHash(ws, i))
        val maxJ = math.max(1, n - 3)
        for (j <- 1 to maxJ) {
          val win = (j to math.min(j + 3, n)).map(p => (hs(p - 1), -p))
          val (h, negp) = win.min
          sel += ((-negp, h))
        }
      }
      id -> sel.toSet
    }.toMap
    val rows = TextOps.docWinnow(spark, sf).collect()
    assert(rows.length == docs.length)
    val fpOf = docs.map { case (id, _) =>
      id -> localSel(id).map(_._2) }.toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_fp") == localSel(id).size.toLong,
        s"fingerprint count mismatch for doc $id")
      val partners = docs.count { case (od, _) =>
        od != id && fpOf(od).intersect(fpOf(id)).nonEmpty }
      assert(r.getAs[Long]("n_partners") == partners.toLong)
      // density: at most one selection per window, at least one per
      // w consecutive windows (every window has a selected gram)
      assert(r.getAs[Long]("n_fp") <=
        math.max(1, r.getAs[Long]("n_grams") - 3).max(0))
      if (r.getAs[Long]("n_grams") >= 1) assert(r.getAs[Long]("n_fp") >= 1)
    }
    // selection gap guarantee: consecutive selected positions differ by <= w
    localSel.values.foreach { sel =>
      val ps = sel.map(_._1).toSeq.sorted
      ps.zip(ps.drop(1)).foreach { case (a, b) =>
        assert(b - a <= 4, "a window with no selected gram exists")
      }
    }
  }

  test("dedup_incremental_winnow: classification replays locally off the " +
    "winnow fingerprint index") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").replaceAll("\\s+", " ").trim.toLowerCase)
    def gramHash(words: Array[String], p: Int): Long = {
      val g = words.slice(p, p + 4).mkString(" ")
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val fpOf = docs.map { case (id, t) =>
      val ws = t.split(" ")
      val n = ws.length - 3
      val sel = scala.collection.mutable.Set.empty[Long]
      if (n >= 1) {
        val hs = Array.tabulate(n)(i => gramHash(ws, i))
        for (j <- 1 to math.max(1, n - 3)) {
          val (h, _) = (j to math.min(j + 3, n)).map(p => (hs(p - 1), -p)).min
          sel += h
        }
      }
      id -> sel.toSet
    }.toMap
    def isBatch(id: Long) = id % 5 == 4
    val expect = docs.map(_._1).filter(isBatch).sorted.map { id =>
      val sharers = docs.map(_._1).filter(o => o != id &&
        fpOf(o).intersect(fpOf(id)).size >= 2)
      val base = sharers.filter(!isBatch(_)).sorted.headOption
      val batch = sharers.filter(o => isBatch(o) && o < id).sorted.headOption
      val status =
        if (base.isDefined) "dup_of_base"
        else if (batch.isDefined) "dup_in_batch" else "new"
      id -> ((status, base.orElse(batch)))
    }.toMap
    val rows = Dedup.dedupIncrementalWinnow(spark, sf).collect()
    assert(rows.length == expect.size, "one row per batch document")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (st, pt) = expect(id)
      assert(r.getAs[String]("status") == st, s"status of doc $id")
      assert(Option(r.getAs[java.lang.Long]("partner")).map(_.toLong) == pt,
        s"partner of doc $id")
    }
    // the batch side never generates base-base comparisons, and the index
    // being probed is the 2/(w+1)-thinned winnow selection, so at least
    // one near-dup must actually fire at this scale for the gate to mean
    // anything
    assert(rows.exists(_.getAs[String]("status") != "new"),
      "no duplicate fired — the scenario lost its planted near-dups")
  }
  test("split_leakage: every near-dup pair carries the corpus_split " +
    "assignment of both sides, leak flag marks boundary crossings") {
    val rows = Dedup.splitLeakage(spark, sf).collect()
    val pairs = Dedup.dedupMinhashLsh(spark, sf).collect()
    assert(rows.length == pairs.length && rows.nonEmpty)
    // local replay of the hash-based split assignment
    def split(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h, 16) % 10) match {
        case b if b < 8 => "train"
        case 8 => "val"
        case _ => "test"
      }
    }
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      assert(r.getAs[String]("split_a") == split(a))
      assert(r.getAs[String]("split_b") == split(b))
      assert(r.getAs[Boolean]("leak") == (split(a) != split(b)))
    }
  }
}
