package graft

class SuffixArraySpec extends SparkSpec {

  /** Local reference: every suffix (token list to the document end). */
  private def suffixes(): Map[(Long, Int), Seq[String]] = {
    val toks = operators.SuffixArray.toks(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("p"),
        r.getAs[String]("tok")))
    val byDoc = toks.groupBy(_._1)
      .view.mapValues(_.sortBy(_._2).map(_._3).toIndexedSeq).toMap
    toks.map { case (d, p, _) =>
      (d, p) -> byDoc(d).drop(p - 1)
    }.toMap
  }

  test("suffix_array: ranks realize the exact lexicographic suffix order") {
    val sufs = suffixes()
    val ranks = operators.SuffixArray.suffixArray(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("p")) ->
        r.getAs[Long]("sa_rank")).toMap
    assert(ranks.keySet == sufs.keySet)
    // token-list comparison with shorter-prefix-first (the padded-
    // terminator convention: a document end sorts before any token)
    implicit val ord: Ordering[Seq[String]] = (a, b) => {
      val c = a.zip(b).iterator.map { case (x, y) => x.compare(y) }
        .find(_ != 0).getOrElse(0)
      if (c != 0) c else a.length.compare(b.length)
    }
    // sort by the reference order once; consecutive checks carry the full
    // order by transitivity (all-pairs would be quadratic in the corpus)
    val keys = sufs.keys.toIndexedSeq.sortBy(sufs)(ord)
    keys.sliding(2).foreach { w =>
      if (w.length == 2) {
        val (a, b) = (w(0), w(1))
        if (ord.compare(sufs(a), sufs(b)) == 0)
          assert(ranks(a) == ranks(b),
            s"identical suffixes $a, $b must share a rank")
        else assert(ranks(a) < ranks(b),
          s"order violated between $a and $b")
      }
    }
  }

  test("suffix_array: ranks are dense from 1 to the distinct-suffix count") {
    val rs = operators.SuffixArray.suffixArray(spark, sf).collect()
      .map(_.getAs[Long]("sa_rank"))
    val distinct = rs.distinct.sorted
    assert(distinct.head == 1L)
    assert(distinct.sameElements(1L to distinct.length.toLong))
  }

  test("suffix_maxmatch: resolutions nest and planted copies surface") {
    val rows = operators.SuffixArray.suffixMaxmatch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n16") <= r.getAs[Long]("n4"),
        "a 16-token match is also a 4-token match")
      assert(r.getAs[Long]("n64") <= r.getAs[Long]("n16"))
      val expect = if (r.getAs[Long]("n64") > 0) 64L
        else if (r.getAs[Long]("n16") > 0) 16L else 4L
      assert(r.getAs[Long]("maxpow") == expect)
    }
    // the planted 20-token copies (doc_id + 200000) must report a
    // cross-document match of at least 16 tokens, as must their sources
    val planted = rows.filter(_.getAs[Long]("doc_id") >= 200000L)
    assert(planted.nonEmpty, "planted copies must appear")
    planted.foreach { r =>
      assert(r.getAs[Long]("n16") >= 1L,
        s"planted 20-token span must match at >= 16: $r")
      val src = r.getAs[Long]("doc_id") - 200000L
      val srcRow = rows.find(_.getAs[Long]("doc_id") == src)
      assert(srcRow.exists(_.getAs[Long]("n16") >= 1L),
        s"source doc $src of a planted copy must also match at >= 16")
    }
  }

  test("suffix_spans: exact maximal matches equal a local reference") {
    // independent reference: sort every suffix, exact LCP between sorted
    // neighbours, maxmatch = max of the two (identical neighbours give
    // the full suffix length) — the textbook statistic recomputed with
    // none of the operator's machinery
    val sufs = suffixes()
    implicit val ord: Ordering[Seq[String]] = (a, b) => {
      val c = a.zip(b).iterator.map { case (x, y) => x.compare(y) }
        .find(_ != 0).getOrElse(0)
      if (c != 0) c else a.length.compare(b.length)
    }
    def lcp(a: Seq[String], b: Seq[String]): Long =
      a.zip(b).iterator.takeWhile { case (x, y) => x == y }.length.toLong
    val keys = sufs.keys.toIndexedSeq.sortBy(sufs)(ord)
    val want = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long)]
    for (i <- keys.indices) {
      val k = keys(i)
      val here = sufs(k)
      val prev = if (i > 0) lcp(here, sufs(keys(i - 1))) else 0L
      val next = if (i < keys.length - 1) lcp(here, sufs(keys(i + 1))) else 0L
      val mm = math.max(prev, next)
      val (n8, n16, n32, mx) = want.getOrElse(k._1, (0L, 0L, 0L, 0L))
      want(k._1) = (n8 + (if (mm >= 8) 1 else 0), n16 + (if (mm >= 16) 1 else 0),
        n32 + (if (mm >= 32) 1 else 0), math.max(mx, mm))
    }
    val got = operators.SuffixArray.suffixSpans(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_ge8"), r.getAs[Long]("n_ge16"),
          r.getAs[Long]("n_ge32"), r.getAs[Long]("max_len"))).toMap
    assert(got.keySet == want.keySet)
    for ((d, w) <- want)
      assert(got(d) == w, s"doc $d: got ${got(d)}, want $w")
    // the planted 20-token copies must report their full span length
    val planted = got.filter(_._1 >= 200000L)
    assert(planted.nonEmpty)
    planted.foreach { case (d, (_, _, _, mx)) =>
      assert(mx >= 20L, s"planted doc $d max match $mx < the 20-token span")
    }
  }

  test("suffix rounds derive from max document length (no 256-token cliff)") {
    assert(operators.SuffixArray.roundsFor(1) == 0)
    assert(operators.SuffixArray.roundsFor(4) == 0)
    assert(operators.SuffixArray.roundsFor(5) == 1)
    assert(operators.SuffixArray.roundsFor(256) == 3)
    assert(operators.SuffixArray.roundsFor(257) == 4)
    assert(operators.SuffixArray.roundsFor(1024) == 4)
    // planted corpus: two 301-token documents identical through token 300,
    // differing only at the last token — any fixed-256-cover chain ties
    // their suffixes; the derived chain must separate every distinct pair
    import spark.implicits._
    def mk(d: Long, last: String) =
      (1 to 300).map(p => (d, p, "a")) :+ ((d, 301, last))
    val toks = (mk(1L, "x") ++ mk(2L, "y")).toDF("doc_id", "p", "tok")
    def ranked(rounds: Int): Map[(Long, Int), Long] =
      operators.SuffixArray.ranksOfToks(toks, rounds).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("p")) ->
          r.getAs[Long]("r")).toMap
    val now = ranked(operators.SuffixArray.roundsFor(301)) // 4 rounds
    assert(now.size == 602)
    // every suffix here is distinct (cross-doc pairs diverge at x vs y;
    // same-doc pairs differ in length) — so every rank must be distinct
    assert(now.values.toSet.size == 602,
      "distinct suffixes of a >256-token document must get distinct ranks")
    // and the former fixed Rounds=3 chain DOES tie them — the silent
    // cliff this change removes
    val old = ranked(3)
    assert(old((1L, 1)) == old((2L, 1)),
      "3 rounds cover only 256 tokens; the planted pair must tie there")
  }

  test("dedup_suffix_strip: removes a planted within-document repeat " +
    "that the gram-resolution strip cannot see") {
    import spark.implicits._
    // doc 1 repeats a 10-token span INSIDE itself (tokens 11-20 and
    // 26-35); doc 2 is unrelated. The gram strip's duplicated-gram
    // predicate needs >= 2 DISTINCT documents, so it removes nothing;
    // the suffix strip must remove exactly the second occurrence.
    val span = (1 to 10).map(i => s"s$i").mkString(" ")
    val d1 = ((1 to 10).map(i => s"p$i") ++ span.split(" ") ++
      (1 to 5).map(i => s"m$i") ++ span.split(" ") ++
      (1 to 3).map(i => s"t$i")).mkString(" ")
    val d2 = (1 to 12).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    assert(operators.SubstringDedup.stripOf(docs, 8).collect().isEmpty,
      "the fixed-k strip must MISS the within-document repeat")
    val got = operators.SuffixArray.stripOfCorpus(docs, 8).collect()
    assert(got.length == 1 && got.head.getAs[Long]("doc_id") == 1L)
    assert(got.head.getAs[Long]("n_removed") == 10L,
      s"exactly the 10-token second occurrence: ${got.head}")
    assert(got.head.getAs[Long]("n_kept") == 28L)
    // the cleaned text is the original minus tokens 26-35, first
    // occurrence verbatim
    val want = ((1 to 10).map(i => s"p$i") ++ span.split(" ") ++
      (1 to 5).map(i => s"m$i") ++ (1 to 3).map(i => s"t$i")).mkString(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(want.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.head.getAs[String]("clean_hash") == md)
  }

  test("suffix construction: no collect, no cartesian, bounded windows") {
    val p = operators.SuffixArray.suffixMaxmatch(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    // the round tables are localCheckpointed scans here; the only windows
    // in the BUILD ran inside DistRank over (stratum, __rp) slices
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "src/main/scala/graft/operators/SuffixArray.scala")))
    assert(!src.contains(".collect()"),
      "the construction must stay fully distributed")
    assert(src.contains("DistRank.rowNumber"),
      "dense ranking must go through the two-phase rank")
  }
}
