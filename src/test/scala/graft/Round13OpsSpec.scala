package graft

import graft.operators.{Filtering, TrainPrep}
import org.apache.spark.sql.functions._

/** Round-13 operator specs (the driver's oracle gate checks values; these
  * pin the ALGEBRAIC contracts a hash can't articulate).
  */
class Round13OpsSpec extends SparkSpec {

  // --------------------------------------------------------- dpo_pairs

  test("dpo_pairs: strict preference, prompt identity, selection replay") {
    val pairs = TrainPrep.dpoPairs(spark, sf).collect()
    assert(pairs.nonEmpty)
    // ground truth: (doc_id, n_words, quality) per doc, replayed locally
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(operators.TextNorm.norm, " ")).cast("long").as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    val qual = operators.TextOps.textQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val byBlock = docs.keys.groupBy(_ / 4)
    for (p <- pairs) {
      val pid = p.getAs[Long]("prompt_id")
      val ch = p.getAs[Long]("chosen_doc")
      val rj = p.getAs[Long]("rejected_doc")
      val cq = p.getAs[Double]("chosen_quality")
      val rq = p.getAs[Double]("rejected_quality")
      // every pair carries a STRICT preference signal
      assert(cq > rq, s"pair $pid: chosen $cq !> rejected $rq")
      assert(ch != rj, s"pair $pid: chosen == rejected")
      // both branches belong to the prompt's block
      val block = byBlock(pid).toSet
      assert(block.contains(ch) && block.contains(rj))
      // selection replay: chosen = argmax (quality, -id), rejected the dual
      val ranked = block.toSeq.map(d => (qual(d), d))
      val expCh = ranked.maxBy { case (q, d) => (q, -d) }._2
      val expRj = ranked.minBy { case (q, d) => (q, -d) }._2
      assert(ch == expCh && rj == expRj,
        s"pair $pid: selection ($ch,$rj) != replay ($expCh,$expRj)")
      // prompt identity between branches: one shared span_start, derived
      // from the ANCHOR doc's 2-turn split
      val anchor = p.getAs[Long]("prompt_doc")
      assert(anchor == block.min)
      assert(p.getAs[Long]("n_prompt_tokens") == docs(anchor) / 2)
      assert(p.getAs[Long]("span_start") == docs(anchor) / 2 + 3)
      assert(p.getAs[String]("chosen_span") ==
        s"${p.getAs[Long]("span_start")}:${p.getAs[Long]("n_chosen_tokens")}")
      // completion accounting: the candidate's own second turn
      assert(p.getAs[Long]("n_chosen_tokens") == docs(ch) - docs(ch) / 2)
      assert(p.getAs[Long]("n_rejected_tokens") == docs(rj) - docs(rj) / 2)
    }
    // mask replay: the 0/1 stream is [0]*(p+2) ++ [1]*c, hashed
    val md = java.security.MessageDigest.getInstance("MD5")
    for (p <- pairs.take(5)) {
      val mask = "0" * (p.getAs[Long]("n_prompt_tokens").toInt + 2) +
        "1" * p.getAs[Long]("n_chosen_tokens").toInt
      val h = md.digest(mask.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(h == p.getAs[String]("chosen_mask_hash"))
    }
    // groups without a strict gap are DROPPED, not emitted degenerate:
    // every block with >= 2 members and a quality spread appears
    val expected = byBlock.count { case (_, ds) =>
      ds.size >= 2 && ds.map(qual).toSet.size > 1
    }
    assert(pairs.length == expected)
  }

  // --------------------------------------------------- pack_efficiency

  /** Literal sequential next-fit simulation — the layout the distributed
    * orbit must reproduce exactly.
    */
  private def nextFit(lens: Seq[Long], budget: Long): Seq[Long] = {
    val bins = scala.collection.mutable.ArrayBuffer[Long]()
    var cur = 0L
    for (n <- lens) {
      if (cur + n > budget && cur > 0) { bins += cur; cur = 0L }
      cur += n
    }
    if (cur > 0) bins += cur
    bins.toSeq
  }

  test("pack_efficiency: distributed next-fit orbit == sequential replay; " +
    "FFD waste <= both shipped layouts") {
    val rows = TrainPrep.packEfficiency(spark, sf).collect()
    assert(rows.length == 9)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(operators.TextNorm.norm, " ")).cast("long").as("n"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n")))
      .sortBy(_._1)
    val total = docs.map(_._2).sum
    for (b <- Seq(512L, 1024L, 2048L)) {
      val byStrat = rows.filter(_.getAs[Long]("budget") == b)
        .map(r => r.getAs[String]("strategy") -> r).toMap
      // stream: closed-form bins, zero oversize, waste = final remainder
      val st = byStrat("stream")
      assert(st.getAs[Long]("n_bins") == (total + b - 1) / b)
      assert(st.getAs[Long]("waste_tokens") ==
        st.getAs[Long]("n_bins") * b - total)
      // no-split layouts replay the literal sequential packer
      val elig = docs.filter(_._2 <= b)
      val fillsDoc = nextFit(elig.map(_._2), b)
      val fillsLen = nextFit(
        elig.sortBy { case (d, n) => (-n, d) }.map(_._2), b)
      val nd = byStrat("nf_doc"); val nl = byStrat("nf_len")
      assert(nd.getAs[Long]("n_bins") == fillsDoc.length,
        s"budget $b: nf_doc bins ${nd.getAs[Long]("n_bins")} != " +
          s"replay ${fillsDoc.length}")
      assert(nl.getAs[Long]("n_bins") == fillsLen.length)
      assert(nd.getAs[Long]("min_fill") == fillsDoc.min)
      assert(nd.getAs[Long]("max_fill") == fillsDoc.max)
      assert(nl.getAs[Long]("min_fill") == fillsLen.min)
      assert(nl.getAs[Long]("max_fill") == fillsLen.max)
      // token conservation: every eligible token lands in exactly one bin
      assert(fillsDoc.sum == elig.map(_._2).sum)
      assert(nd.getAs[Long]("waste_tokens") ==
        fillsDoc.length * b - fillsDoc.sum)
      // stream's split-packing is the waste lower bound among the three
      assert(st.getAs[Long]("waste_tokens") <=
        nd.getAs[Long]("waste_tokens"))
      assert(st.getAs[Long]("waste_tokens") <=
        nl.getAs[Long]("waste_tokens"))
      // true FFD (open-bin state, sequential replay): at least as good
      // as BOTH shipped O(1)-state layouts — the quantified cost of
      // bounded packer state
      val ffdBins = {
        val bins = scala.collection.mutable.ArrayBuffer[Long]()
        for (n <- elig.sortBy { case (d, ln) => (-ln, d) }.map(_._2)) {
          val j = bins.indexWhere(_ + n <= b)
          if (j >= 0) bins(j) += n else bins += n
        }
        bins.toSeq
      }
      val ffdWaste = ffdBins.length * b - ffdBins.sum
      assert(ffdWaste <= nd.getAs[Long]("waste_tokens"),
        s"budget $b: FFD $ffdWaste > nf_doc")
      assert(ffdWaste <= nl.getAs[Long]("waste_tokens"),
        s"budget $b: FFD $ffdWaste > nf_len")
      // fill histogram replay
      def hist(fills: Seq[Long]): String =
        (0 to 9).map(i => fills.count(f =>
          math.min(9L, f * 10 / b) == i)).mkString(",")
      assert(nd.getAs[String]("fill_hist") == hist(fillsDoc))
      assert(nl.getAs[String]("fill_hist") == hist(fillsLen))
    }
  }

  // ----------------------------------------------------- span_corruption

  test("span_corruption: spans replay from the doc/block hash, never " +
    "overlap, stay inside their block; accounting and mask are exact") {
    val rows = TrainPrep.spanCorruption(spark, sf).collect()
    assert(rows.length == 500)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sd: String): Long = java.lang.Long.parseLong(
      md.digest(sd.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(8), 16)
    var totTok = 0L; var totCor = 0L
    for (r <- rows) {
      val n = r.getAs[Long]("n_tokens")
      val spans = Option(r.getAs[String]("spans")).filter(_.nonEmpty)
        .map(_.split(',').toSeq.map { sp =>
          val Array(st, ln) = sp.split(':').map(_.toLong); (st, ln)
        }).getOrElse(Seq.empty)
      assert(spans.length == n / 20)
      assert(r.getAs[Long]("n_spans") == spans.length)
      // replay each block's hash-derived (start, len)
      spans.zipWithIndex.foreach { case ((st, ln), i) =>
        val b = i + 1
        val hv = h(s"${r.getAs[Long]("doc_id")}:sc$b")
        val expLn = 2 + hv % 3
        val expSt = (b - 1) * 20 + (hv / 3) % (20 - expLn + 1)
        assert(st == expSt && ln == expLn,
          s"doc ${r.getAs[Long]("doc_id")} block $b: ($st,$ln)")
        // contained in its block → non-overlapping by construction
        assert(st >= (b - 1) * 20 && st + ln <= b.toLong * 20)
      }
      val cor = spans.map(_._2).sum
      assert(r.getAs[Long]("n_corrupted") == cor)
      assert(r.getAs[Long]("input_len") == n - cor + spans.length)
      assert(r.getAs[Long]("target_len") == cor + spans.length + 1)
      // mask replay
      val mask = new StringBuilder
      var p = 0L
      spans.foreach { case (st, ln) =>
        mask.append("0" * (st - p).toInt).append("1" * ln.toInt)
        p = st + ln
      }
      mask.append("0" * (n - p).toInt)
      val mh = md.digest(mask.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(mh == r.getAs[String]("mask_hash"))
      totTok += n; totCor += cor
    }
    // corpus-wide corruption rate lands near the T5 target (15%): one
    // mean-3 span per 20-token block, minus the uncorrupted tail blocks
    val rate = totCor.toDouble / totTok
    assert(rate > 0.10 && rate < 0.16, f"corpus corruption rate $rate%.4f")
    // plan shape: the promised one-narrow-map — 1 scan, 1 exchange (the
    // output sort), zero joins/aggregates/windows (the sft_mask_spans
    // executed-plan contract)
    val plan = TrainPrep.spanCorruption(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).length == 1)
    Seq("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
      "HashAggregate", "Window").foreach(op =>
      assert(!plan.contains(op), s"unexpected $op in span_corruption plan"))
  }

  // ---------------------------------------- pack_efficiency, adversarial

  test("pack_efficiency: one-doc-per-bin corpus (docs just over half " +
    "budget) — the orbit covers ALL 2*total/budget bins") {
    // the review scenario the gate corpus cannot exercise: every doc is
    // 300 tokens, so at budget 512 next-fit closes a bin per doc and
    // n_bins = n_docs ≈ 2 * total / budget — an orbit depth bound of
    // total/budget + 2 would silently truncate here
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("packadv").toString
    val word300 = Array.fill(300)("w").mkString(" ")
    spark.range(400)
      .select(col("id").as("doc_id"), lit(word300).as("text"),
        lit("en").as("lang"), lit("web").as("source"),
        lit(word300.length.toLong).as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      Memo.clear(spark)
      val rows = TrainPrep.packEfficiency(spark, dir).collect()
      val nd512 = rows.find(r => r.getAs[Long]("budget") == 512L &&
        r.getAs[String]("strategy") == "nf_doc").get
      // 400 docs x 300 tokens: one doc per bin at budget 512
      assert(nd512.getAs[Long]("n_bins") == 400L,
        s"orbit truncated: ${nd512.getAs[Long]("n_bins")} bins")
      assert(nd512.getAs[Long]("waste_tokens") == 400L * 512 - 400L * 300)
      assert(nd512.getAs[Long]("min_fill") == 300L)
      // budget 1024 fits three docs per bin (3*300=900, +300 > 1024)
      val nd1024 = rows.find(r => r.getAs[Long]("budget") == 1024L &&
        r.getAs[String]("strategy") == "nf_doc").get
      assert(nd1024.getAs[Long]("n_bins") == (400L + 2) / 3)
    } finally {
      Memo.clear(spark)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  // --------------------------------------------------- split_by_cluster

  test("split_by_cluster: whole-cluster reassignment closes every leak " +
    "the split_leakage audit flags") {
    val rows = operators.Clustering.splitByCluster(spark, sf).collect()
    assert(rows.nonEmpty)
    // local split replay (the one shared hash definition)
    val md = java.security.MessageDigest.getInstance("MD5")
    def splitOf(id: Long): String = {
      val b = java.lang.Long.parseLong(
        md.digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8), 16) % 10
      if (b < 8) "train" else if (b == 8) "val" else "test"
    }
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (c, ms) =>
      // the cluster label IS the min member (propagation invariant)
      assert(ms.map(_.getAs[Long]("doc_id")).min == c)
      // one split per cluster, the min member's hash split
      assert(ms.map(_.getAs[String]("split_new")).toSet == Set(splitOf(c)))
      ms.foreach { m =>
        assert(m.getAs[String]("split_old") ==
          splitOf(m.getAs[Long]("doc_id")))
        assert(m.getAs[Long]("changed") ==
          (if (m.getAs[String]("split_old") != m.getAs[String]("split_new"))
            1L else 0L))
      }
    }
    // output covers exactly the duplicate subset
    val cl = operators.Clustering.dedupClusters(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet ==
      cl.map(_.getAs[Long]("doc_id")).toSet)
    // the FIX property: every pair the leakage audit flags ends up
    // co-split after reassignment
    val newSplit = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("split_new")).toMap
    val leaks = operators.Dedup.splitLeakage(spark, sf).collect()
      .filter(_.getAs[Boolean]("leak"))
    assert(leaks.nonEmpty, "gate corpus must exercise the leak branch")
    leaks.foreach { p =>
      val a = p.getAs[Long]("id_a"); val b = p.getAs[Long]("id_b")
      assert(newSplit(a) == newSplit(b),
        s"pair ($a,$b) still split-straddling after reassignment")
    }
  }

  // --------------------------------------------------------- langid_clf

  test("langid_clf: trained accuracy strictly beats the heuristic; " +
    "predictions live in the label set") {
    val rows = Filtering.langidClf(spark, sf).collect()
    assert(rows.length == 500)
    val langs = Set("en", "es", "fr", "de", "zh")
    rows.foreach { r =>
      assert(langs.contains(r.getAs[String]("clf_pred")))
      assert(langs.contains(r.getAs[String]("heur_pred")))
      assert(r.getAs[Long]("clf_correct") ==
        (if (r.getAs[String]("clf_pred") == r.getAs[String]("lang_actual"))
          1L else 0L))
    }
    val clfAcc = rows.map(_.getAs[Long]("clf_correct")).sum.toDouble /
      rows.length
    val heurAcc = rows.map(_.getAs[Long]("heur_correct")).sum.toDouble /
      rows.length
    // the gate's reason to exist: the char-n-gram model extracts the
    // planted morphology the word lexicons cannot see
    assert(clfAcc > heurAcc,
      f"clf $clfAcc%.3f must beat heuristic $heurAcc%.3f")
    assert(clfAcc >= 0.95, f"clf accuracy $clfAcc%.3f below 0.95")
  }
}
