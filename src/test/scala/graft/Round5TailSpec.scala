package graft

import graft.operators.{Clustering, CorpusFilters, MergeScenarios}
import org.apache.spark.sql.functions._

/** Round-5 tail additions: increment-key validation (`bde_TableKeyIsValid`),
  * IVF over the k-means|| codebook, and the cross-document boilerplate
  * audit.
  */
class Round5TailSpec extends SparkSpec {

  test("valid_inc_key accepts unique integer columns and rejects the rest") {
    val out = MergeScenarios.validIncKey(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getBoolean(4), r.getBoolean(5), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      .toMap
    assert(out.keySet == Set("o_orderkey", "o_uniq", "o_custkey",
      "o_orderstatus"))
    // primary key and the synthetic unique column: integer, null-free,
    // fully distinct — valid increment keys
    assert(out("o_orderkey")._2 && out("o_uniq")._2)
    // foreign key: integer but not distinct (many orders per customer)
    val (custInt, custValid, custRows, _, custDistinct) = out("o_custkey")
    assert(custInt && !custValid && custDistinct < custRows)
    // status: not integer-typed, so never a valid key regardless of data
    assert(!out("o_orderstatus")._1 && !out("o_orderstatus")._2)
    // null-free audit is exact (the scenario has no nulls at all)
    assert(out.values.forall(_._4 == 0L))
  }

  test("ann_ivf_kmpll returns a full ranked top-k per probe") {
    val df = Clustering.annIvfKmpll(spark, sf)
    val rows = df.collect()
    val nProbes = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 50 === 0).count()
    assert(rows.length == nProbes * 5, "k results per probe")
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to 5))
      val cs = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        "cosine non-increasing in rank")
      assert(cs.forall(c => c >= -1.0001 && c <= 1.0001))
    }
    // no probe ever pairs with itself
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
  }

  test("ann_ivf_kmpll plans broadcasts, no cartesian product") {
    val p = Clustering.annIvfKmpll(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "IVF probe must stay cell-keyed")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 1,
      "centroids and probe cells ride broadcast joins")
  }

  test("dedup_keep_best keeps the top-quality member of every cluster") {
    val clusters = Clustering.dedupClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val quality = operators.TextOps.textQuality(spark, sf)
      .select("doc_id", "quality")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val best = Clustering.dedupKeepBest(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(best.keySet == clusters.map(_._2).toSet, "one row per cluster")
    clusters.groupBy(_._2).foreach { case (c, members) =>
      val (keepId, keepQ, csize) = best(c)
      assert(members.exists(_._1 == keepId), "keeper is a member")
      assert(csize == members.length)
      val top = members.map(m => (quality(m._1), -m._1))
        .max(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
      assert(keepId == -top._2 && keepQ == top._1,
        s"cluster $c keeps max quality with min-id tie-break")
    }
  }

  test("corpus_stratified_k draws an exact per-stratum quota, trimmed map-side") {
    val df = operators.TrainPrep.corpusStratifiedK(spark, sf)
    val rows = df.collect()
    val strata = Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    strata.foreach { case (src, n) =>
      assert(got(src) == math.min(n, 10L), s"quota for $src")
    }
    // quota members are distinct docs with dense ranks 1..k
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(2)).distinct.length == rs.length)
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length))
    }
    // the rank trim runs below the shuffle too (partial WindowGroupLimit)
    val plan = df.queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(plan).length >= 2,
      "partial + final window group limit expected")
  }

  test("multimodal_phash groups planted byte-copies with their originals") {
    val rows = operators.Multimodal.phashImages(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    val nPlanted = Tables.documents(spark, sf)
      .filter(col("doc_id") % 9 === 0).count()
    assert(rows.map(_.getLong(2)).sum == nDocs + nPlanted,
      "every image lands in exactly one hash group")
    // a planted copy (id+100000) decodes to its base's pixels, so it can
    // NEVER be a group representative (the base id is smaller and must
    // share the hash)
    assert(rows.forall(_.getLong(3) < 100000L), "no planted id is a rep")
    assert(rows.exists(_.getLong(2) >= 2), "dup groups exist")
    assert(rows.length < nDocs + nPlanted, "hashing actually groups")
  }

  test("multimodal_phash_pairs: banded blocking is lossless within the radius") {
    val hs = operators.Multimodal.phashesOf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = operators.Multimodal.phashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute-force all pairs within hamming <= 3 over the collected hashes
    val want = (for {
      i <- hs.indices.iterator
      j <- (i + 1) until hs.length
      d = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2) +
        java.lang.Long.bitCount(hs(i)._3 ^ hs(j)._3)
      if d <= 3
    } yield {
      val (x, y) = (hs(i)._1 min hs(j)._1, hs(i)._1 max hs(j)._1)
      (x, y) -> d.toLong
    }).toMap
    assert(got == want, "band join must find EXACTLY the in-radius pairs")
    // every planted byte-copy surfaces as a hamming-0 pair
    val planted = hs.map(_._1).filter(id => id < 100000 && id % 9 == 0)
    planted.foreach { b =>
      assert(got.get((b, b + 100000)).contains(0L), s"planted pair of $b")
    }
  }

  test("ann_recall equals overlap of the LSH result with exact ground truth") {
    val exact = operators.Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val approx = operators.Similarity.annLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val audit = operators.Similarity.annRecall(spark, sf).collect()
    assert(audit.map(_.getLong(0)).toSet == exact.keySet,
      "one audit row per probe")
    audit.foreach { r =>
      val (p, hits, k, recall) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val want = exact(p).intersect(approx.getOrElse(p, Set.empty)).size
      assert(hits == want && k == exact(p).size)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(math.abs(recall - hits.toDouble / k) < 1e-9)
    }
  }

  test("lm_coverage buckets docs by exact bigram-LM coverage") {
    val rows = operators.TrainPrep.lmCoverage(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (n, in, cov, bucket) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))
      assert(in <= n && cov >= 0.0 && cov <= 1.0)
      val want = if (cov >= 0.7) "head" else if (cov >= 0.5) "middle" else "tail"
      assert(bucket == want)
    }
    // the buckets actually separate the harness corpus
    val buckets = rows.map(_.getString(4)).distinct.toSet
    assert(buckets.size >= 2, s"expected spread across buckets, got $buckets")
  }

  test("corpus_boilerplate is bounded, complete and non-vacuous") {
    val rows = CorpusFilters.corpusBoilerplate(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, "short docs re-enter with zero slots")
    rows.foreach { r =>
      val (nGrams, nBoiler, frac) =
        (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nBoiler >= 0 && nBoiler <= nGrams)
      assert(frac >= 0.0 && frac <= 1.0)
      assert(nGrams > 0 || frac == 0.0)
    }
    // the audit must actually flag something on the harness corpus —
    // a trivially-zero column would make the gate vacuous
    assert(rows.map(_.getLong(2)).sum > 0, "boilerplate set non-empty")
  }

  test("html_extract: local replay matches, every document roundtrips, " +
    "and the script trap defeats naive stripping") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").replaceAll("\\s+", " ").trim.toLowerCase)
    def page(id: Long, nt: String): String =
      s"""<html><head><title>doc $id</title><style>p{margin:0}</style>""" +
        s"""</head><body><h1>doc $id</h1><p class="t">&lt;$nt &amp; """ +
        """tail&gt;</p><script type="x">if (a<b) { var s="</p>"; }""" +
        "</script></body></html>"
    def extract(p: String): String = {
      val noScript = p.replaceAll("(?s)<script[^>]*>.*?</script>", "")
      val noStyle = noScript.replaceAll("(?s)<style[^>]*>.*?</style>", "")
      val noTags = noStyle.replaceAll("<[^>]+>", " ")
      val dec = noTags.replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&amp;", "&")
      dec.replaceAll("\\s+", " ").trim
    }
    val rows = operators.CorpusFilters.htmlExtract(spark, sf).collect()
    assert(rows.length == docs.length)
    val byId = docs.toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val p = page(id, byId(id))
      val clean = extract(p)
      assert(r.getAs[Int]("n_html_chars") == p.length)
      assert(r.getAs[Int]("n_text_chars") == clean.length,
        s"text length mismatch doc $id")
      assert(r.getAs[Long]("roundtrip") == 1L, s"doc $id failed roundtrip")
      assert(clean == s"doc $id doc $id <${byId(id)} & tail>")
    }
    // the trap: tag-stripping WITHOUT removing script blocks first leaks
    // script content — the `a<b` comparison reads as a tag open, so the
    // stripper eats through the string literal and spills `if (a` and
    // `"; }` into the "text" — proving the block-removal pass is
    // load-bearing
    val naive = page(7, "w1 w2").replaceAll("<[^>]+>", " ")
    assert(naive.contains("if (a"), "trap did not trigger — test broken")
    assert(!extract(page(7, "w1 w2")).contains("if (a"),
      "script content leaked through the real extractor")
  }
}
