package graft

import graft.operators.{Multimodal, Similarity}

class SimilaritySpec extends SparkSpec {

  test("ann_topk: k results per probe, cosine descending, self excluded") {
    val rows = Similarity.annTopk(spark, sf).collect()
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.size == 10) // 500 vectors, every 50th is a probe
    byProbe.foreach { case (p, g) =>
      assert(g.length == 5)
      assert(g.forall(_.getAs[Long]("vec_id") != p))
      val cs = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ann_lsh results are a subset of the brute-force candidates' quality") {
    val lsh = Similarity.annLsh(spark, sf).collect()
    assert(lsh.nonEmpty)
    // every probe's LSH top-1 must be in its own bucket and rank correctly
    lsh.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, g) =>
      val rs = g.map(_.getAs[Int]("rank")).sorted
      assert(rs.head == 1 && rs.toSeq == (1 to rs.length))
    }
  }

  test("ann_lsh_multi: OR-amplification never loses recall vs one table") {
    // table 0 of the multi-table variant IS ann_lsh's hash function, so
    // every single-table candidate survives; the best cosine per probe can
    // only improve (or stay equal) with the second table's candidates
    val single = Similarity.annLsh(spark, sf).collect()
      .filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Double]("cos")).toMap
    val multi = Similarity.annLshMulti(spark, sf).collect()
      .filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Double]("cos")).toMap
    assert(single.keySet.subsetOf(multi.keySet))
    single.foreach { case (p, c) => assert(multi(p) >= c, s"probe $p") }
  }

  test("ann_ivf: ranks are dense per probe and cosines ordered") {
    val rows = Similarity.annIvf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, g) =>
      val rs = g.map(_.getAs[Int]("rank")).sorted
      assert(rs.head == 1 && rs.toSeq == (1 to rs.length))
      val cs = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("dedup_embedding: pairs are symmetric-free and above threshold") {
    val rows = Similarity.dedupEmbedding(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(rows.forall(_.getAs[Double]("cos") >= 0.45))
  }

  test("decontaminate_semantic: flags corpus vectors near eval vectors, " +
    "a subset of the brute-force pair set") {
    val rows = Similarity.decontaminateSemantic(spark, sf).collect()
    assert(rows.nonEmpty, "no contamination fired at this scale")
    // brute-force cosine over the same quantization (superset of the
    // LSH-candidate path)
    val q = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding"))
          .map(x => math.floor(x.toDouble * 1e7 + 0.5).toLong).toArray)
    val n2 = q.map { case (id, v) => id -> v.map(x => x * x).sum }.toMap
    val qm = q.toMap
    def cos(a: Long, b: Long): Double =
      qm(a).zip(qm(b)).map { case (x, y) => x * y }.sum.toDouble /
        (math.sqrt(n2(a).toDouble) * math.sqrt(n2(b).toDouble))
    val evals = q.map(_._1).filter(_ % 5 == 0)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(id % 5 != 0, s"eval vector $id flagged as corpus")
      assert(r.getAs[Double]("max_cos") >= 0.4)
      val brute = evals.map(e => cos(id, e)).filter(_ >= 0.4)
      assert(r.getAs[Long]("n_eval_hits") <= brute.length,
        s"vec $id claims more hits than brute force finds")
      assert(r.getAs[Double]("max_cos") <= brute.max + 1e-6,
        s"vec $id max_cos above the brute-force max")
    }
  }

  test("multimodal_meta: kinds cycle by doc_id, sizes = magic + utf8 body") {
    val rows = Multimodal.multimodalMeta(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expect = Seq("image/png", "image/jpeg", "audio/wav")((id % 3).toInt)
      assert(r.getAs[String]("media_kind") == expect)
      assert(r.getAs[Int]("n_bytes") > 4)
    }
  }

  test("decodeImages: real javax.imageio decode, digest pinned to generator") {
    val feats = Multimodal.decodeImages(spark, sf).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.width == Multimodal.ImgW && f.height == Multimodal.ImgH)
      assert(f.channels == 3)
      // PNG is lossless: the decoded RGB bytes must be EXACTLY the
      // generator's — one flipped bit anywhere fails the md5
      val expect = Multimodal.rgbBytes(f.doc_id)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(expect).map("%02x".format(_)).mkString
      assert(f.pix_md5 == md, s"doc ${f.doc_id}: decoded pixels differ")
      assert(f.pix_sum == expect.map(_ & 0xff).map(_.toLong).sum)
    }
  }

  test("decodeAudio: real WAV codec roundtrip, PCM digest pinned") {
    val rows = Multimodal.decodeAudio(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Int]("rate") == 8000 && r.getAs[Int]("channels") == 1)
      assert(r.getAs[Int]("bits") == 16)
      assert(r.getAs[Int]("n_samples") == Multimodal.AudSamples)
      // WAV PCM is lossless: decoded bytes must be EXACTLY the generator's
      val expect = Multimodal.pcmBytes(r.getAs[Long]("doc_id"))
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(expect).map("%02x".format(_)).mkString
      assert(r.getAs[String]("pcm_md5") == md,
        s"doc ${r.getAs[Long]("doc_id")}: decoded samples differ")
    }
    // decimation: out sample i == in sample 2i, half count, half rate
    val rs = Multimodal.resampleAudio(spark, sf).collect()
    assert(rs.length == 500)
    rs.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("out_samples") == Multimodal.AudSamples / 2)
      assert(r.getAs[Int]("out_rate") == 4000)
      val full = Multimodal.pcmBytes(id)
      var expect = 0L
      for (i <- 0 until Multimodal.AudSamples / 2)
        expect += (((full(4 * i) & 0xff) | (full(4 * i + 1).toInt << 8)).toShort: Long)
      assert(r.getAs[Long]("out_sample_sum") == expect, s"doc $id")
    }
  }

  test("resize and frame-sample plumbing match the payload geometry") {
    val rs = Multimodal.resizeImages(spark, sf).collect()
    assert(rs.length == 500)
    rs.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("out_w") == Multimodal.ImgW / 2)
      assert(r.getAs[Int]("out_h") == Multimodal.ImgH / 2)
      // nearest-neighbour at stride 2 = generator at even coordinates
      val full = Multimodal.rgbBytes(id)
      var expect = 0L
      for (y <- 0 until Multimodal.ImgH / 2; x <- 0 until Multimodal.ImgW / 2;
           c <- 0 until 3)
        expect += full((y * 2 * Multimodal.ImgW + x * 2) * 3 + c) & 0xff
      assert(r.getAs[Long]("out_pix_sum") == expect, s"doc $id")
    }
    val meta = Multimodal.multimodalMeta(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_bytes")).toMap
    val fr = Multimodal.frameSample(spark, sf).collect()
    assert(fr.nonEmpty)
    assert(fr.forall(_.getAs[Long]("frame_idx") % 4 == 0))
    assert(fr.forall(r => r.getAs[Long]("frame_len") <= 16 &&
      r.getAs[Long]("frame_len") > 0))
    // per doc: sampled frames = ceil(nframes / 4) for stride-4 sampling
    fr.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, g) =>
      val nf = (meta(id) + 15) / 16
      assert(g.length == (nf + 3) / 4, s"doc $id")
    }
  }

  test("ann_ivf_pq: ADC scores agree with ann_pq on shared pairs") {
    val ivfpq = Similarity.annIvfPq(spark, sf).collect()
    assert(ivfpq.nonEmpty)
    ivfpq.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, g) =>
      val byRank = g.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq ==
        (1 to byRank.length).toSeq)
      val adcs = byRank.map(_.getAs[Long]("adc"))
      assert(adcs.zip(adcs.tail).forall { case (x, y) => x <= y })
    }
    // the PQ code assignment is shared machinery: any (probe, vec) pair
    // present in both indexes must carry the identical ADC distance
    val pq = Similarity.annPq(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")) ->
        r.getAs[Long]("adc")).toMap
    val shared = ivfpq.flatMap { r =>
      val key = (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))
      pq.get(key).map(adc => (key, r.getAs[Long]("adc"), adc))
    }
    assert(shared.nonEmpty)
    shared.foreach { case (key, a, b) => assert(a == b, s"pair $key") }
  }

  test("knn_graph: every edge is a non-self neighbour, cosine-ordered") {
    val rows = Similarity.knnGraph(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("src") != r.getAs[Long]("nbr")))
    rows.groupBy(_.getAs[Long]("src")).foreach { case (_, g) =>
      val byRank = g.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq ==
        (1 to byRank.length).toSeq)
      val cs = byRank.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
    // the graph covers (nearly) the whole corpus, not a probe subset —
    // only bucket-singletons may be absent
    assert(rows.map(_.getAs[Long]("src")).distinct.length > 400)
  }

  test("ann_topk_filtered: every result shares the probe's label and " +
    "single-stage filtering beats post-filtering the unfiltered top-k") {
    import org.apache.spark.sql.functions.col
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = Similarity.annTopkFiltered(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("probe_id")) ==
        labels(r.getAs[Long]("vec_id")), "filter violated")
      assert(r.getAs[Long]("probe_id") != r.getAs[Long]("vec_id"))
    }
    // every probe gets its full k (label populations exceed k here)
    val perProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    perProbe.values.foreach(g => assert(g.length == 5))
    // post-filtering the UNFILTERED top-k returns fewer matches: the
    // unfiltered list keeps wrong-label candidates, so its label-matching
    // subset is strictly smaller than k for at least one probe
    val unf = Similarity.annTopk(spark, sf).collect()
    val postFiltered = unf.filter(r => labels(r.getAs[Long]("probe_id")) ==
      labels(r.getAs[Long]("vec_id")))
    val short = postFiltered.groupBy(_.getAs[Long]("probe_id"))
      .exists(_._2.length < 5)
    assert(short || perProbe.keySet.exists(p =>
      !postFiltered.exists(_.getAs[Long]("probe_id") == p)),
      "post-filtering should come up short somewhere on a 10-label corpus")
  }

  test("ann_filtered_recall: bracket [0,1], k-consistent, and the " +
    "filtered index finds at least some exact hits") {
    val rows = Similarity.annFilteredRecall(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (h, k) = (r.getAs[Long]("hits"), r.getAs[Long]("k"))
      assert(h >= 0 && h <= k)
      assert(r.getAs[Double]("recall") ==
        math.rint(h.toDouble / k * 1e6) / 1e6)
    }
    assert(rows.map(_.getAs[Long]("hits")).sum > 0)
  }
  test("hard_negatives: positive is the exact nearest neighbor, " +
    "negatives are the hardest non-duplicates") {
    val rows = operators.Similarity.hardNegatives(spark, sf).collect()
    val base = operators.Similarity.annTopk(spark, sf, 10).collect()
    val byProbe = base.groupBy(_.getAs[Long]("probe_id"))
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, rs) =>
      val top = byProbe(p).sortBy(_.getAs[Int]("rank"))
      val pos = rs.filter(_.getAs[String]("role") == "positive")
      assert(pos.length == 1)
      assert(pos.head.getAs[Long]("vec_id") == top.head.getAs[Long]("vec_id"))
      val negs = rs.filter(_.getAs[String]("role") == "negative")
        .sortBy(_.getAs[Int]("pick"))
      assert(negs.length <= 2)
      // negatives: below the dup bar, ordered hardest-first, and exactly
      // the top of the non-dup tail
      val expect = top.drop(1)
        .filter(_.getAs[Double]("cos") < 0.45)
        .sortBy(r => (-r.getAs[Double]("cos"), r.getAs[Long]("vec_id")))
        .take(2)
      assert(negs.map(_.getAs[Long]("vec_id")).toSeq ==
        expect.map(_.getAs[Long]("vec_id")).toSeq)
      negs.foreach(n => assert(n.getAs[Double]("cos") < 0.45))
    }
  }
}
