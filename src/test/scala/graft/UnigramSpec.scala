package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {

  private def vocabOf(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("piece", "cnt")
  }

  private def wordsOf(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("word", "cnt")
  }

  test("viterbi picks the globally cheapest segmentation, not a greedy one") {
    // 'ab' is much more frequent than 'a'/'b' ⇒ cheaper; "abab" must
    // segment as two 'ab' pieces, never four singles
    val v = vocabOf("a" -> 1L, "b" -> 1L, "ab" -> 100L)
    val segs = Unigram.segment(wordsOf("abab" -> 1L), v).collect()
    assert(segs.head.getAs[String]("seg") == "ab ab")
  }

  test("cost ties break toward the smallest predecessor (longest last piece)") {
    // equal counts ⇒ equal costs; "abc" has two optimal paths
    // a|bc and ab|c — the encoded argmin picks the smaller backpointer,
    // i.e. the LONGER final piece 'bc'
    val v = vocabOf("a" -> 5L, "ab" -> 5L, "bc" -> 5L, "c" -> 5L, "b" -> 5L)
    val segs = Unigram.segment(wordsOf("abc" -> 1L), v).collect()
    assert(segs.head.getAs[String]("seg") == "a bc")
  }

  test("single-character coverage: any word segments even with no " +
    "multi-char piece applicable") {
    val v = vocabOf("z" -> 2L, "q" -> 3L, "zz" -> 9L)
    val segs = Unigram.segment(wordsOf("qzq" -> 1L), v).collect()
    assert(segs.head.getAs[String]("seg") == "q z q")
  }

  test("gate segmentations reconstruct every word exactly and are " +
    "cost-optimal under the trained vocabulary (local DP replay)") {
    val segs = Unigram.finalSegs(spark, sf).collect()
      .map(r => (r.getAs[String]("word"), r.getAs[String]("seg")))
    assert(segs.nonEmpty)
    // reconstruction: pieces concatenate back to the word
    segs.foreach { case (w, g) =>
      assert(g.replace(" ", "") == w, s"seg '$g' does not rebuild '$w'")
    }
    // local integer replay of the cost model over the trained vocab
    val vr = Unigram.finalVocab(spark, sf).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("cnt")))
    def llog2(x: Long): Long = {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
      val fr = x * 1024L / (1L << (bl - 1)) - 1024L
      (bl - 1) * 1024L + fr + fr * (1024L - fr) * 357L / (1024L * 1024L)
    }
    val t = vr.map(_._2).sum
    val cost = vr.map { case (p, c) => p -> (llog2(t) - llog2(c)) }.toMap
    val big = 1000000000L
    segs.foreach { case (w, g) =>
      // DP optimum over the same vocab
      val dp = Array.fill(w.length + 1)(Long.MaxValue / 4)
      dp(0) = 0L
      for (i <- 1 to w.length; j <- math.max(0, i - 4) until i)
        dp(i) = math.min(dp(i),
          dp(j) + cost.getOrElse(w.substring(j, i), big))
      val got = g.split(" ").map(p => cost.getOrElse(p, big)).sum
      assert(got == dp(w.length),
        s"'$w' → '$g' costs $got, optimum ${dp(w.length)}")
    }
  }

  test("training prunes: every retained multi-char piece was used, and " +
    "the vocabulary keeps all corpus characters") {
    val v = Unigram.finalVocab(spark, sf).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("cnt")))
    assert(v.nonEmpty && v.forall(_._2 >= 1L))
    val chars = Unigram.finalSegs(spark, sf).collect()
      .flatMap(_.getAs[String]("word").toSeq).toSet
    val singles = v.map(_._1).filter(_.length == 1).map(_.head).toSet
    assert(chars.subsetOf(singles))
  }

  test("tokenize_unigram: piece counts are consistent and every doc " +
    "appears once") {
    val rows = Unigram.tokenizeUnigram(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pieces") >= r.getAs[Long]("n_words"))
    }
  }

  test("unigram plans: no UDFs, DP stays a narrow map over the word table") {
    val plan = Unigram.tokenizeUnigram(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
