package graft

import graft.operators.SubstringDedup

class SubstringDedupSpec extends SparkSpec {

  private def docs(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("adjacent duplicated gram positions merge into ONE maximal span") {
    // docs share tokens 1..10; with k=4 the duplicated grams start at
    // positions 1..7 (adjacent), so each doc reports exactly one span
    // [1, 10] of 7 grams shared by 2 docs
    val d = docs(
      1 -> "a b c d e f g h i j k l",
      2 -> "a b c d e f g h i j x y")
    val spans = SubstringDedup.spansOf(d, 4).collect()
    assert(spans.length == 2)
    spans.foreach { r =>
      assert(r.getAs[Int]("span_start") == 1)
      assert(r.getAs[Int]("span_end") == 10)
      assert(r.getAs[Long]("n_grams") == 7L)
      assert(r.getAs[Long]("n_docs") == 2L)
    }
  }

  test("separated duplicated regions stay SEPARATE spans") {
    // "m n o p" is shared across both docs at two non-adjacent positions
    // in doc 4 — the gaps-and-islands merge must NOT bridge the gap
    val d = docs(
      3 -> "m n o p u1 u2 u3 u4 u5",
      4 -> "m n o p v1 v2 v3 v4 m n o p")
    val spans = SubstringDedup.spansOf(d, 4).collect()
    val byDoc = spans.groupBy(_.getAs[Int]("doc_id"))
    assert(byDoc(3).map(r => (r.getAs[Int]("span_start"),
      r.getAs[Int]("span_end"))).toSeq == Seq((1, 4)))
    assert(byDoc(4).map(r => (r.getAs[Int]("span_start"),
      r.getAs[Int]("span_end"))).toSeq.sorted == Seq((1, 4), (9, 12)))
  }

  test("strip keeps the global first occurrence, removes the rest") {
    val d = docs(
      1 -> "a b c d e f g h i j k l",
      2 -> "a b c d e f g h i j x y")
    val strip = SubstringDedup.stripOf(d, 4).collect()
    // only doc 2 is affected: doc 1 owns every shared gram (smaller id)
    assert(strip.map(_.getAs[Int]("doc_id")).toSeq == Seq(2))
    val r = strip.head
    assert(r.getAs[Long]("n_removed") == 10L, "tokens 1..10 stripped")
    assert(r.getAs[Long]("n_kept") == 2L, "x y survive")
  }

  test("within-doc repeats of a cross-doc gram also strip to one copy") {
    val d = docs(
      3 -> "m n o p u1 u2 u3 u4 u5",
      4 -> "m n o p v1 v2 v3 v4 m n o p")
    val strip = SubstringDedup.stripOf(d, 4).collect()
    // doc 3 owns "m n o p"; BOTH of doc 4's occurrences strip
    assert(strip.map(_.getAs[Int]("doc_id")).toSeq == Seq(4))
    assert(strip.head.getAs[Long]("n_removed") == 8L)
    assert(strip.head.getAs[Long]("n_kept") == 4L)
  }

  test("gate finds the planted cross-doc spans at sf0.001") {
    val spans = SubstringDedup.dedupSubstring(spark, sf).collect()
    // every planted doc (doc_id+200000) must report at least one span of
    // >= PlantLen tokens, and its source must report one too
    val planted = spans.filter(_.getAs[Long]("doc_id") >= 200000L)
    assert(planted.nonEmpty, "planted copies must be detected")
    planted.foreach { r =>
      val len = r.getAs[Int]("span_end") - r.getAs[Int]("span_start") + 1
      assert(len >= 20, s"planted span only $len tokens")
      val src = r.getAs[Long]("doc_id") - 200000L
      assert(spans.exists(_.getAs[Long]("doc_id") == src),
        s"source doc $src of planted copy must report a span")
    }
  }

  test("strip conserves tokens: kept + removed = document length") {
    val d = docs(
      1 -> "a b c d e f g h i j k l",
      2 -> "a b c d e f g h i j x y")
    val strip = SubstringDedup.stripOf(d, 4).collect()
    strip.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") == 12L)
    }
  }
}
