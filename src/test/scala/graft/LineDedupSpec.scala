package graft

import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {

  test("line_census: planted boilerplate lines surface with family sizes") {
    val docs = Tables.documents(spark, sf)
    val n5 = docs.filter(col("doc_id") % 5 === 0).count()
    val n7 = docs.filter(col("doc_id") % 7 === 0).count()
    val rows = operators.LineDedup.lineCensus(spark, sf).collect()
      .map(r => r.getAs[String]("line_hash") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occ"))).toMap
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows(h("all rights reserved copyright notice")) == ((n5, n5)))
    assert(rows(h("subscribe to our newsletter for updates")) == ((n7, n7)))
  }

  test("line_strip: flagged lines vanish corpus-wide, content survives") {
    import spark.implicits._
    // planted fixture: 4 docs sharing one boilerplate line (>= DfBar=3)
    // between distinct 10-token content lines; a line shared by only 2
    // docs survives
    def words(tag: String) = (1 to 10).map(i => s"$tag$i").mkString(" ")
    val bp = words("junk")
    val rare = words("rare")
    val docs = Seq(
      (1L, s"${words("a")} $bp ${words("b")}"),
      (2L, s"$bp ${words("c")} $rare"),
      (3L, s"${words("d")} $bp"),
      (4L, s"$rare $bp ${words("e")}")).toDF("doc_id", "text")
    val lines = operators.LineDedup.linesOf(docs)
    // reuse the gate's census/strip logic through the private corpus by
    // replaying the same predicates locally
    val occ = lines.select(col("doc_id"), explode(col("lines")).as("line"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("line")))
    val df = occ.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
    assert(df(bp) == 4 && df(rare) == 2,
      "fixture must make the boilerplate flaggable and the rare line not")
    val keptByDoc = occ.filter { case (_, l) => df(l) < 3 }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(keptByDoc.values.forall(!_.contains(bp)))
    assert(keptByDoc(2L).contains(rare) && keptByDoc(4L).contains(rare))
  }

  test("line_strip gate: removed + kept = total lines, per document") {
    val lines = operators.LineDedup.corpus(spark, sf)
      .select(col("doc_id"), size(col("lines")).cast("long").as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    val rows = operators.LineDedup.lineStrip(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") == lines(d),
        s"doc $d line accounting broken: $r")
      assert(r.getAs[Long]("n_removed") >= 1L, "only affected docs appear")
    }
    // every % 35 doc carries BOTH planted lines
    rows.filter(r => r.getAs[Long]("doc_id") % 35 == 0).foreach { r =>
      assert(r.getAs[Long]("n_removed") >= 2L, s"both plants must go: $r")
    }
  }

  test("line_strip: flagged-set exclusion is a broadcast anti-join") {
    val p = operators.LineDedup.lineStrip(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "the corpus side must never shuffle for the exclusion")
    assert(!p.contains("CartesianProduct"))
  }
}
