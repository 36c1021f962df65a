package graft

import graft.operators.{GraphOps, Similarity}
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  test("fixed-point pagerank matches a local integer reference exactly") {
    val edges = Similarity.knnGraph(spark, sf).collect()
      .map(r => r.getAs[Long]("src") -> r.getAs[Long]("nbr"))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val odeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val scale = 1000000000000L
    var pr = nodes.map(_ -> scale).toMap
    for (_ <- 1 to 3) {
      val m = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s, t) => m(t) += pr(s) / odeg(s) }
      pr = nodes.map(v => v -> (scale / 8 + 7 * m(v) / 8)).toMap
    }
    val got = GraphOps.graphPagerank(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("pr_fixed")).toMap
    assert(got.keySet == pr.keySet)
    pr.foreach { case (v, x) =>
      assert(got(v) == x, s"node $v: ${got(v)} != $x")
    }
    // ranks are sensible: every node holds at least the base mass, and
    // some node accumulated strictly more than it started with
    assert(pr.values.forall(_ >= scale / 8))
    assert(pr.values.exists(_ > scale), "centrality concentrates somewhere")
  }

  test("site_rank: extracted link graph replays the planting arithmetic " +
    "and inlink-heavy sites outrank the tail") {
    val ids = graft.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    // local edge construction straight from the planting arithmetic
    val edges = ids.flatMap { d =>
      val src = s"site${d % 20}"
      Seq(s"site${d % 10}", s"site${d % 15}", s"site${d % 20}")
        .filter(_ != src).map(src -> _)
    }.distinct
    // local integer PageRank replay
    val scale = 1000000000000L
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val odeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var pr = nodes.map(_ -> scale).toMap
    for (_ <- 1 to 3) {
      val m = scala.collection.mutable.Map.empty[String, Long]
      edges.foreach { case (a, b) =>
        m(b) = m.getOrElse(b, 0L) + Math.floorDiv(pr(a), odeg(a))
      }
      pr = nodes.map(v =>
        v -> (scale / 8 + Math.floorDiv(7 * m.getOrElse(v, 0L), 8))).toMap
    }
    val rows = operators.GraphOps.siteRank(spark, sf).collect()
    assert(rows.length == nodes.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("pr_fixed") == pr(r.getAs[String]("site")),
        s"rank mismatch at ${r.getAs[String]("site")}")
    }
    // the planted skew must surface: sites 0–9 receive link mass from
    // all three moduli, 15–19 only from the identity modulus — their
    // mean ranks must order accordingly
    def meanOf(p: String => Boolean): Double = {
      val v = rows.filter(r => p(r.getAs[String]("site")))
        .map(_.getAs[Long]("pr_fixed"))
      v.sum.toDouble / v.length
    }
    val low = meanOf(s => s.stripPrefix("site").toInt <= 9)
    val high = meanOf(s => s.stripPrefix("site").toInt >= 15)
    assert(low > high,
      s"inlink-heavy sites do not outrank the tail: $low vs $high")
  }
  test("domain_blocklist: planted blocked domains excluded, buckets account") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val blockedDocs = docs.filter(
      concat(lit("site"), col("doc_id") % 20)
        .isin(operators.GraphOps.Blocked: _*)).count()
    val rows = operators.GraphOps.domainBlocklist(spark, sf).collect()
    // four rank-quartile buckets of five sites each
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.forall(_.getAs[Long]("n_sites") == 5L))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // every deny-listed document is counted blocked, nowhere kept
    assert(rows.map(_.getAs[Long]("n_blocked")).sum == blockedDocs)
    assert(rows.map(_.getAs[Long]("n_blocked_sites")).sum ==
      operators.GraphOps.Blocked.length)
    rows.foreach { r =>
      val want = math.rint((r.getAs[Long]("n_docs") -
        r.getAs[Long]("n_blocked")).toDouble /
        r.getAs[Long]("n_docs") * 1e6) / 1e6
      assert(math.abs(r.getAs[Double]("keep_rate") - want) < 1e-9)
    }
  }

  test("domain_blocklist: deny list and buckets broadcast, corpus never shuffles for them") {
    val p = operators.GraphOps.domainBlocklist(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    // the doc-side joins (deny list, bucket map) must be broadcasts
    assert(p.split("BroadcastHashJoin").length >= 3,
      "deny-list and bucket joins must broadcast")
  }
}
