package graft

import graft.operators.{GraphOps, Similarity}

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
}
