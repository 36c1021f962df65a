package graft

class Round9OpsSpec extends SparkSpec {

  test("layout_pruning: hilbert reads fewer files than zorder on both dims") {
    val rows = graft.operators.ZOrder.layoutPruning(spark, sf).collect()
    assert(rows.length == 4, "two layouts x two dimensions")
    val avg = rows.map(r => (r.getAs[String]("layout"), r.getAs[String]("dim"))
      -> r.getAs[Double]("avg_files_read")).toMap
    // the measured claim behind the Hilbert writer, now at the pruning
    // level: connected buckets intersect fewer band predicates than
    // Z-order's seam-crossing buckets, on BOTH dimensions
    assert(avg(("hilbert", "ck")) <= avg(("zorder", "ck")),
      s"hilbert must prune at least as well on ck: $avg")
    assert(avg(("hilbert", "dy")) <= avg(("zorder", "dy")),
      s"hilbert must prune at least as well on dy: $avg")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 16L)
      // sf0.001 is sparse enough that a band can miss every file, so only
      // the busiest band is guaranteed non-empty
      assert(r.getAs[Long]("max_files_read") >= 1L)
      assert(r.getAs[Long]("max_files_read") >=
        r.getAs[Long]("min_files_read"))
    }
  }
}
