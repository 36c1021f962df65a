package graft

class Round9OpsSpec extends SparkSpec {

  test("ivf_append: census conserves both populations, drift is bounded") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Similarity.ivfAppend(spark, sf).collect()
    assert(rows.nonEmpty)
    val emb = Tables.embeddings(spark, sf)
    val nBase = emb.filter(col("vec_id") % 10 =!= 0).count()
    val nApp = emb.filter(col("vec_id") % 10 === 0).count()
    // every base vector and every appended vector lands in exactly one cell
    assert(rows.map(_.getAs[Long]("n_base")).sum == nBase)
    assert(rows.map(_.getAs[Long]("n_appended")).sum == nApp)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_base") >= 1L,
        "each cell holds at least its own centroid")
      assert(r.getAs[Long]("n_moved_on_rebuild") <=
        r.getAs[Long]("n_appended"), "drift bounded by the batch")
    }
  }

  test("ivf_append: the incremental path never touches the base corpus") {
    // the append assignment subplan joins the BATCH against broadcast
    // centroids; scanning or shuffling the base corpus there would make
    // the 'incremental' step cost O(corpus) at every append
    val p = graft.operators.Similarity.ivfAppend(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), "centroids must broadcast")
  }

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
