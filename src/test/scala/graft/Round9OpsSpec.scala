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

  test("hnsw_insert: inserted vertices respect levels, M and both sides") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Hnsw.hnswInsert(spark, sf).collect()
    assert(rows.nonEmpty)
    val lvl = graft.operators.Hnsw.hnswLayers(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("level")).toMap
    rows.foreach { r =>
      val side = r.getAs[String]("side")
      val level = r.getAs[Long]("level")
      val src = r.getAs[Long]("src")
      val nbr = r.getAs[Long]("nbr")
      assert(r.getAs[Int]("rank") <= 3, "top-M cut respected")
      if (side == "new") {
        assert(src % 10 == 0 && nbr % 10 != 0,
          "new rows connect an inserted vertex to base neighbours")
        assert(lvl(src) >= level, "a vertex only joins layers <= its level")
      } else {
        assert(side == "rev" && src % 10 != 0 && nbr % 10 == 0,
          "rev rows are base vertices adopting an inserted neighbour")
      }
      assert(lvl(nbr) >= level && lvl(src) >= level)
    }
    // a reverse link only exists where the new vertex displaced into the
    // base vertex's top-M — so every rev (src, nbr) must also appear as a
    // candidate pair from the bucket join, i.e. nbr inserted near src
    val newPairs = rows.filter(_.getAs[String]("side") == "new")
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("src"))).toSet
    assert(rows.count(_.getAs[String]("side") == "rev") >= 0 &&
      newPairs.nonEmpty, "batch must produce insertions at layer 0")
  }

  test("ivf_split: the drifted cell splits into two complete sub-cells") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Similarity.ivfSplit(spark, sf).collect()
    assert(rows.length == 2, "one split cell, two sub-centroids")
    val cell = rows.head.getAs[Long]("cell")
    assert(rows.forall(_.getAs[Long]("cell") == cell), "one cell splits")
    // the split conserves the cell's population from the append census
    val census = graft.operators.Similarity.ivfAppend(spark, sf).collect()
      .find(_.getAs[Long]("cell") == cell).get
    assert(rows.map(_.getAs[Long]("n_base_members")).sum ==
      census.getAs[Long]("n_base"))
    assert(rows.map(_.getAs[Long]("n_app_members")).sum ==
      census.getAs[Long]("n_appended"))
    // the drifted cell is the one with the most appends
    val maxApp = graft.operators.Similarity.ivfAppend(spark, sf).collect()
      .map(_.getAs[Long]("n_appended")).max
    assert(census.getAs[Long]("n_appended") == maxApp)
    // sub A keeps the original centroid id; both subs are non-empty
    assert(rows.exists(_.getAs[Long]("sub_cid") == cell))
    rows.foreach(r => assert(r.getAs[Long]("n_base_members") +
      r.getAs[Long]("n_app_members") >= 1L))
  }

  test("hnsw_delete: repaired lists never reference a tombstone") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Hnsw.hnswDelete(spark, sf).collect()
    assert(rows.nonEmpty, "some vertex must point at a tombstone")
    rows.foreach { r =>
      assert(r.getAs[Long]("nbr") % 20 != 3, "tombstones must be gone")
      assert(r.getAs[Long]("src") % 20 != 3, "deleted srcs don't repair")
      assert(r.getAs[Int]("rank") <= 3)
    }
    // every repaired src really was affected: its stored layer-0 list
    // contained a tombstoned neighbour
    val g0 = graft.operators.Hnsw.hnswGraph(spark, sf).collect()
      .filter(_.getAs[Long]("level") == 0L)
    val affected0 = g0.filter(r => r.getAs[Long]("nbr") % 20 == 3 &&
      r.getAs[Long]("src") % 20 != 3).map(_.getAs[Long]("src")).toSet
    val repaired0 = rows.filter(_.getAs[Long]("level") == 0L)
      .map(_.getAs[Long]("src")).toSet
    // a src whose every bucket-mate is tombstoned repairs to an EMPTY
    // list and emits no rows, so repaired ⊆ affected (strict at sf0.001:
    // 2 of 63 affected srcs have no survivors)
    assert(affected0.nonEmpty && repaired0.nonEmpty &&
      repaired0.subsetOf(affected0),
      s"repaired ${repaired0.size} must be within affected ${affected0.size}")
  }

  test("ivf_split_multi: four complete sub-cells by iterated farthest-point") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Similarity.ivfSplitMulti(spark, sf).collect()
    val cell = rows.head.getAs[Long]("cell")
    assert(rows.forall(_.getAs[Long]("cell") == cell), "one cell splits")
    // every distinct seed is a member assigning to itself at distance 0,
    // so with >= 4 distinct members all four sub-cells are non-empty
    assert(rows.length == 4, s"expected 4 sub-cells, got ${rows.length}")
    rows.foreach(r => assert(r.getAs[Long]("n_base_members") +
      r.getAs[Long]("n_app_members") >= 1L))
    // conservation vs the append census of the same cell
    val census = graft.operators.Similarity.ivfAppend(spark, sf).collect()
      .find(_.getAs[Long]("cell") == cell).get
    assert(rows.map(_.getAs[Long]("n_base_members")).sum ==
      census.getAs[Long]("n_base"))
    assert(rows.map(_.getAs[Long]("n_app_members")).sum ==
      census.getAs[Long]("n_appended"))
    // the first two seeds follow the SAME deterministic rule as the
    // two-way split, so its sub-centroids must reappear here
    val two = graft.operators.Similarity.ivfSplit(spark, sf).collect()
      .map(_.getAs[Long]("sub_cid")).toSet
    val multi = rows.map(_.getAs[Long]("sub_cid")).toSet
    assert(two.subsetOf(multi),
      s"two-way seeds $two must be among the multi-way seeds $multi")
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

  test("table_profile: one row per column with consistent exact stats") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val rows = graft.operators.Quality.tableProfile(spark, sf).collect()
    assert(rows.length == 11)
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_nonnull") <= n)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_nonnull"))
      assert(r.getAs[String]("min_s") != null)
    }
    val byCol = rows.map(r => r.getAs[String]("cname") -> r).toMap
    // exact distincts agree with a direct computation
    assert(byCol("l_returnflag").getAs[Long]("n_distinct") ==
      li.select(countDistinct(col("l_returnflag"))).head.getLong(0))
    assert(byCol("l_orderkey").getAs[Long]("n_distinct") ==
      li.select(countDistinct(col("l_orderkey"))).head.getLong(0))
    // min/max computed on the TYPED column, not its string form
    val q = byCol("l_quantity")
    assert(q.getAs[String]("min_s").toDouble <=
      q.getAs[String]("max_s").toDouble)
    val qmin = li.agg(org.apache.spark.sql.functions.min(col("l_quantity")))
      .head.getDouble(0)
    assert(q.getAs[String]("min_s").toDouble == qmin)
  }
}
