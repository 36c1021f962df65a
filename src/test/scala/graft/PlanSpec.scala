package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape assertions: the properties that keep these operators viable at
  * 100 TB, checked on the actual executed plans.
  */
class PlanSpec extends SparkSpec {

  // by-name + leaf-handover disabled: the spec asserts on BUILDER plans,
  // which Memo.cachedLeaf otherwise truncates to a LogicalRDD scan
  private def plan(df: => DataFrame): String =
    Memo.withoutLeafHandover(df.queryExecution.executedPlan.toString)

  private def count(p: String, op: String): Int = op.r.findAllIn(p).length

  test("no query's plan contains a cartesian product") {
    // the pairwise ops must generate candidates by equi-join or broadcast
    // kernel, never by a quadratic cross join
    for ((name, fn) <- SparkEntry.queries) {
      val p = plan(fn(spark, sf))
      assert(!p.contains("CartesianProduct"), s"$name plans a cross join")
    }
  }

  test("table_diff is a single co-partitioned shuffle join") {
    val p = plan(operators.MergeScenarios.tableDiff(spark, sf))
    assert(count(p, "SortMergeJoin") == 1)
    assert(count(p, "FileScan") == 2, "exactly one scan per side")
  }

  test("analytics joins broadcast their dimension sides") {
    val p3 = plan(operators.Queries.q3Join(spark, sf))
    val p5 = plan(operators.Queries.q5MultiJoin(spark, sf))
    assert(count(p3, "BroadcastHashJoin") >= 1)
    assert(count(p5, "BroadcastHashJoin") >= 3, "q5 dims all broadcast")
  }

  test("scans are column-pruned: q1 reads only the columns it needs") {
    val p = plan(operators.Queries.q1Agg(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(!p.contains("l_partkey"), "unused columns must not reach the scan")
  }

  test("aggregations are map-side combined (partial HashAggregate)") {
    for (df <- Seq(operators.Queries.q1Agg(spark, sf),
      operators.TextOps.corpusStats(spark, sf))) {
      val p = plan(df)
      assert(count(p, "HashAggregate") >= 2,
        "partial + final aggregate expected")
    }
  }

  test("changeset apply never collects data to the driver") {
    // the merged-table plan ends in distributed operators only
    val p = plan(operators.MergeScenarios.applyChangeset(spark, sf))
    assert(!p.contains("CollectLimit"))
  }

  test("vector similarity runs distributed: q_dot in-plan, no driver collect") {
    // the 100-TB property the round-1 verdict flagged: bucket/cell
    // assignment and scoring must live in the plan (q_dot expression),
    // candidates must come from a broadcast/equi join, and top-k must be a
    // WindowGroupLimit (map-side per-probe limit before the shuffle)
    val lsh = plan(operators.Similarity.annLsh(spark, sf))
    assert(lsh.contains("q_dot"), "scoring must use the native expression")
    assert(count(lsh, "BroadcastHashJoin") >= 1, "bucket equi-join expected")
    assert(lsh.contains("WindowGroupLimit"), "map-side top-k expected")
    val ivf = plan(operators.Similarity.annIvf(spark, sf))
    assert(ivf.contains("q_dot"))
    assert(ivf.contains("WindowGroupLimit"))
    val dedup = plan(operators.Similarity.dedupEmbedding(spark, sf))
    assert(dedup.contains("q_dot"))
    assert(!dedup.contains("CartesianProduct"))
  }

  test("similarity and dedup sources contain no driver-side collect") {
    // regression guard for the round-1 anti-pattern: collecting the
    // embeddings table / vocabulary to the driver before querying. A
    // collect is allowed ONLY on a line carrying the explicit
    // `audited-bounded-collect` marker (currently one: the k-means||
    // candidate-set finish, bounded at O(K log n) seed rows — the same
    // local finish MLlib's k-means|| uses); anything unmarked fails.
    var audited = 0
    for (f <- Seq("src/main/scala/graft/operators/Similarity.scala",
      "src/main/scala/graft/operators/Dedup.scala",
      "src/main/scala/graft/operators/Clustering.scala",
      "src/main/scala/graft/operators/CorpusFilters.scala",
      "src/main/scala/graft/operators/ZOrder.scala",
      "src/main/scala/graft/operators/Hnsw.scala",
      "src/main/scala/graft/operators/PqTrain.scala")) {
      val src = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f)))
      src.linesIterator.zipWithIndex.foreach { case (line, i) =>
        if (line.contains(".collect()")) {
          assert(line.contains("audited-bounded-collect"),
            s"$f:${i + 1} collects to the driver without an audit marker")
          audited += 1
        }
      }
    }
    assert(audited == 1, s"audited collects changed ($audited) — re-review")
  }

  test("hnsw search navigates by equi-join: frontier joins, no collects") {
    val p = plan(operators.Hnsw.hnswSearch(spark, sf))
    assert(p.contains("q_dot"), "scoring via the native expression")
    assert(!p.contains("CollectLimit") && !p.contains("CartesianProduct"))
    // per-layer steps are joins of the probe frontier with the edge lists
    assert(count(p, "BroadcastHashJoin") + count(p, "SortMergeJoin") >= 3,
      "one frontier join per layer expected")
  }

  test("pagerank iterations are joins + partial aggregates, never collects") {
    val p = plan(operators.GraphOps.graphPagerank(spark, sf))
    assert(!p.contains("CollectLimit") && !p.contains("CartesianProduct"))
    assert(count(p, "HashAggregate") >= 2,
      "per-target contribution sums must map-side combine")
  }

  test("PQ ANN runs on broadcast codebooks/tables with q_dot in-plan") {
    val p = plan(operators.Similarity.annPq(spark, sf))
    assert(p.contains("q_dot"), "subspace distances via the native expression")
    assert(count(p, "BroadcastHashJoin") >= 2,
      "codebook + probe-table joins must broadcast")
    assert(p.contains("WindowGroupLimit"), "map-side top-k expected")
  }

  test("trained-PQ ANN keeps the annPq plan shape over the trained book") {
    val p = plan(operators.PqTrain.annPqKmpll(spark, sf))
    assert(p.contains("q_dot"), "subspace distances via the native expression")
    assert(count(p, "BroadcastHashJoin") >= 2,
      "trained codebook + probe-table joins must broadcast")
    assert(p.contains("WindowGroupLimit"), "map-side top-k expected")
    assert(!p.contains("CartesianProduct"))
  }

  test("round-6 operators keep the scale disciplines") {
    // bloom_prune: the bit set is a broadcast dim; the big side never
    // shuffles for the filter
    val bp = plan(operators.JoinShapes.bloomPrune(spark, sf))
    assert(count(bp, "BroadcastHashJoin") >= 1, "bit set must broadcast")
    assert(!bp.contains("CartesianProduct"))
    // graph_triangles: wedge-close is equi-joins + partial aggregates
    val tr = plan(operators.GraphOps.graphTriangles(spark, sf))
    assert(!tr.contains("CartesianProduct"))
    assert(count(tr, "HashAggregate") >= 2, "triangle census map-side combines")
    // corpus_priority_sample: the top-(n+1) cut is a TakeOrdered, never a
    // corpus-wide unpartitioned rank window
    val ps = plan(operators.TrainPrep.corpusPrioritySample(spark, sf))
    assert(ps.contains("TakeOrderedAndProject"),
      "priority cut must be per-partition heaps")
    // hll registers: one map-side-combining max per bucket
    val hr = plan(operators.Sketch.hllRegisters(spark, sf))
    assert(count(hr, "HashAggregate") >= 2, "register max map-side combines")
    // layout audit: pure column state machines + two tiny aggregations
    val ll = plan(operators.ZOrder.layoutLocality(spark, sf))
    assert(!ll.contains("CartesianProduct") && !ll.contains("CollectLimit"))
  }

  test("round-7: no rank window partitioned on a bare low-cardinality stratum") {
    // the r6 scale finding: ntile/percent_rank/row_number windows whose
    // partition key has ~5 values (market segment, lang, source) funnel the
    // whole table through ~5 reducers at 100×. The five rewritten queries
    // must plan NO ntile/percent_rank at all, and every remaining
    // rank/running-sum window must be partitioned on (stratum, __rp) — the
    // range-slice id — never the stratum alone.
    val rewritten: Seq[(String, DataFrame)] = Seq(
      "customer_rfm" -> operators.Reshape.customerRfm(spark, sf),
      "customer_deciles" -> operators.Queries.customerDeciles(spark, sf),
      "customer_pct_rank" -> operators.Reshape.customerPctRank(spark, sf),
      "pack_sequences" -> operators.TextOps.packSequences(spark, sf),
      "corpus_mix" -> operators.TextOps.corpusMix(spark, sf),
      "corpus_mix_temp" -> operators.TextOps.corpusMixTemp(spark, sf))
    for ((name, df) <- rewritten) {
      val p = plan(df)
      assert(!p.contains("ntile("), s"$name still plans an ntile window")
      assert(!p.contains("percent_rank("),
        s"$name still plans a percent_rank window")
      val specs =
        "windowspecdefinition\\(([^)]*)".r.findAllMatchIn(p).toSeq
      assert(specs.nonEmpty == p.contains("Window"),
        s"$name plan/window-spec mismatch")
      specs.foreach { m =>
        val s = m.group(1)
        // acceptable windows: rank/running-sum over (stratum, __rp) — the
        // range-slice id — or the two BOUNDED boundary-pick passes: the
        // per-(stratum, shard) summary construction (32-way md5 shard over
        // the 1-in-64 sample) and the cumulative-weight walk over the
        // ≤ Shards·(S+1)-row summary (orders by its v, k columns)
        assert(s.contains("__rp") || s.contains("shard#") ||
          (s.contains(" v#") || s.startsWith("v#")) && s.contains(" k#"),
          s"$name has a window partitioned on a bare stratum: $s")
      }
    }
  }

  test("DistRank never collect_lists an unbounded sample") {
    // the r8 finding: the old boundary pick collect_list'ed EVERY
    // 1-in-64-sampled sort key of a stratum into one aggregation buffer —
    // ~10^10 keys at 100 TB. The summarized pick folds ONLY the ≤P−1
    // boundary rows (`__b`), in an eagerly-materialized side job — so the
    // consumer plans must contain NO collect_list at all (one appearing
    // means the unbounded pick came back lazy), and the DistRank source's
    // only collect_list must consume the bounded boundary column.
    val consumers: Seq[(String, DataFrame)] = Seq(
      "customer_rfm" -> operators.Reshape.customerRfm(spark, sf),
      "customer_deciles" -> operators.Queries.customerDeciles(spark, sf),
      "customer_pct_rank" -> operators.Reshape.customerPctRank(spark, sf),
      "pack_sequences" -> operators.TextOps.packSequences(spark, sf),
      "corpus_mix" -> operators.TextOps.corpusMix(spark, sf),
      "corpus_mix_temp" -> operators.TextOps.corpusMixTemp(spark, sf))
    for ((name, df) <- consumers) {
      val p = plan(df)
      assert(!p.contains("collect_list"),
        s"$name plans a lazy collect_list — the bounded eager pick is gone")
    }
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/operators/DistRank.scala")))
    val folds = "collect_list\\(col\\(\"(\\w+)\"\\)".r
      .findAllMatchIn(src).map(_.group(1)).toSeq
    assert(folds == Seq("__b"),
      s"DistRank collect_list sites changed ($folds) — re-review bounds")
  }

  test("decontaminate broadcasts the eval side") {
    val p = plan(operators.CorpusFilters.decontaminate(spark, sf))
    assert(count(p, "BroadcastHashJoin") >= 1,
      "the eval shingle set is tiny by construction — it must broadcast")
  }

  test("kmeans assignment joins broadcast the centroid side") {
    val p = plan(operators.Clustering.kmeansEmbed(spark, sf))
    assert(p.contains("q_dot"))
    assert(count(p, "BroadcastNestedLoopJoin") >= 1,
      "vector × centroid pairing is an explicit broadcast NLJ")
    assert(!p.contains("CartesianProduct"))
  }

  test("IVF-PQ query path scores codes, never raw vectors") {
    val p = plan(operators.Similarity.annIvfPq(spark, sf))
    // index build uses q_dot; the candidate-scoring tail is a sum of
    // broadcast table lookups grouped by (probe, vector)
    assert(p.contains("q_dot"))
    assert(count(p, "BroadcastHashJoin") >= 2,
      "probe cells + distance tables must broadcast")
    assert(p.contains("WindowGroupLimit"), "map-side top-k expected")
  }

  test("knn_graph generates candidates by bucket equi-join, top-k map-side") {
    val p = plan(operators.Similarity.knnGraph(spark, sf))
    assert(p.contains("q_dot"))
    assert(!p.contains("CartesianProduct"),
      "the corpus-vs-corpus pairing must stay an equi-join on the bucket key")
    assert(p.contains("WindowGroupLimit"),
      "per-source top-k must reduce before the rank exchange")
  }

  test("dedup_semantic blocks by cluster key — no all-pairs comparison") {
    val p = plan(operators.Clustering.dedupSemantic(spark, sf))
    assert(p.contains("q_dot"))
    assert(!p.contains("CartesianProduct"),
      "pair generation must be an equi-join on the k-means cell")
  }
}
