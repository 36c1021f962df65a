package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table: embedding-cosine near-dup
  * pairs, brute-force cosine top-k, and a random-hyperplane-LSH bucketed
  * variant (the 100 TB path: each probe touches 1/2^b of the corpus).
  *
  * Cross-engine exactness: float sums are order-dependent, so every vector
  * is first quantized to integers (q = floor(x·10^7 + 0.5)); dot products
  * and norms are then exact integer sums (≤ 64·(5·10^6)² ≈ 1.6·10^15 < 2^53,
  * so even the double conversion is exact), and cosine = dot/(√na·√nb) is a
  * deterministic IEEE expression that matches DuckDB bit-for-bit.
  *
  * The pairwise inner loops run as typed broadcast kernels (see [[qvecs]])
  * with pure integer dot products; everything around them — probe
  * selection, ranking windows, thresholds, rounding — stays declarative
  * DataFrame so Catalyst owns the plan.
  */
object Similarity {

  /** Embedding width of the harness tables. */
  val Dim = 64

  private val QvecSql =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000 + 0.5) AS BIGINT))"

  /** Integer quantization, the kernel twin of [[QvecSql]]: float→double is
    * exact, ×10^7 and floor are deterministic IEEE, the result fits a Long.
    */
  private def quant(e: Seq[Float]): Array[Long] = {
    val q = new Array[Long](e.length)
    var i = 0
    while (i < e.length) {
      q(i) = math.floor(e(i).toDouble * 1e7 + 0.5).toLong; i += 1
    }
    q
  }

  private def norm(q: Array[Long]): Double = {
    var n2 = 0L; var i = 0
    while (i < q.length) { n2 += q(i) * q(i); i += 1 }
    math.sqrt(n2.toDouble)
  }

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    var d = 0L; var i = 0
    while (i < a.length) { d += a(i) * b(i); i += 1 }
    d
  }

  import org.apache.spark.sql.Dataset

  /** Quantized vectors as a typed Dataset for the pairwise kernels.
    *
    * The all-pairs / top-k inner loops run as broadcast kernels
    * (`flatMap` over a broadcast of the comparison side): expressing a
    * 64-term dot product per pair in Catalyst either leaves whole-stage
    * codegen (higher-order lambdas, interpreted ~10×) or generates
    * megabyte methods janino spends longer compiling than the data takes
    * to scan. A tight primitive loop over broadcast arrays is the same
    * pattern MLlib's brute-force KNN uses. The broadcast side is bounded
    * exactly like any broadcast join side; the 100 TB path caps it via the
    * LSH buckets (`annLsh`) before ever going brute force.
    */
  private def qvecs(s: SparkSession, dir: String): Dataset[(Long, Array[Long])] = {
    import s.implicits._
    Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, e) => (id, quant(e)) }
  }

  private def collectVecs(s: SparkSession, dir: String): Array[(Long, Array[Long], Double)] =
    qvecs(s, dir).collect().sortBy(_._1).map { case (id, q) => (id, q, norm(q)) }

  /** Shared oracle prelude: quantized vectors + integer norms. DuckDB's
    * list_sum returns HUGEINT; cast back to BIGINT (values fit in 2^53).
    */
  private val QuantSql = s"""
    e AS (SELECT vec_id, $QvecSql AS q FROM embeddings),
    qn AS (SELECT vec_id, q,
             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
           FROM e)"""

  // ------------------------------------------------------ cosine near-dups

  /** All-pairs cosine near-dup detection (threshold 0.45). Brute force is
    * the correctness baseline; at scale the LSH bucketing below prefilters
    * candidates. The join is a broadcast nested loop over the (small)
    * vector side — at 100 TB this operator runs after `annLshBuckets`
    * restricts pairs to shared buckets.
    */
  def dedupEmbedding(s: SparkSession, dir: String,
                     threshold: Double = 0.45): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(collectVecs(s, dir))
    qvecs(s, dir)
      .flatMap { case (ida, qa) =>
        val na = norm(qa)
        bc.value.iterator
          .filter(_._1 > ida)
          .map { case (idb, qb, nb) =>
            (ida, idb, dot(qa, qb).toDouble / (na * nb))
          }
          .filter(_._3 >= threshold)
      }
      .toDF("id_a", "id_b", "cos_raw")
      .select(col("id_a"), col("id_b"), round(col("cos_raw"), 6).as("cos"))
      .orderBy("id_a", "id_b")
  }

  private val PairCosSql =
    "CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))"

  val dedupEmbeddingSql: String = s"""
    WITH $QuantSql,
    pairs AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.n2 AS na, y.n2 AS nb,
        CAST(list_sum(list_transform(generate_series(1, len(x.q)),
          i -> x.q[i] * y.q[i])) AS BIGINT) AS dot
      FROM qn x JOIN qn y ON x.vec_id < y.vec_id)
    SELECT id_a, id_b, round($PairCosSql, 6) AS cos
    FROM pairs WHERE $PairCosSql >= 0.45
    ORDER BY id_a, id_b"""

  // ----------------------------------------------------------- top-k (ANN)

  /** Brute-force cosine top-k for a probe set (vec_id % 50 = 0): the exact
    * baseline every ANN variant is measured against. Probes are broadcast;
    * ranking is a per-probe window.
    */
  def annTopk(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val probes = s.sparkContext.broadcast(
      collectVecs(s, dir).filter(_._1 % 50 == 0))
    val scored = qvecs(s, dir)
      .flatMap { case (idy, qy) =>
        val ny = norm(qy)
        probes.value.iterator
          .filter(_._1 != idy)
          .map { case (idx, qx, nx) =>
            (idx, idy, dot(qx, qy).toDouble / (nx * ny))
          }
      }
      .toDF("probe_id", "vec_id", "cos_raw")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_raw").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id"),
        round(col("cos_raw"), 6).as("cos"))
      .orderBy("probe_id", "rank")
  }

  def annTopkSql(k: Int = 5): String = s"""
    WITH $QuantSql,
    pairs AS (
      SELECT x.vec_id AS probe_id, y.vec_id AS vec_id,
             x.n2 AS na, y.n2 AS nb,
        CAST(list_sum(list_transform(generate_series(1, len(x.q)),
          i -> x.q[i] * y.q[i])) AS BIGINT) AS dot
      FROM qn x JOIN qn y ON x.vec_id % 50 = 0 AND x.vec_id <> y.vec_id),
    scored AS (
      SELECT probe_id, vec_id, $PairCosSql AS cos_raw,
        row_number() OVER (PARTITION BY probe_id
          ORDER BY $PairCosSql DESC, vec_id) AS rank
      FROM pairs)
    SELECT probe_id, CAST(rank AS INT) AS rank, vec_id,
           round(cos_raw, 6) AS cos
    FROM scored WHERE rank <= $k ORDER BY probe_id, rank"""

  // ------------------------------------------------- random-hyperplane LSH

  private val NumPlanes = 8

  private def md5hex(v: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** ±1 hyperplane weights, derived from md5 exactly as the oracle SQL
    * derives them (`md5(h || ':' || i)` first-nibble parity) — computed once
    * on the driver so the projection is a pure literal expression, no join.
    */
  private lazy val planeWeights: Seq[Seq[Int]] =
    (0 until NumPlanes).map { h =>
      (1 to Dim).map { i =>
        if (Integer.parseInt(md5hex(s"$h:$i").substring(0, 1), 16) % 2 == 0) 1
        else -1
      }
    }

  /** Per-vector LSH bucket: sign bits of the 8 md5-derived ±1 hyperplane
    * projections (pure integer math, identical to the oracle's SQL form).
    */
  def bucketOf(q: Array[Long]): Long = {
    var b = 0L; var h = 0
    while (h < NumPlanes) {
      val w = planeWeights(h)
      var p = 0L; var i = 0
      while (i < q.length) { p += q(i) * w(i); i += 1 }
      if (p >= 0) b |= (1L << h)
      h += 1
    }
    b
  }

  def lshBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    qvecs(s, dir).map { case (id, q) => (id, bucketOf(q)) }
      .toDF("vec_id", "bucket")
  }

  val LshBucketsSql: String = s"""
    planes AS (
      SELECT h, i,
        CASE WHEN (instr('0123456789abcdef',
            substring(md5(h || ':' || i), 1, 1)) - 1) % 2 = 0
          THEN 1 ELSE -1 END AS w
      FROM (SELECT unnest(generate_series(0, ${NumPlanes - 1})) AS h),
           (SELECT unnest(generate_series(1, 64)) AS i)),
    comps AS (
      SELECT vec_id, unnest(q) AS qv,
             unnest(generate_series(1, len(q))) AS i
      FROM qn),
    proj AS (
      SELECT vec_id, h, sum(w * qv) AS proj
      FROM comps JOIN planes USING (i) GROUP BY 1, 2),
    buckets AS (
      SELECT vec_id,
        sum(CASE WHEN proj >= 0 THEN 1 ELSE 0 END * (1 << h)) AS bucket
      FROM proj GROUP BY vec_id)"""

  /** Bucketed ANN: probes only score candidates in their own bucket —
    * the scale path (each probe touches ~1/2^8 of the corpus; more planes
    * shrink the slice further). Rank within bucket, top-k per probe.
    */
  def annLsh(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val probes = s.sparkContext.broadcast(
      collectVecs(s, dir).filter(_._1 % 50 == 0)
        .map { case (id, q, n) => (id, q, n, bucketOf(q)) })
    val scored = qvecs(s, dir)
      .flatMap { case (idy, qy) =>
        val ny = norm(qy)
        val by = bucketOf(qy)
        probes.value.iterator
          .filter { case (idx, _, _, bx) => idx != idy && bx == by }
          .map { case (idx, qx, nx, _) =>
            (idx, idy, dot(qx, qy).toDouble / (nx * ny))
          }
      }
      .toDF("probe_id", "vec_id", "cos_raw")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_raw").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id"),
        round(col("cos_raw"), 6).as("cos"))
      .orderBy("probe_id", "rank")
  }

  def annLshSql(k: Int = 5): String = s"""
    WITH $QuantSql,
    $LshBucketsSql,
    qb AS (SELECT qn.vec_id, q, n2, bucket
           FROM qn JOIN buckets USING (vec_id)),
    pairs AS (
      SELECT x.vec_id AS probe_id, y.vec_id AS vec_id,
             x.n2 AS na, y.n2 AS nb,
        CAST(list_sum(list_transform(generate_series(1, len(x.q)),
          i -> x.q[i] * y.q[i])) AS BIGINT) AS dot
      FROM qb x JOIN qb y ON x.bucket = y.bucket
        AND x.vec_id % 50 = 0 AND x.vec_id <> y.vec_id),
    scored AS (
      SELECT probe_id, vec_id, $PairCosSql AS cos_raw,
        row_number() OVER (PARTITION BY probe_id
          ORDER BY $PairCosSql DESC, vec_id) AS rank
      FROM pairs)
    SELECT probe_id, CAST(rank AS INT) AS rank, vec_id,
           round(cos_raw, 6) AS cos
    FROM scored WHERE rank <= $k ORDER BY probe_id, rank"""

  // ------------------------------------------------------------- IVF (ANN)

  private val CentroidMod = 97
  private val NProbe = 2

  /** Squared L2 between quantized vectors — exact integer math (diffs ≤
    * 2·10^7, squares ≤ 4·10^14, 64 terms < 2^63).
    */
  private def dist2(a: Array[Long], b: Array[Long]): Long = {
    var d = 0L; var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  /** Nearest-centroid cell id (tie-break: smaller centroid id). */
  private def cellOf(q: Array[Long],
                     cents: Array[(Long, Array[Long], Double)]): Long = {
    var best = Long.MaxValue; var cell = Long.MaxValue
    cents.foreach { case (cid, cq, _) =>
      val d = dist2(q, cq)
      if (d < best || (d == best && cid < cell)) { best = d; cell = cid }
    }
    cell
  }

  /** IVF-flat ANN: a deterministic coarse quantizer (every 97th vector is a
    * centroid — sampling in place of k-means training keeps the oracle
    * SQL-expressible), inverted lists per cell, probes scan their `NProbe`
    * nearest cells only. The third scale regime: LSH cuts by signature,
    * IVF cuts by geometry; at 100 TB the inverted lists are the partition
    * keys and each probe touches nprobe/ncells of the corpus.
    */
  def annIvf(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val cents = s.sparkContext.broadcast(
      collectVecs(s, dir).filter(_._1 % CentroidMod == 0))
    val probes = s.sparkContext.broadcast(
      collectVecs(s, dir).filter(_._1 % 50 == 0).map { case (id, q, n) =>
        val cells = cents.value
          .map { case (cid, cq, _) => (dist2(q, cq), cid) }
          .sorted.take(NProbe).map(_._2).toSet
        (id, q, n, cells)
      })
    val scored = qvecs(s, dir)
      .flatMap { case (idy, qy) =>
        val ny = norm(qy)
        val cy = cellOf(qy, cents.value)
        probes.value.iterator
          .filter { case (idx, _, _, cells) => idx != idy && cells(cy) }
          .map { case (idx, qx, nx, _) =>
            (idx, idy, dot(qx, qy).toDouble / (nx * ny))
          }
      }
      .toDF("probe_id", "vec_id", "cos_raw")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_raw").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id"),
        round(col("cos_raw"), 6).as("cos"))
      .orderBy("probe_id", "rank")
  }

  def annIvfSql(k: Int = 5): String = s"""
    WITH $QuantSql,
    cents AS (SELECT vec_id AS cid, q AS cq FROM qn
              WHERE vec_id % $CentroidMod = 0),
    asg AS (
      SELECT vec_id, cid,
        row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM (
        SELECT qn.vec_id, cents.cid,
          CAST(list_sum(list_transform(generate_series(1, len(q)),
            i -> (q[i] - cq[i]) * (q[i] - cq[i]))) AS BIGINT) AS d2
        FROM qn, cents)),
    cells AS (SELECT vec_id, cid AS cell FROM asg WHERE rn = 1),
    probe_cells AS (
      SELECT vec_id, cid AS cell FROM asg
      WHERE vec_id % 50 = 0 AND rn <= $NProbe),
    pairs AS (
      SELECT x.vec_id AS probe_id, y.vec_id AS vec_id,
             x.n2 AS na, y.n2 AS nb,
        CAST(list_sum(list_transform(generate_series(1, len(x.q)),
          i -> x.q[i] * y.q[i])) AS BIGINT) AS dot
      FROM qn x
      JOIN probe_cells pc ON pc.vec_id = x.vec_id
      JOIN cells cy ON cy.cell = pc.cell
      JOIN qn y ON y.vec_id = cy.vec_id AND y.vec_id <> x.vec_id),
    scored AS (
      SELECT probe_id, vec_id, $PairCosSql AS cos_raw,
        row_number() OVER (PARTITION BY probe_id
          ORDER BY $PairCosSql DESC, vec_id) AS rank
      FROM pairs)
    SELECT probe_id, CAST(rank AS INT) AS rank, vec_id,
           round(cos_raw, 6) AS cos
    FROM scored WHERE rank <= $k ORDER BY probe_id, rank"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_embedding" -> (dedupEmbedding(_, _)),
    "ann_topk" -> (annTopk(_, _)),
    "ann_lsh" -> (annLsh(_, _)),
    "ann_ivf" -> (annIvf(_, _)))

  val oracles: Map[String, String] = Map(
    "dedup_embedding" -> dedupEmbeddingSql,
    "ann_topk" -> annTopkSql(),
    "ann_lsh" -> annLshSql(),
    "ann_ivf" -> annIvfSql())
}
