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
  * All vector math uses codegen'd higher-order functions (`transform`,
  * `zip_with`, `aggregate`) — no UDFs, no explode of the 64 dims in the hot
  * path.
  */
object Similarity {

  /** Integer-quantized embedding (10^-7 resolution, exact in double). */
  private val qvec: Column =
    transform(col("embedding"), x => floor(x.cast("double") * 1e7 + 0.5).cast("long"))
  private val QvecSql =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000 + 0.5) AS BIGINT))"

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
  private def norm2(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0L), (acc, x) => acc + x)

  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), qvec.as("q"))
      .withColumn("n2", norm2(col("q")))

  /** Shared oracle prelude: quantized vectors + integer norms. DuckDB's
    * list_sum returns HUGEINT; cast back to BIGINT (values fit in 2^53).
    */
  private val QuantSql = s"""
    e AS (SELECT vec_id, $QvecSql AS q FROM embeddings),
    qn AS (SELECT vec_id, q,
             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
           FROM e)"""

  private val cosRaw: Column =
    col("dot").cast("double") /
      (sqrt(col("x.n2").cast("double")) * sqrt(col("y.n2").cast("double")))
  private val CosSqlRaw =
    "CAST(dot AS DOUBLE) / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE)))"

  // ------------------------------------------------------ cosine near-dups

  /** All-pairs cosine near-dup detection (threshold 0.45). Brute force is
    * the correctness baseline; at scale the LSH bucketing below prefilters
    * candidates. The join is a broadcast nested loop over the (small)
    * vector side — at 100 TB this operator runs after `annLshBuckets`
    * restricts pairs to shared buckets.
    */
  def dedupEmbedding(s: SparkSession, dir: String,
                     threshold: Double = 0.45): DataFrame = {
    val q = quantized(s, dir)
    val pairs = q.alias("x")
      .join(q.alias("y"), col("x.vec_id") < col("y.vec_id"))
      .withColumn("dot", dot(col("x.q"), col("y.q")))
    pairs.filter(cosRaw >= threshold)
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        round(cosRaw, 6).as("cos"))
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
    val q = quantized(s, dir)
    val probes = q.filter(col("vec_id") % 50 === 0)
    val w = Window.partitionBy(col("x.vec_id"))
      .orderBy(col("cos_raw").desc, col("y.vec_id"))
    broadcast(probes).alias("x")
      .join(q.alias("y"), col("x.vec_id") =!= col("y.vec_id"))
      .withColumn("dot", dot(col("x.q"), col("y.q")))
      .withColumn("cos_raw", cosRaw)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("x.vec_id").as("probe_id"), col("rank"),
        col("y.vec_id").as("vec_id"), round(col("cos_raw"), 6).as("cos"))
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

  /** Per-vector LSH bucket: sign bits of 8 deterministic md5-derived ±1
    * hyperplanes. The 512-entry plane table is broadcast; projections are
    * one narrow aggregation per (vector, plane).
    */
  def lshBuckets(s: SparkSession, dir: String): DataFrame = {
    val planes = s.range(NumPlanes).toDF("h")
      .withColumn("i", explode(sequence(lit(1), lit(64))))
      .selectExpr("h", "i",
        """case when cast(conv(substring(md5(concat(h, ':', i)), 1, 1), 16, 10)
                     as int) % 2 = 0
           then 1 else -1 end as w""")
    val comps = quantized(s, dir)
      .select(col("vec_id"), col("n2"), posexplode(col("q")).as(Seq("p0", "qv")))
      .withColumn("i", col("p0") + 1)
    comps.join(broadcast(planes), "i")
      .groupBy("vec_id", "h")
      .agg(sum(col("w") * col("qv")).as("proj"))
      .groupBy("vec_id")
      .agg(expr("sum(case when proj >= 0 then 1 else 0 end * shiftleft(1, cast(h as int)))")
        .as("bucket"))
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
    val q = quantized(s, dir)
    val b = lshBuckets(s, dir)
    val qb = q.join(b, "vec_id")
    val probes = qb.filter(col("vec_id") % 50 === 0)
    val w = Window.partitionBy(col("x.vec_id"))
      .orderBy(col("cos_raw").desc, col("y.vec_id"))
    broadcast(probes).alias("x")
      .join(qb.alias("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .withColumn("dot", dot(col("x.q"), col("y.q")))
      .withColumn("cos_raw", cosRaw)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("x.vec_id").as("probe_id"), col("rank"),
        col("y.vec_id").as("vec_id"), round(col("cos_raw"), 6).as("cos"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_embedding" -> (dedupEmbedding(_, _)),
    "ann_topk" -> (annTopk(_, _)),
    "ann_lsh" -> (annLsh(_, _)))

  val oracles: Map[String, String] = Map(
    "dedup_embedding" -> dedupEmbeddingSql,
    "ann_topk" -> annTopkSql(),
    "ann_lsh" -> annLshSql())
}
