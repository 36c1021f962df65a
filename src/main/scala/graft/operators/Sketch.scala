package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch.
  *
  * The classic mergeable cardinality estimator (Bar-Yossef et al.): hash
  * every value to [0, 1), keep the k smallest hashes; with h_k the k-th
  * smallest, distinct ≈ (k−1)/h_k. Unlike HLL implementations the whole
  * sketch is deterministic md5 arithmetic, so the DuckDB oracle reproduces
  * it bit-for-bit — and at scale it is exactly a top-k: map-side partial
  * k-smallest per partition, k values to the driver, O(k) memory however
  * many billions of rows stream past. Sketches merge by unioning the
  * k-minima and re-taking the k smallest (how a 1000-executor rollup or a
  * cross-day union would combine them).
  */
object Sketch {

  /** [0,1) hash: the first 32 md5 bits over 2^32 — identical in DuckDB. */
  private def h01(c: String): String =
    s"cast(conv(substring(md5($c), 1, 8), 16, 10) as double) / 4294967296.0"

  /** KMV estimate of `countDistinct(colName)` over `df`: returns one row
    * (k, est_distinct). Exact when fewer than k distinct values exist.
    */
  def kmvDistinct(df: DataFrame, colName: String, k: Int): DataFrame =
    df.select(col(colName)).distinct()
      .select(expr(h01(colName)).as("h"))
      .orderBy("h").limit(k)
      .agg(max(col("h")).as("hk"), count(lit(1)).as("n"))
      .select(lit(k).as("k"),
        round(when(col("n") < k, col("n").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("hk")), 2).as("est_distinct"))

  /** Gate scenario: estimate the corpus's distinct 3-gram-shingle
    * cardinality (k = 256) next to the exact count the estimate
    * approximates — both in ONE job (the exact side joins in as a 1-row
    * aggregate, no separate driver count).
    */
  def corpusDistinctKmv(s: SparkSession, dir: String, k: Int = 256): DataFrame = {
    val grams = Dedup.shinglesOf(s, dir).select("sh")
    val est = kmvDistinct(grams, "sh", k)
    est.crossJoin(
      grams.distinct().agg(count(lit(1)).as("exact_distinct")))
  }

  def corpusDistinctKmvSql(k: Int = 256): String = s"""
    WITH ${Dedup.shinglesSql.trim},
    d AS (SELECT DISTINCT sh FROM sh),
    hs AS (SELECT CAST(('0x' || substring(md5(sh), 1, 8))::BIGINT AS DOUBLE)
                    / 4294967296.0 AS h
           FROM d),
    topk AS (SELECT h FROM hs ORDER BY h LIMIT $k)
    SELECT $k AS k,
      round(CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
                 ELSE ${(k - 1).toDouble} / max(h) END, 2) AS est_distinct,
      (SELECT count(*) FROM d) AS exact_distinct
    FROM topk"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_distinct_kmv" -> (corpusDistinctKmv(_, _)))

  val oracles: Map[String, String] = Map(
    "corpus_distinct_kmv" -> corpusDistinctKmvSql())
}
