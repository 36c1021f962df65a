package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: a lexical ranking and a vector ranking fused by
  * Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009 —
  * `score = Σ_lists 1/(k + rank)`, k = 60), the standard first-stage
  * retriever of RAG / retrieval-augmented curation pipelines: lexical
  * recall catches exact-term matches embeddings smear, vector recall
  * catches paraphrases lexical match misses, and RRF needs no score
  * calibration between the two (ranks only).
  *
  * Query-by-example over the shared doc/vec id domain: each probe
  * document retrieves by (a) exact cosine top-k over the embedding
  * corpus ([[Similarity.annTopk]] — the brute-force baseline; the LSH /
  * IVF / PQ / HNSW paths swap in transparently at scale since all emit
  * the same (probe, rank) shape) and (b) shared distinct 3-gram shingle
  * count with every other document ([[Dedup.shinglesOf]] — the
  * containment shape: probe shingles broadcast as a filtered plan, the
  * corpus side shuffles on the shingle key, counts rank by
  * (shared desc, id)). The fusion is a full-outer join of the two ≤ k
  * lists on (probe, candidate) — both sides bounded at k·probes rows —
  * and the fused top-k ranks by the exact double `1/(60+r_v) +
  * 1/(60+r_l)` (two correctly-rounded divisions summed in fixed order,
  * bit-identical in DuckDB). A rank of 0 in the output marks "not in
  * that list".
  */
object Retrieval {

  private val K = 10
  private val RrfK = 60

  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    val vec = Similarity.annTopk(s, dir, K)
      .select(col("probe_id"), col("vec_id").as("cand"),
        col("rank").as("vrank"))
    val sh = Dedup.shinglesOf(s, dir)
    val psh = sh.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("probe_id"), col("sh"))
    val shared = sh.join(broadcast(psh), "sh")
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("doc_id").as("cand"))
      .agg(count(lit(1)).as("n_shared"))
    val lw = Window.partitionBy(col("probe_id"))
      .orderBy(col("n_shared").desc, col("cand"))
    val lex = shared.withColumn("lrank", row_number().over(lw))
      .filter(col("lrank") <= K)
      .select(col("probe_id"), col("cand"), col("lrank"))
    val fused = vec.join(lex, Seq("probe_id", "cand"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(RrfK) + col("vrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("lrank")), lit(0.0)))
    val fw = Window.partitionBy(col("probe_id"))
      .orderBy(col("rrf").desc, col("cand"))
    fused.withColumn("rank", row_number().over(fw))
      .filter(col("rank") <= K)
      .select(col("probe_id"), col("rank"), col("cand"),
        coalesce(col("vrank"), lit(0)).as("vrank"),
        coalesce(col("lrank"), lit(0)).as("lrank"),
        round(col("rrf"), 6).as("rrf"))
      .orderBy("probe_id", "rank")
  }

  val hybridRrfSql: String = s"""
    WITH vec AS (
      SELECT probe_id, vec_id AS cand, rank AS vrank
      FROM (${Similarity.annTopkSql(K)})),
    ${Dedup.shinglesSql.trim},
    psh AS (SELECT doc_id AS probe_id, sh FROM sh WHERE doc_id % 50 = 0),
    shared AS (
      SELECT p.probe_id, s.doc_id AS cand, count(*) AS n_shared
      FROM sh s JOIN psh p USING (sh)
      WHERE s.doc_id <> p.probe_id
      GROUP BY 1, 2),
    lex AS (
      SELECT probe_id, cand, lrank FROM (
        SELECT probe_id, cand,
          row_number() OVER (PARTITION BY probe_id
            ORDER BY n_shared DESC, cand) AS lrank
        FROM shared)
      WHERE lrank <= $K),
    fused AS (
      SELECT coalesce(v.probe_id, l.probe_id) AS probe_id,
        coalesce(v.cand, l.cand) AS cand, v.vrank, l.lrank,
        coalesce(CAST(1.0 AS DOUBLE) / ($RrfK + v.vrank), 0.0)
          + coalesce(CAST(1.0 AS DOUBLE) / ($RrfK + l.lrank), 0.0) AS rrf
      FROM vec v FULL OUTER JOIN lex l
        ON v.probe_id = l.probe_id AND v.cand = l.cand),
    ranked AS (
      SELECT probe_id, cand, vrank, lrank, rrf,
        row_number() OVER (PARTITION BY probe_id
          ORDER BY rrf DESC, cand) AS rank
      FROM fused)
    SELECT probe_id, CAST(rank AS INT) AS rank, cand,
      coalesce(vrank, 0) AS vrank, coalesce(lrank, 0) AS lrank,
      round(rrf, 6) AS rrf
    FROM ranked WHERE rank <= $K ORDER BY probe_id, rank"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hybrid_rrf" -> (hybridRrf _))

  val oracles: Map[String, String] = Map(
    "hybrid_rrf" -> hybridRrfSql)
}
