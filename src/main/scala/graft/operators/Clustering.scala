package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed clustering operators: connected-components over the near-dup
  * pair graph (the last step of every dedup pipeline — pairs alone don't
  * tell you which rows to keep once duplicates chain a→b→c), and Lloyd's
  * k-means over the embedding corpus (the trained coarse quantizer the IVF
  * index samples in `Similarity.annIvf`).
  *
  * Scale design (100 TB):
  *
  * - `dedup_clusters` runs min-label propagation over the edge list: each
  *   round is one equi-join (edges ⋈ labels on the neighbour id) plus a
  *   map-side-combining min aggregation, the frames never exceed
  *   O(nodes + edges), and the loop converges in O(component diameter)
  *   rounds — near-dup components are shallow (a handful of hops) because
  *   edges come from shared LSH buckets. The driver sees only a per-round
  *   change count (a scalar aggregate), never data. For adversarial deep
  *   chains the same loop admits pointer-jumping (label ← label-of-label)
  *   for O(log n) rounds; not needed for dedup graphs.
  *
  * - `kmeans_embed` is the canonical distributed Lloyd step: centroids are
  *   a broadcast dim (K vectors), assignment is a broadcast join + one
  *   map-side-combining `min_by` per vector, and the centroid update is a
  *   (cell, dim)-keyed partial-sum aggregation — the shuffle carries
  *   K·dim rows, not the corpus. Every pass over the data is a single scan.
  *
  * Cross-engine exactness: vectors are quantized to integers at scale 10^4
  * (coarser than `Similarity`'s 10^7 so that per-cluster component sums,
  * their squares and q·s dot products all stay below 2^53 — exact in both
  * BIGINT and DOUBLE). Iteration-1 distances are pure integers; iteration-2
  * distances against mean centroids are computed as
  * `n2 − 2·dot/c + s2/c²` over exactly-representable integers with an
  * identical operation order in Spark and DuckDB, so the IEEE results (and
  * the argmin tie-break on cell id) match bit-for-bit.
  */
object Clustering {

  // ------------------------------------------------ connected components

  /** Duplicate clusters from verified MinHash-LSH pairs: every document in
    * some near-dup pair, labelled with the smallest doc_id reachable
    * through the pair graph, plus the cluster size. Downstream `keep`
    * policy is then `doc_id == cluster` (keep the canonical representative).
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashPairsOf(s, dir).select(col("id_a"), col("id_b"))
    val edges = graft.Memo.cached(s, "dup_edges", dir)(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lab", col("id"))
    // per-id labels only ever decrease, so the total label sum strictly
    // decreases until the fixpoint — a single scalar aggregate doubles as
    // the convergence test (no data ever reaches the driver)
    var labelSum = Long.MaxValue
    var prev: DataFrame = null
    var converged = false
    while (!converged) {
      // one round = 2 shuffles: neighbour labels unioned with own labels,
      // then a map-side-combining min per id. Near-dup components are
      // shallow (edges share LSH buckets), so plain min-propagation
      // converges in a handful of rounds; a pointer-jumping variant
      // (label ← label-of-label, O(log n) worst case) and a 2-hops-per-round
      // batching variant were both measured slower here — the extra
      // per-round work outweighs the rounds saved.
      val next = edges
        .join(labels.select(col("id").as("dst"), col("lab")), "dst")
        .select(col("src").as("id"), col("lab"))
        .unionByName(labels)
        .groupBy(col("id")).agg(min(col("lab")).as("lab"))
        .persist()
      // one persisted frame per round: the convergence scalar and the next
      // round share a single evaluation, and unpersisting the previous
      // round keeps lineage (and recompute) linear in the round count
      val s = next.agg(sum(col("lab"))).head().getLong(0)
      converged = s == labelSum
      labelSum = s
      if (prev != null) prev.unpersist()
      prev = next
      labels = next
    }
    val sizes = labels.groupBy(col("lab")).agg(count(lit(1)).as("csize"))
    labels.join(sizes, "lab")
      .select(col("id").as("doc_id"), col("lab").as("cluster"), col("csize"))
      .orderBy("doc_id")
  }

  /** Oracle: transitive closure by recursive CTE — min reachable id is the
    * component label (the graph is undirected: both edge directions are in
    * `edges`).
    */
  val dedupClustersSql: String = s"""
    WITH RECURSIVE ${Dedup.minhashPairsCtesSql},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM mh_pairs
      UNION SELECT id_b, id_a FROM mh_pairs),
    reach(id, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst),
    comp AS (SELECT id AS doc_id, min(lab) AS cluster FROM reach GROUP BY id),
    sizes AS (SELECT cluster, count(*) AS csize FROM comp GROUP BY cluster)
    SELECT doc_id, cluster, csize FROM comp JOIN sizes USING (cluster)
    ORDER BY doc_id"""

  // --------------------------------------------------------------- k-means

  /** Quantization scale: coarse enough that Σq², per-cluster Σq and q·Σq
    * stay exactly representable as doubles (< 2^53) at any realistic
    * cluster size; fine enough that assignment boundaries match a float
    * k-means to ~1e-4.
    */
  private val KScale = 10000

  private val KQvecExpr =
    s"transform(embedding, x -> cast(floor(cast(x as double) * $KScale + 0.5) as bigint))"
  private val KQvecSql =
    s"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $KScale + 0.5) AS BIGINT))"

  /** Every 97th vector seeds a centroid — deterministic init (k-means++ at
    * scale would sample by distance; determinism keeps the oracle
    * SQL-expressible and the result reproducible run-to-run).
    */
  private val SeedMod = 97

  /** One full Lloyd round (integer-exact assign → mean update) plus the
    * re-assignment against the updated means: `(vec_id, cluster)` for the
    * whole corpus. Memoized per (session, dir) — the assignment doubles as
    * the blocking key of [[dedupSemantic]], and in production it's a
    * persisted index artifact, not a per-query recompute.
    */
  private[operators] def cellsOf(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    graft.Memo.cached(s, "kmeans_cells", dir)(assignCells(s, dir))
  }

  private def assignCells(s: SparkSession, dir: String): DataFrame = {
    val qn = graft.Memo.cached(s, "kmeans_qvecs", dir) {
      Tables.embeddings(s, dir)
        .select(col("vec_id"), expr(KQvecExpr).as("q"))
        .withColumn("n2", expr("q_dot(q, q)"))
    }
    val c0 = qn.filter(col("vec_id") % SeedMod === 0)
      .select(col("vec_id").as("cid"), col("q").as("cq"), col("n2").as("cn2"))
    // round 1: exact integer squared-L2 against the seed vectors
    val a1 = qn.join(broadcast(c0))
      .withColumn("d2", col("n2") - lit(2L) * expr("q_dot(q, cq)") + col("cn2"))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cell"))
    // centroid update: (cell, dim)-keyed partial sums — the shuffle carries
    // K·dim rows; the array is re-assembled only for the K centroids
    val px = a1.join(qn, "vec_id")
      .select(col("cell"), posexplode(col("q")).as(Seq("i", "qv")))
    val sums = px.groupBy(col("cell"), col("i")).agg(sum(col("qv")).as("sv"))
    val cnts = a1.groupBy(col("cell")).agg(count(lit(1)).as("c"))
    val c1 = sums.groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("sv")))),
        x => x.getField("sv")).as("sq"))
      .join(cnts, "cell")
      .withColumn("s2", expr("q_dot(sq, sq)"))
    // round 2: distance to the mean s/c as n2 − 2·dot/c + s2/c² — all
    // inputs exact integers, identical operation order in the oracle
    val d2 = col("n2").cast("double") -
      lit(2.0) * expr("q_dot(q, sq)").cast("double") / col("c").cast("double") +
      col("s2").cast("double") / (col("c").cast("double") * col("c").cast("double"))
    qn.join(broadcast(c1))
      .withColumn("d2", d2)
      .groupBy(col("vec_id"))
      .agg(min_by(col("cell"), struct(col("d2"), col("cell"))).as("cluster"))
  }

  def kmeansEmbed(s: SparkSession, dir: String): DataFrame =
    cellsOf(s, dir).orderBy("vec_id")

  /** Oracle CTE chain ending in `kcells(vec_id, cluster)` — shared by the
    * k-means gate and the semantic-dedup gate.
    */
  private[operators] val kmeansCtesSql: String = s"""
    e AS (SELECT vec_id, $KQvecSql AS q FROM embeddings),
    qn AS (SELECT vec_id, q,
             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
           FROM e),
    c0 AS (SELECT vec_id AS cid, q AS cq, n2 AS cn2 FROM qn
           WHERE vec_id % $SeedMod = 0),
    d1 AS (
      SELECT vec_id, cid,
        n2 - 2 * CAST(list_sum(list_transform(generate_series(1, len(q)),
          i -> q[i] * cq[i])) AS BIGINT) + cn2 AS d2
      FROM qn, c0),
    a1 AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
          row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d1) WHERE rn = 1),
    px AS (
      SELECT cell, unnest(q) AS qv,
             unnest(generate_series(0, len(q) - 1)) AS i
      FROM a1 JOIN qn USING (vec_id)),
    sums AS (SELECT cell, i, CAST(sum(qv) AS BIGINT) AS sv
             FROM px GROUP BY 1, 2),
    cnts AS (SELECT cell, count(*) AS c FROM a1 GROUP BY cell),
    c1 AS (
      SELECT cell, list(sv ORDER BY i) AS sq, c
      FROM sums JOIN cnts USING (cell) GROUP BY cell, c),
    c1n AS (SELECT cell, sq, c,
              CAST(list_sum(list_transform(sq, x -> x * x)) AS BIGINT) AS s2
            FROM c1),
    d2t AS (
      SELECT vec_id, cell,
        CAST(n2 AS DOUBLE)
          - 2.0 * CAST(dot AS DOUBLE) / CAST(c AS DOUBLE)
          + CAST(s2 AS DOUBLE) / (CAST(c AS DOUBLE) * CAST(c AS DOUBLE)) AS d2
      FROM (
        SELECT qn.vec_id, c1n.cell, c1n.c, c1n.s2, qn.n2,
          CAST(list_sum(list_transform(generate_series(1, len(q)),
            i -> q[i] * sq[i])) AS BIGINT) AS dot
        FROM qn, c1n)),
    kcells AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cell AS cluster,
          row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
        FROM d2t) WHERE rn = 1)"""

  val kmeansEmbedSql: String = s"""
    WITH $kmeansCtesSql
    SELECT vec_id, cluster FROM kcells ORDER BY vec_id"""

  // -------------------------------------------------------- semantic dedup

  /** Cosine threshold for two embeddings to count as semantic duplicates.
    * Deliberately lower than `Similarity.dedupEmbedding`'s LSH threshold:
    * cluster blocking has perfect recall within a cell, so the knob trades
    * aggressiveness, not recall.
    */
  private val SemThreshold = 0.40

  /** Semantic deduplication (the SemDeDup recipe, arXiv:2303.09540): block
    * the corpus by k-means cell, compare all pairs WITHIN a cell with the
    * exact integer cosine, and mark every vector that has a
    * lower-id duplicate above the threshold as droppable (`keep = 0` —
    * the lowest id of each duplicate group is its canonical survivor).
    *
    * Scale shape: the only shuffle keys are the cell id (pair generation —
    * the quadratic term is bounded by the cell size, which the cluster
    * count controls) and the vector id (the keep-aggregation). No
    * all-pairs comparison, no broadcast of anything unbounded; the
    * clusters come from the memoized [[cellsOf]] assignment — in
    * production a persisted artifact of the same k-means that trains the
    * IVF index.
    */
  def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val qn7 = Similarity.qdf(s, dir)
    val m = cellsOf(s, dir).join(qn7, "vec_id")
    val a = m.select(col("cluster"), col("vec_id").as("id_a"),
      col("q").as("qa"), col("n2").as("na"))
    val b = m.select(col("cluster"), col("vec_id").as("id_b"),
      col("q").as("qb"), col("n2").as("nb"))
    val cos = Similarity.cosCol(expr("q_dot(qa, qb)"), col("na"), col("nb"))
    val dupPairs = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(cos >= SemThreshold)
      .select(col("cluster"), col("id_b"))
    m.select(col("cluster"), col("vec_id"))
      .join(dupPairs.groupBy(col("id_b")).agg(count(lit(1)).as("ndup")),
        col("vec_id") === col("id_b"), "left")
      .select(col("vec_id"), col("cluster"),
        when(col("ndup").isNull, 1L).otherwise(0L).as("keep"))
      .orderBy("vec_id")
  }

  val dedupSemanticSql: String = s"""
    WITH $kmeansCtesSql,
    e7 AS (SELECT vec_id, ${Similarity.QvecSql} AS q FROM embeddings),
    qn7 AS (SELECT vec_id, q,
              CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
            FROM e7),
    mm AS (SELECT k.vec_id, k.cluster, q, n2
           FROM kcells k JOIN qn7 ON k.vec_id = qn7.vec_id),
    pr AS (
      SELECT b.vec_id AS id_b, a.n2 AS na, b.n2 AS nb,
        CAST(list_sum(list_transform(generate_series(1, len(a.q)),
          i -> a.q[i] * b.q[i])) AS BIGINT) AS dot
      FROM mm a JOIN mm b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
    dup AS (
      SELECT id_b, count(*) AS ndup FROM pr
      WHERE ${Similarity.PairCosSql} >= $SemThreshold
      GROUP BY 1)
    SELECT mm.vec_id, cluster,
      CASE WHEN dup.id_b IS NULL THEN 1 ELSE 0 END AS keep
    FROM mm LEFT JOIN dup ON mm.vec_id = dup.id_b
    ORDER BY mm.vec_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_clusters" -> (dedupClusters(_, _)),
    "kmeans_embed" -> (kmeansEmbed(_, _)),
    "dedup_semantic" -> (dedupSemantic(_, _)))

  val oracles: Map[String, String] = Map(
    "dedup_clusters" -> dedupClustersSql,
    "kmeans_embed" -> kmeansEmbedSql,
    "dedup_semantic" -> dedupSemanticSql)
}
