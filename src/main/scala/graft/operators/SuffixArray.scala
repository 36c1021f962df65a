package graft.operators

import graft.Memo
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed suffix ranking by prefix doubling (Manber & Myers 1990 via
  * the parallel formulation of Flick & Aluru, SC'15) — the suffix-array
  * family behind exact substring dedup (Lee et al. 2022) WITHOUT a fixed
  * gram size: after round j every position's rank is the dense rank of
  * its first 4^j tokens, so one construction answers duplicated-prefix
  * questions at several resolutions at once — the question the fixed-k
  * gram pipeline ([[SubstringDedup]]) must re-scan per k.
  *
  * Construction, all declarative and shuffle-bounded:
  *
  *  1. round 0 ranks each position by its token (dense rank of the token
  *     vocabulary);
  *  2. round j joins each position's round-(j−1) rank with the ranks at
  *     offsets 4^(j−1), 2·4^(j−1), 3·4^(j−1) (0 past the document end —
  *     documents are their own terminators, so suffixes never cross a
  *     document) and dense-ranks the quadruple. QUATERNARY doubling
  *     (rank covers ×4 per round, the tuning Flick & Aluru call k-ary
  *     doubling) halves the round count of the classic binary scheme:
  *     the extra offset joins ride the same shuffle while the per-round
  *     fixed cost — the boundary pick, the materialization, the rank
  *     join — is paid half as often (measured 33 s → 19 s at sf0.1);
  *  3. dense ranking is DISTINCT quadruples → [[DistRank.rowNumber]]
  *     (the two-phase boundary-broadcast rank — row_number over a
  *     distinct frame IS the dense rank of the original) → equi-join
  *     back. No global window anywhere; each round is O(corpus) shuffle
  *     keyed by the rank tuple, and ⌈log4 maxlen⌉ rounds finish the
  *     order.
  *
  * Every round materializes through [[barrier]] and caches its pair
  * frame for the round's two consumers (the boundary pick and the rank
  * join — left uncached each would re-evaluate the joins), and the round
  * tables are memoized per (session, dir) — `suffix_array` and
  * `suffix_maxmatch` share them, as production would share the built
  * index. Identical suffixes (the planted cross-document copies) share a
  * final rank by construction — exactly the groups the dedup statistics
  * read off.
  */
object SuffixArray {

  /** 4^Rounds must reach past the longest document (≤ 256 tokens in the
    * synthetic corpus at every sf; a longer corpus raises this and pays
    * one more O(n) round per ×4).
    */
  private val Rounds = 4

  /** The same planted-copy corpus as the substring dedup gates, already
    * tokenized: (doc_id, p, tok).
    */
  private[graft] def toks(s: SparkSession, dir: String): DataFrame = {
    import TextNorm.norm
    SubstringDedup.corpus(s, dir)
      .select(col("doc_id"), split(norm, " ").as("ws"))
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
  }

  /** Eager local checkpoint + fresh-leaf re-wrap. A bare localCheckpoint
    * leaf CARRIES the original plan's size estimate forward (Spark
    * preserves stats through checkpoints), so chained rounds COMPOUND the
    * estimate — each round squares it through its joins, the digits
    * double per round, and within a few rounds Catalyst's BigInt stats
    * arithmetic dominates wall-clock (measured: minutes of pure
    * SizeInBytesOnlyStatsPlanVisitor under AQE). Re-wrapping the
    * checkpointed RDD resets the leaf's stats; every join that must
    * broadcast is explicitly hinted, so nothing downstream needs the
    * estimate.
    */
  private def barrier(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Dense rank of `df` over `keys` (ascending): row_number over the
    * distinct key frame via the two-phase DistRank, joined back. The
    * distinct frame is O(|df|) worst-case but carries only the key
    * columns; the join back is an equi-join on the full key.
    */
  private def denseRank(df: DataFrame, keys: Seq[String],
                        out: String): DataFrame = {
    val dk = df.select(keys.map(col): _*).distinct()
      .withColumn("__all", lit(0L))
      .withColumn("__hk",
        concat_ws(":", keys.map(c => col(c).cast("string")): _*))
    val ranked = DistRank.rowNumber(dk, "__all", keys.map(col), "__hk", out)
      .drop("__all", "__hk")
    df.join(ranked, keys)
  }

  /** The round-j rank table (doc_id, p, r), memoized per (session, dir).
    * Round j's rank orders positions by their first 4^j tokens.
    */
  private[operators] def ranks(s: SparkSession, dir: String,
                               j: Int): DataFrame =
    Memo.cached(s, s"sa_q$j", dir) {
      if (j == 0)
        barrier(denseRank(toks(s, dir), Seq("tok"), "r")
          .select(col("doc_id"), col("p"), col("r")))
      else {
        val prev = ranks(s, dir, j - 1)
        val o = 1 << (2 * (j - 1)) // 4^(j-1)
        var paired = prev
        for (i <- 1 to 3) {
          val bi = prev.select(col("doc_id"), (col("p") - i * o).as("p"),
            col("r").as(s"r$i"))
          paired = paired.join(bi, Seq("doc_id", "p"), "left")
            .withColumn(s"r$i", coalesce(col(s"r$i"), lit(0L)))
        }
        // two consumers (boundary pick, rank join) read the pair frame;
        // cache for the round, release once the barrier materialized
        val shared = paired.cache()
        val out = barrier(
          denseRank(shared, Seq("r", "r1", "r2", "r3"), "rn")
            .select(col("doc_id"), col("p"), col("rn").as("r")))
        shared.unpersist(false)
        out
      }
    }

  /** Gate: the full suffix ranking — one row per token position with its
    * final dense suffix rank (equal ranks ⇔ identical suffixes to the
    * document end).
    */
  def suffixArray(s: SparkSession, dir: String): DataFrame =
    ranks(s, dir, Rounds)
      .select(col("doc_id"), col("p"), col("r").as("sa_rank"))
      .orderBy("doc_id", "p")

  private def roundSql(j: Int): String =
    if (j == 0)
      """r0 AS MATERIALIZED (
      SELECT doc_id, p, CAST(dense_rank() OVER (ORDER BY tok) AS BIGINT) AS r
      FROM toks)"""
    else {
      val o = 1 << (2 * (j - 1))
      s"""r$j AS MATERIALIZED (
      SELECT a.doc_id, a.p,
        CAST(dense_rank() OVER (ORDER BY a.r, coalesce(b.r, 0),
          coalesce(c.r, 0), coalesce(d.r, 0)) AS BIGINT) AS r
      FROM r${j - 1} a
      LEFT JOIN r${j - 1} b ON b.doc_id = a.doc_id AND b.p = a.p + $o
      LEFT JOIN r${j - 1} c ON c.doc_id = a.doc_id AND c.p = a.p + ${2 * o}
      LEFT JOIN r${j - 1} d ON d.doc_id = a.doc_id AND d.p = a.p + ${3 * o})"""
    }

  private val preludeSql: String = s"""
    ${SubstringDedup.corpusSql.trim},
    pos AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS p
            FROM alltok),
    toks AS (SELECT doc_id, p, ws[p] AS tok FROM pos),
    ${(0 to Rounds).map(roundSql).mkString(",\n    ")}"""

  val suffixArraySql: String = s"""
    WITH $preludeSql
    SELECT doc_id, p, r AS sa_rank FROM r$Rounds ORDER BY doc_id, p"""

  /** Gate: multi-resolution cross-document duplicated-prefix census. A
    * position has a cross-document match of length ≥ 4^j iff its round-j
    * rank group spans ≥ 2 documents (min ≠ max document id over the
    * group — one aggregate per round, no pair join; matches are
    * terminator-padded, so identical shorter suffixes-to-end count like
    * the gram pipeline's document-end grams). Per document: positions
    * with matches ≥ 4 / 16 / 64 tokens and the largest such power — the
    * statistic that sizes a substring-dedup pass and catches the long
    * spans a single fixed k can only see truncated.
    */
  def suffixMaxmatch(s: SparkSession, dir: String): DataFrame = {
    def matched(j: Int): DataFrame = {
      val r = ranks(s, dir, j)
      val g = r.groupBy(col("r"))
        .agg(min(col("doc_id")).as("dlo"), max(col("doc_id")).as("dhi"))
        .filter(col("dlo") =!= col("dhi"))
        .select(col("r"))
      r.join(g, "r").select(col("doc_id"), col("p"))
    }
    val a4 = matched(1).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n4"))
    val a16 = matched(2).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n16"))
    val a64 = matched(3).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n64"))
    a4.join(a16, Seq("doc_id"), "left")
      .join(a64, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n4"),
        coalesce(col("n16"), lit(0L)).as("n16"),
        coalesce(col("n64"), lit(0L)).as("n64"),
        when(coalesce(col("n64"), lit(0L)) > 0, 64L)
          .when(coalesce(col("n16"), lit(0L)) > 0, 16L)
          .otherwise(4L).as("maxpow"))
      .orderBy("doc_id")
  }

  val suffixMaxmatchSql: String = {
    def m(j: Int) = s"""
    x$j AS (SELECT r FROM r$j GROUP BY r
            HAVING min(doc_id) <> max(doc_id)),
    m$j AS (SELECT t.doc_id, t.p FROM r$j t JOIN x$j USING (r))"""
    s"""
    WITH $preludeSql,
    ${m(1).trim},
    ${m(2).trim},
    ${m(3).trim},
    a4 AS (SELECT doc_id, count(*) AS n4 FROM m1 GROUP BY doc_id),
    a16 AS (SELECT doc_id, count(*) AS n16 FROM m2 GROUP BY doc_id),
    a64 AS (SELECT doc_id, count(*) AS n64 FROM m3 GROUP BY doc_id)
    SELECT a4.doc_id, n4, coalesce(n16, 0) AS n16, coalesce(n64, 0) AS n64,
      CAST(CASE WHEN coalesce(n64, 0) > 0 THEN 64
                WHEN coalesce(n16, 0) > 0 THEN 16
                ELSE 4 END AS BIGINT) AS maxpow
    FROM a4 LEFT JOIN a16 USING (doc_id) LEFT JOIN a64 USING (doc_id)
    ORDER BY doc_id"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "suffix_array" -> (suffixArray _),
    "suffix_maxmatch" -> (suffixMaxmatch _))

  val oracles: Map[String, String] = Map(
    "suffix_array" -> suffixArraySql,
    "suffix_maxmatch" -> suffixMaxmatchSql)
}
