package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the kNN similarity graph — centrality for
  * corpus curation (PageRank-weighted data selection: sample documents
  * whose neighbourhoods anchor dense semantic regions).
  *
  * PageRank runs in FIXED-POINT integer arithmetic (scale 10^12, damping
  * 7/8): contributions are integer floor-divisions, per-target sums are
  * exact BIGINT aggregations (order-independent — no float summation
  * drift), and the update `base + (7·Σ) div 8` is pure integer math, so
  * every iteration is bit-identical in Spark and the DuckDB oracle. The
  * float PR value is derived only at output time.
  *
  * Scale: each iteration is one equi-join of the edge list with the rank
  * vector (both O(n·k)) plus a map-side-combining sum — the classic
  * edge-partitioned PageRank shape; nothing is ever driver-side. Dangling
  * mass (vertices with no out-edges) is dropped, the common simplification
  * when ranks feed a relative sampling policy rather than a probability
  * distribution — documented so the oracle states the same contract.
  */
object GraphOps {

  /** Fixed-point scale (1.0 == 10^12). */
  private val Scale = 1000000000000L

  /** Damping 7/8 and base (1 − d) = 1/8, binary-exact by construction. */
  private val BaseFp = Scale / 8

  private val Iters = 3

  private def edgesOf(s: SparkSession, dir: String): DataFrame =
    Similarity.knnGraphOf(s, dir).select(col("src"), col("nbr"))

  /** The fixed-point PageRank loop over any `(src, nbr)` edge frame (key
    * type free — vector ids for the kNN graph, site strings for the link
    * graph). Returns `(v, pr)` with the integer rank.
    */
  private def pagerankOver(edges0: DataFrame): DataFrame = {
    // the edge frame is referenced ~3× per iteration (contribution join,
    // out-degree, node spine) — hand the loop a LEAF so the caller's edge
    // build (regex extraction for the site graph) runs once, not 3·Iters
    // times
    val edges = edges0.localCheckpoint(true)
    val nodes = edges.select(col("src").as("v"))
      .union(edges.select(col("nbr").as("v"))).distinct()
    val odeg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    var pr = nodes.withColumn("pr", lit(Scale))
    (1 to Iters).foreach { _ =>
      val contrib = edges
        .join(pr.select(col("v").as("src"), col("pr")), "src")
        .join(odeg, "src")
        .select(col("nbr").as("v"), expr("pr div d").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("m"))
      pr = nodes.join(contrib, Seq("v"), "left")
        .select(col("v"),
          (lit(BaseFp) + expr(s"(7 * coalesce(m, 0L)) div 8")).as("pr"))
    }
    pr
  }

  /** Fixed-point PageRank after [[Iters]] synchronous iterations over the
    * kNN graph; emits the integer rank and its float rendering.
    */
  def graphPagerank(s: SparkSession, dir: String): DataFrame =
    pagerankOver(edgesOf(s, dir))
      .select(col("v").as("vec_id"), col("pr").as("pr_fixed"),
        round(col("pr").cast("double") / lit(Scale.toDouble), 6).as("pr"))
      .orderBy("vec_id")

  /** Site-level crawl prioritization — the link-graph composition: every
    * document's synthetic page (the [[CorpusFilters.htmlExtract]] family)
    * carries three planted outlinks with a SKEWED coverage structure
    * (targets doc_id mod 10 / 15 / 20, so low-numbered sites accumulate
    * up to 3× the inlink mass), Spark EXTRACTS the links back out of the
    * HTML by regex — while the DuckDB oracle derives the same edge set
    * from the planting arithmetic, so any extraction slip breaks the
    * hash — and the shared integer PageRank ranks the site graph.
    * Self-links are dropped (standard crawl-graph hygiene); edges are
    * distinct site pairs, so the graph is ≤ |sites|² however many pages
    * link.
    */
  /** The integer site-PR frame (site, pr), memoized — `site_rank` and the
    * blocklist filter share it like production shares the crawl ranking.
    */
  private def sitePrOf(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cachedLeaf(s, "site_pr", dir) {
      val page = concat(
        lit("<html><body><p>doc "), col("doc_id"), lit("</p>"),
        lit("<a href=\"http://site"), col("doc_id") % 10,
        lit(".example/p\">l1</a>"),
        lit("<a href=\"http://site"), col("doc_id") % 15,
        lit(".example/p\">l2</a>"),
        lit("<a href=\"http://site"), col("doc_id") % 20,
        lit(".example/p\">l3</a></body></html>"))
      val edges = graft.Tables.documents(s, dir)
        .select(col("doc_id"), page.as("pg"))
        .select(concat(lit("site"), col("doc_id") % 20).as("src"),
          explode(expr(
            "regexp_extract_all(pg, 'href=\"http://(site[0-9]+)\\\\.', 1)"))
            .as("nbr"))
        .filter(col("src") =!= col("nbr"))
        .distinct()
      pagerankOver(edges).select(col("v").as("site"), col("pr"))
    }

  def siteRank(s: SparkSession, dir: String): DataFrame =
    sitePrOf(s, dir)
      .select(col("site"), col("pr").as("pr_fixed"),
        round(col("pr").cast("double") / lit(Scale.toDouble), 6).as("pr"))
      .orderBy("site")

  /** The site-PR CTE prelude shared by [[siteRankSql]] and
    * [[domainBlocklistSql]]: builds `spr(site, pr)` from the planting
    * arithmetic.
    */
  private val sitePrCtes: String = {
    val rounds = (1 to Iters).map { i =>
      val prev = if (i == 1) "spr0" else s"sit${i - 1}"
      s"""
    sit$i AS MATERIALIZED (
      SELECT n.v, CAST($BaseFp + (7 * COALESCE(s.m, 0)) // 8 AS BIGINT) AS pr
      FROM snodes n LEFT JOIN (
        SELECT g.nbr AS v, CAST(SUM(p.pr // o.d) AS BIGINT) AS m
        FROM sedges g JOIN $prev p ON g.src = p.v
        JOIN sodeg o ON g.src = o.src
        GROUP BY 1) s ON n.v = s.v)"""
    }.mkString(",")
    s"""sraw AS (
      SELECT 'site' || (doc_id % 20) AS src, 'site' || (doc_id % 10) AS d1,
        'site' || (doc_id % 15) AS d2, 'site' || (doc_id % 20) AS d3
      FROM documents),
    sedges AS MATERIALIZED (
      SELECT DISTINCT src, nbr FROM (
        SELECT src, d1 AS nbr FROM sraw
        UNION ALL SELECT src, d2 FROM sraw
        UNION ALL SELECT src, d3 FROM sraw)
      WHERE src <> nbr),
    snodes AS MATERIALIZED (
      SELECT DISTINCT v FROM (
        SELECT src AS v FROM sedges UNION SELECT nbr FROM sedges)),
    sodeg AS MATERIALIZED (SELECT src, count(*) AS d FROM sedges GROUP BY 1),
    spr0 AS (SELECT v, CAST($Scale AS BIGINT) AS pr FROM snodes),
    $rounds,
    spr AS (SELECT v AS site, pr FROM sit$Iters)"""
  }

  val siteRankSql: String = s"""
    WITH $sitePrCtes
    SELECT site, pr AS pr_fixed,
      round(CAST(pr AS DOUBLE) / $Scale.0, 6) AS pr
    FROM spr ORDER BY site"""

  /** Deny-listed crawl domains — the deterministic stand-in for the
    * curated blocklist a production pipeline broadcasts (spam/SEO-farm
    * domains); picked to straddle the rank buckets so the keep-rate
    * audit has signal in every stratum.
    */
  private[graft] val Blocked = Seq("site3", "site7", "site12", "site18")

  /** Gate: URL/domain blocklist filtering composed with the crawl
    * ranking — the cheap deny-list stage that runs right after
    * extraction in a crawl pipeline. Spark EXTRACTS each document's site
    * from its synthetic canonical URL by regex while the oracle derives
    * the same key from the planting arithmetic (an extraction slip
    * breaks the hash); the deny list BROADCASTS against the document
    * scan (the 100 TB side never shuffles — same shape as the line-strip
    * exclusion), and the audit reports keep-rate by `site_rank` quartile
    * (two-phase [[DistRank]] rank over the site-PR frame, never a bare
    * global window), so a mis-tuned blocklist that guts high-rank
    * strata shows immediately.
    */
  def domainBlocklist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val page = concat(
      lit("<html><head><link rel=\"canonical\" href=\"http://site"),
      col("doc_id") % 20, lit(".example/d"), col("doc_id"),
      lit("\"/></head><body>d</body></html>"))
    val docs = graft.Tables.documents(s, dir)
      .select(col("doc_id"), page.as("pg"))
      .select(col("doc_id"),
        regexp_extract(col("pg"),
          "href=\"http://(site[0-9]+)\\.", 1).as("site"))
    val deny = Blocked.toDF("site").withColumn("blocked", lit(1L))
    val spr = sitePrOf(s, dir)
    val n = spr.agg(count(lit(1)).as("__n"))
    val rn = DistRank.rowNumber(
      spr.withColumn("__all", lit(0L)).withColumn("np", -col("pr")),
      "__all", Seq(col("np"), col("site")), "site", "rn")
    val bkt = rn.crossJoin(broadcast(n))
      .select(col("site"), expr("((rn - 1) * 4) div __n").as("bucket"))
    docs
      .join(broadcast(deny), Seq("site"), "left")
      .select(col("site"), coalesce(col("blocked"), lit(0L)).as("blocked"))
      .join(broadcast(bkt), "site")
      .groupBy(col("bucket"))
      .agg(countDistinct(col("site")).as("n_sites"),
        countDistinct(when(col("blocked") === 1L, col("site")))
          .as("n_blocked_sites"),
        count(lit(1)).as("n_docs"),
        sum(col("blocked")).as("n_blocked"))
      .select(col("bucket"), col("n_sites"), col("n_blocked_sites"),
        col("n_docs"), col("n_blocked"),
        round((col("n_docs") - col("n_blocked")).cast("double")
          / col("n_docs"), 6).as("keep_rate"))
      .orderBy("bucket")
  }

  val domainBlocklistSql: String = s"""
    WITH $sitePrCtes,
    scnt AS (SELECT count(*) AS n FROM spr),
    srn AS (SELECT site, row_number() OVER (ORDER BY pr DESC, site) AS rn
            FROM spr),
    sbkt AS (SELECT site, ((rn - 1) * 4) // n AS bucket FROM srn, scnt),
    bdocs AS (SELECT doc_id, 'site' || (doc_id % 20) AS site
              FROM documents),
    bdeny AS (SELECT * FROM (VALUES
      ${Blocked.map(b => s"('$b')").mkString(", ")}) d(site)),
    bflag AS (SELECT b.doc_id, b.site,
                CASE WHEN dn.site IS NULL THEN 0 ELSE 1 END AS blocked
              FROM bdocs b LEFT JOIN bdeny dn ON dn.site = b.site)
    SELECT k.bucket,
      CAST(count(DISTINCT f.site) AS BIGINT) AS n_sites,
      CAST(count(DISTINCT CASE WHEN f.blocked = 1 THEN f.site END)
        AS BIGINT) AS n_blocked_sites,
      count(*) AS n_docs,
      CAST(sum(f.blocked) AS BIGINT) AS n_blocked,
      round(CAST(count(*) - sum(f.blocked) AS DOUBLE) / count(*), 6)
        AS keep_rate
    FROM bflag f JOIN sbkt k USING (site)
    GROUP BY k.bucket ORDER BY k.bucket"""

  val graphPagerankSql: String = {
    val rounds = (1 to Iters).map { i =>
      val prev = if (i == 1) "pr0" else s"it${i - 1}"
      s"""
    it$i AS MATERIALIZED (
      SELECT n.v, CAST($BaseFp + (7 * COALESCE(s.m, 0)) // 8 AS BIGINT) AS pr
      FROM nodes n LEFT JOIN (
        SELECT g.nbr AS v, CAST(SUM(p.pr // o.d) AS BIGINT) AS m
        FROM gmat g JOIN $prev p ON g.src = p.v JOIN odeg o ON g.src = o.src
        GROUP BY 1) s ON n.v = s.v)"""
    }.mkString(",")
    s"""
    WITH ${Similarity.knnCtesSql(3)},
    gmat AS MATERIALIZED (SELECT src, nbr FROM graph),
    nodes AS MATERIALIZED (
      SELECT DISTINCT v FROM (
        SELECT src AS v FROM gmat UNION SELECT nbr FROM gmat)),
    odeg AS MATERIALIZED (SELECT src, count(*) AS d FROM gmat GROUP BY 1),
    pr0 AS (SELECT v, CAST($Scale AS BIGINT) AS pr FROM nodes),
    $rounds
    SELECT v AS vec_id, pr AS pr_fixed,
      round(CAST(pr AS DOUBLE) / $Scale.0, 6) AS pr
    FROM it$Iters ORDER BY vec_id"""
  }

  /** Per-vertex triangle participation over the undirected kNN graph —
    * the local clustering signal (dense semantic regions close their
    * triangles; bridge documents don't). Classic two-join shape: orient
    * every undirected edge small→large id, join wedges `a→b→c` (a<b<c by
    * construction), close them against the oriented edge set. Both joins
    * are vertex-keyed equi-joins over O(n·k) edge frames — never a
    * cartesian — and the orientation bounds each wedge list by the
    * smaller endpoint's out-degree (the standard degree-orientation
    * optimization degenerates to id-orientation here because kNN degrees
    * are capped at k by construction).
    */
  def graphTriangles(s: SparkSession, dir: String): DataFrame = {
    val g = edgesOf(s, dir)
    val und = g.unionByName(
        g.select(col("nbr").as("src"), col("src").as("nbr")))
      .distinct()
    val e = und.filter(col("src") < col("nbr")) // canonical orientation
    val wedges = e.select(col("src").as("a"), col("nbr").as("b"))
      .join(e.select(col("src").as("b"), col("nbr").as("c")), "b")
    val tris = wedges.join(
      e.select(col("src").as("a"), col("nbr").as("c")), Seq("a", "c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("vec_id"))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n_tri"))
      .orderBy("vec_id")
  }

  val graphTrianglesSql: String = s"""
    WITH ${Similarity.knnCtesSql(3)},
    und AS (
      SELECT DISTINCT src, nbr FROM (
        SELECT src, nbr FROM graph UNION ALL SELECT nbr, src FROM graph)),
    te AS (SELECT src, nbr FROM und WHERE src < nbr),
    tri AS (
      SELECT w.a, w.b, w.c
      FROM (SELECT e1.src AS a, e1.nbr AS b, e2.nbr AS c
            FROM te e1 JOIN te e2 ON e1.nbr = e2.src) w
      JOIN te e3 ON e3.src = w.a AND e3.nbr = w.c),
    verts AS (
      SELECT a AS vec_id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
    SELECT vec_id, count(*) AS n_tri
    FROM verts GROUP BY vec_id ORDER BY vec_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (graphPagerank _),
    "site_rank" -> (siteRank _),
    "domain_blocklist" -> (domainBlocklist _),
    "graph_triangles" -> (graphTriangles _))

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> graphPagerankSql,
    "site_rank" -> siteRankSql,
    "domain_blocklist" -> domainBlocklistSql,
    "graph_triangles" -> graphTrianglesSql)
}
