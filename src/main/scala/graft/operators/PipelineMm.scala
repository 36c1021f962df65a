package graft.operators

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed MULTIMODAL pipeline gate — the LLaVA-style image-text
  * data layout run end to end over one corpus with a per-stage
  * conservation ledger, the multimodal twin of [[Pipeline.pipelineE2e]]:
  *
  *   arrive (+ the phash family's planted duplicate-image feed)
  *   → Gopher rule gate (ONE shared definition, [[Pipeline.gopherFrame]])
  *   → IMAGE near-dedup: connected components over the verified phash
  *     pairs restricted to quality SURVIVORS, keep the min-id member
  *     (the `phash_clusters` representative convention)
  *   → interleave accounting: vision tokens enter the ledger
  *     ([[Multimodal.mmAccounting]] — the `mm_interleave` numbers)
  *   → vision-token-balanced shard layout ([[Multimodal.mmLayout]] —
  *     the `mm_shard_plan` discipline over the survivor set).
  *
  * Solo gates cannot see the stage CONTRACTS: a shard plan balanced
  * before image dedup double-pays duplicate images' vision tokens; an
  * image-dedup pass over pre-quality docs resurrects documents the rule
  * gate killed. The ledger makes every hand-off auditable: each row is
  * `docs_in = kept + dropped` with reason attribution, text tokens flow
  * conserved through dedup, vision tokens enter EXACTLY at interleave
  * (tokens_out − tokens_in = [[Multimodal.VisionTokens]] × images), and
  * the shard tail conserves the total.
  *
  * The planted feed (every 9th doc re-arriving under id + shift with
  * the SAME text and a pixel-identical image — the phash store's own
  * plant convention) makes the dedup hand-off self-checking: copies
  * share their source's quality verdict (the augmentation keys on
  * `doc_id % PlantShift`), so every planted id either dies with its
  * source at quality or dies to its source at image dedup — a planted
  * id surviving stage 2 means a stage contract broke.
  *
  * Scale: every stage keeps its solo gate's plan shape — narrow maps,
  * the phash pair equi-join (LSH-band bounded), frontier propagation
  * over the survivor-filtered edges, one [[DistRank.runningSum]]
  * two-phase pass; the ledger is one checkpointed scalar row.
  *
  * Reference analog: `Upload.run` (`lib/LINZ/BdeUpload.pm:612`+)
  * composing per-table applies under one bookkeeping ledger
  * (`sql/02-bde_control_functions.sql.in:975 _bde_RecordDatasetLoaded`).
  */
object PipelineMm {

  import TextNorm.{norm, normSql}

  /** The phash family's planted-duplicate shift and feed modulus — the
    * SHARED `Multimodal` definitions (`phashesOf` plants with exactly
    * these), so the arriving universe matches the image store's id
    * space BY CONSTRUCTION, not by parallel literals (advice finding,
    * r15).
    */
  private val PlantShift = Multimodal.PlantShift
  private val PlantMod = Multimodal.PlantMod

  def pipelineE2eMm(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(s, "pipeline_e2e_mm", dir) {
      // ---- stages 0-1: arrive (corpus + planted duplicate feed, the
      // id-collision guard riding the memoized frame) and the shared
      // Gopher rule gate — ONE [[Pipeline.qfPlanted]] build per
      // (session, dir, PlantMod), shared with the incremental mm twins
      // and the audio family (copies carry their source's verdicts by
      // construction; the rule columns key on doc_id % PlantShift)
      val qf = Pipeline.qfPlanted(s, dir, PlantMod)
      val s1 = qf.filter(col("keep"))
        .select(col("doc_id"), col("text"), col("n_tokens"), col("planted"))
        .persist()

      // ---- stage 2: image near-dedup over survivors — verified phash
      // pairs both of whose endpoints survived quality, components,
      // keep the min-id member (the phash_clusters representative; the
      // component label IS the min id, so membership is one comparison)
      val pairs = Multimodal.phashPairs(s, dir)
        .select(col("id_a"), col("id_b"))
      val ids1 = s1.select(col("doc_id"))
      val pairsF = pairs
        .join(ids1.withColumnRenamed("doc_id", "id_a"), "id_a")
        .join(ids1.withColumnRenamed("doc_id", "id_b"), "id_b")
        .persist()
      val edges = pairsF.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(
          pairsF.select(col("id_b").as("src"), col("id_a").as("dst")))
      val labels = Clustering.ccLabels(edges)
      val labP = labels.select(col("id"), col("lab")).persist()
      val s2 = s1
        .join(labP.select(col("id").as("doc_id"), col("lab")),
          Seq("doc_id"), "left")
        .filter(col("lab").isNull || col("doc_id") === col("lab"))
        .select(col("doc_id"), col("text"), col("n_tokens"), col("planted"))
        .persist()

      // ---- stage 3: interleave accounting — vision tokens enter here
      val acc = Multimodal.mmAccounting(
          s2.select(col("doc_id"), col("text")))
        .persist()

      // ---- stage 4: vision-token-balanced shard layout (O(shards))
      val layout = Multimodal.mmLayout(acc).persist()

      // ---- the ledger: 5 rows of scalar aggregates. Same-frame
      // aggregates FUSED into one pass over qf (arrive totals + rule
      // failures + stage-1 survivors via conditional sums).
      def st(c: org.apache.spark.sql.Column) = c.cast("string")
      val aQF = qf.agg(count(lit(1)).as("d_u"),
        sum(col("n_tokens")).as("t_u"),
        sum(col("planted")).as("np"),
        sum(when(!col("r_words"), 1L).otherwise(0L)).as("fw"),
        sum(when(!col("r_mean_len"), 1L).otherwise(0L)).as("fm"),
        sum(when(!col("r_symbols"), 1L).otherwise(0L)).as("fs"),
        sum(when(!col("r_alpha"), 1L).otherwise(0L)).as("fa"),
        sum(when(!col("r_stopwords"), 1L).otherwise(0L)).as("fst"),
        coalesce(sum(when(col("keep"), 1L).otherwise(0L)), lit(0L))
          .as("d1"),
        coalesce(sum(when(col("keep"), col("n_tokens"))), lit(0L))
          .as("t1"))
      val aC = labP.agg(countDistinct(col("lab")).as("ncl"),
        count(lit(1)).as("nmem"))
      val a2 = s2.agg(count(lit(1)).as("d2"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("t2"))
      val a3 = acc.agg(
        coalesce(sum(col("n_images")), lit(0L)).as("nimg"),
        sum(when(col("n_images") > 0, 1L).otherwise(0L)).as("ndwi"),
        coalesce(sum(col("n_total_tokens")), lit(0L)).as("t3"))
      val a4 = layout.agg(count(lit(1)).as("nshards"),
        coalesce(sum(col("member_check")), lit(0L)).as("chk"))

      // The self-check the planted feed exists for, FAIL-LOUDLY in-plan
      // (the plant-guard idiom — a FILTER must evaluate): every planted
      // copy shares its source's quality verdict, so it either dies at
      // quality with the source or dies at image dedup TO the source
      // (identical pixels → hamming 0 → same cluster, min-id keeps the
      // source). A planted id in s2 means a stage contract broke.
      val plantDead = s2.agg(coalesce(
        assert_true(
          coalesce(sum(col("planted")), lit(0L)) === 0L,
          lit("pipeline_e2e_mm: a planted duplicate survived image " +
            "dedup — the quality/dedup stage contract broke"))
          .cast("long"),
        lit(0L)).as("__pd"))

      // ONE checkpointed scalar row (the ledger-scalars lesson: the
      // branches below would re-execute every crossJoined subtree)
      val scalars = aQF.crossJoin(aC)
        .crossJoin(a2).crossJoin(a3).crossJoin(a4)
        .crossJoin(plantDead)
        .filter(col("__pd") === 0L)
        .drop("__pd")
        .localCheckpoint(true)

      def row(id: Int, name: String, din: org.apache.spark.sql.Column,
              dkept: org.apache.spark.sql.Column,
              tin: org.apache.spark.sql.Column,
              tout: org.apache.spark.sql.Column,
              detail: org.apache.spark.sql.Column): DataFrame =
        scalars.select(lit(id.toLong).as("stage_id"),
          lit(name).as("stage"), din.as("docs_in"), dkept.as("docs_kept"),
          (din - dkept).as("docs_dropped"),
          tin.as("tokens_in"), tout.as("tokens_out"),
          detail.as("detail"))

      val ledger = row(0, "arrive", col("d_u"), col("d_u"), col("t_u"),
          col("t_u"), concat(lit("planted="), st(col("np"))))
        .unionByName(row(1, "quality", col("d_u"), col("d1"), col("t_u"),
          col("t1"),
          concat(lit("r_words="), st(col("fw")), lit(",r_mean_len="),
            st(col("fm")), lit(",r_symbols="), st(col("fs")),
            lit(",r_alpha="), st(col("fa")), lit(",r_stopwords="),
            st(col("fst")))))
        .unionByName(row(2, "image_dedup", col("d1"), col("d2"),
          col("t1"), col("t2"),
          concat(lit("clusters="), st(col("ncl")), lit(",members="),
            st(col("nmem")))))
        .unionByName(row(3, "interleave", col("d2"), col("d2"),
          col("t2"), col("t3"),
          concat(lit("images="), st(col("nimg")),
            lit(",docs_with_images="), st(col("ndwi")),
            lit(",vision_tokens="), st(col("t3") - col("t2")))))
        .unionByName(row(4, "shard", col("d2"), col("d2"), col("t3"),
          col("t3"), concat(lit("shards="), st(col("nshards")),
            lit(",check="), st(col("chk")))))
        .orderBy("stage_id")
        .localCheckpoint(true)

      // qf is Memo-owned (released by Memo.clear)
      Seq(s1, pairsF, labP, s2, acc, layout).foreach(_.unpersist(false))
      labels.unpersist(false)
      ledger
    }

  val pipelineE2eMmSql: String = {
    val shards = TrainPrep.OutShards
    val vt = Multimodal.VisionTokens
    s"""
    WITH RECURSIVE ${Multimodal.phashPairCtesSql},
    pm_u AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      SELECT doc_id + $PlantShift, lang, text FROM documents
      WHERE doc_id % $PlantMod = 0),
    ${Pipeline.gopherCtes("pm_u", "pm_")},
    pm_s1 AS MATERIALIZED (
      SELECT doc_id, text, n_tokens FROM pm_qf
      WHERE r_words AND r_mean_len AND r_symbols AND r_alpha
        AND r_stopwords),
    pm_edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM cand
        JOIN pm_s1 a ON id_a = a.doc_id JOIN pm_s1 b ON id_b = b.doc_id
      WHERE hamming <= ${Multimodal.PhashMaxHamming}
      UNION
      SELECT id_b, id_a FROM cand
        JOIN pm_s1 a ON id_a = a.doc_id JOIN pm_s1 b ON id_b = b.doc_id
      WHERE hamming <= ${Multimodal.PhashMaxHamming}),
    pm_reach(id, lab) AS (
      SELECT src, src FROM pm_edges
      UNION
      SELECT e.src, r.lab FROM pm_edges e JOIN pm_reach r ON r.id = e.dst),
    pm_comp AS MATERIALIZED (
      SELECT id AS doc_id, min(lab) AS lab FROM pm_reach GROUP BY id),
    pm_s2 AS MATERIALIZED (
      SELECT p.doc_id, p.text, p.n_tokens
      FROM pm_s1 p LEFT JOIN pm_comp c USING (doc_id)
      WHERE c.lab IS NULL OR p.doc_id = c.lab),
    pm_ac AS MATERIALIZED (
      SELECT doc_id,
        CAST(len(ps) AS BIGINT) AS n_images,
        CAST(n_words AS BIGINT) AS n_text_tokens,
        CAST(len(ps) * $vt AS BIGINT) AS n_image_tokens,
        CAST(n_words + len(ps) * $vt AS BIGINT) AS n_total_tokens
      FROM (SELECT doc_id, n_words,
              CASE WHEN doc_id % 3 = 0 THEN
                list_sort(list_distinct([doc_id % (n_words + 1),
                                         (doc_id * 7) % (n_words + 1)]))
              ELSE [] END AS ps
            FROM (SELECT doc_id,
                    len(string_split($normSql, ' ')) AS n_words
                  FROM pm_s2))),
    pm_sz AS (
      SELECT CAST((sum(n_total_tokens) + ${shards - 1}) // $shards
        AS BIGINT) AS ssize
      FROM pm_ac),
    pm_sh AS MATERIALIZED (
      SELECT CAST((cs - n_total_tokens) // ssize AS BIGINT) AS shard_id,
        ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':ck'),
          1, 8))::BIGINT AS ck
      FROM (SELECT doc_id, n_total_tokens,
              CAST(sum(n_total_tokens) OVER (ORDER BY h, doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
            FROM (SELECT *, ('0x' || substring(
                md5(CAST(doc_id AS VARCHAR) || ':mm'), 1, 8))::BIGINT AS h
              FROM pm_ac)), pm_sz),
    pm_a0 AS (
      SELECT count(*) AS d_u, CAST(sum(n_tokens) AS BIGINT) AS t_u,
        (SELECT count(*) FROM documents WHERE doc_id % $PlantMod = 0) AS np
      FROM pm_tok),
    pm_a1 AS (
      SELECT count(*) FILTER (WHERE NOT r_words) AS fw,
        count(*) FILTER (WHERE NOT r_mean_len) AS fm,
        count(*) FILTER (WHERE NOT r_symbols) AS fs,
        count(*) FILTER (WHERE NOT r_alpha) AS fa,
        count(*) FILTER (WHERE NOT r_stopwords) AS fst
      FROM pm_qf),
    pm_a2 AS (
      SELECT count(*) AS d1,
        CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t1
      FROM pm_s1),
    pm_a3 AS (
      SELECT count(DISTINCT lab) AS ncl, count(*) AS nmem FROM pm_comp),
    pm_a4 AS (
      SELECT count(*) AS d2,
        CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t2
      FROM pm_s2),
    pm_a5 AS (
      SELECT CAST(coalesce(sum(n_images), 0) AS BIGINT) AS nimg,
        count(*) FILTER (WHERE n_images > 0) AS ndwi,
        CAST(coalesce(sum(n_total_tokens), 0) AS BIGINT) AS t3
      FROM pm_ac),
    pm_a6 AS (
      SELECT count(DISTINCT shard_id) AS nshards,
        CAST(coalesce(sum(ck), 0) AS BIGINT) AS chk
      FROM pm_sh),
    pm_a AS (
      SELECT * FROM pm_a0, pm_a1, pm_a2, pm_a3, pm_a4, pm_a5, pm_a6)
    SELECT stage_id, stage, docs_in, docs_kept,
      docs_in - docs_kept AS docs_dropped, tokens_in, tokens_out, detail
    FROM (
      SELECT CAST(0 AS BIGINT) AS stage_id, 'arrive' AS stage,
        d_u AS docs_in, d_u AS docs_kept, t_u AS tokens_in,
        t_u AS tokens_out,
        'planted=' || CAST(np AS VARCHAR) AS detail FROM pm_a
      UNION ALL
      SELECT 1, 'quality', d_u, d1, t_u, t1,
        'r_words=' || CAST(fw AS VARCHAR)
          || ',r_mean_len=' || CAST(fm AS VARCHAR)
          || ',r_symbols=' || CAST(fs AS VARCHAR)
          || ',r_alpha=' || CAST(fa AS VARCHAR)
          || ',r_stopwords=' || CAST(fst AS VARCHAR) FROM pm_a
      UNION ALL
      SELECT 2, 'image_dedup', d1, d2, t1, t2,
        'clusters=' || CAST(ncl AS VARCHAR)
          || ',members=' || CAST(nmem AS VARCHAR) FROM pm_a
      UNION ALL
      SELECT 3, 'interleave', d2, d2, t2, t3,
        'images=' || CAST(nimg AS VARCHAR)
          || ',docs_with_images=' || CAST(ndwi AS VARCHAR)
          || ',vision_tokens=' || CAST(t3 - t2 AS VARCHAR) FROM pm_a
      UNION ALL
      SELECT 4, 'shard', d2, d2, t3, t3,
        'shards=' || CAST(nshards AS VARCHAR)
          || ',check=' || CAST(chk AS VARCHAR) FROM pm_a)
    ORDER BY stage_id"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_e2e_mm" -> (pipelineE2eMm(_, _)))

  val oracles: Map[String, String] = Map(
    "pipeline_e2e_mm" -> pipelineE2eMmSql)
}
