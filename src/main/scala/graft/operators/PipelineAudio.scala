package graft.operators

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed AUDIO pipeline gate — the AudioLM/Flamingo-style
  * audio-text data layout run end to end over one corpus with a
  * per-stage conservation ledger, the audio twin of
  * [[PipelineMm.pipelineE2eMm]], closing the modality symmetry the r16
  * verdict asked for (text and image had composed pipelines; audio
  * tokens entered solo accounting only):
  *
  *   arrive (+ the audio fingerprint store's planted duplicate-clip feed)
  *   → Gopher rule gate (ONE shared definition, [[Pipeline.gopherFrame]])
  *   → AUDIO near-dedup: connected components over the verified
  *     fingerprint pairs ([[AudioFp.audioFpPairs]]) restricted to
  *     quality SURVIVORS, keep the min-id member (the
  *     `audio_fp_clusters` representative convention — a re-crawled or
  *     replanted clip must not be double-priced)
  *   → interleave accounting: rate-derived audio tokens enter the
  *     ledger ([[Multimodal.audioAccounting]] — the `audio_interleave`
  *     numbers, cost ⌈samples·rate_tok/rate⌉ from the REAL decode)
  *   → audio-token-balanced shard layout ([[Multimodal.mediaLayout]] —
  *     the `audio_shard_plan` discipline over the survivor set).
  *
  * The planted feed (every [[Multimodal.PlantMod]]-th doc re-arriving
  * under id + shift with the SAME text and a byte-identical WAV — the
  * fingerprint store's own plant convention) makes the dedup hand-off
  * self-checking exactly as in the image pipeline: copies share their
  * source's quality verdict (the augmentation keys on
  * `doc_id % PlantShift`), so every planted id either dies with its
  * source at quality or dies to its source at audio dedup (identical
  * PCM → hamming 0 → same cluster, min-id keeps the source). A plant
  * surviving stage 2 fails an IN-PLAN assert. The re-crawl family
  * ([[Multimodal.genOf]]) additionally collapses ~n/10 corpus docs onto
  * their clip source — the realistic duplicate rate a crawl has.
  *
  * Scale: every stage keeps its solo gate's plan shape — narrow maps
  * for quality, the banded fingerprint equi-join, frontier propagation
  * over survivor-filtered edges, the memoized decode frames joined once,
  * one [[DistRank.runningSum]] two-phase pass; the ledger is one
  * checkpointed scalar row.
  *
  * Reference analog: `Upload.run` (`lib/LINZ/BdeUpload.pm:612`+)
  * composing per-table applies under one bookkeeping ledger
  * (`sql/02-bde_control_functions.sql.in:975 _bde_RecordDatasetLoaded`).
  */
object PipelineAudio {

  import TextNorm.{norm, normSql}

  private val PlantShift = Multimodal.PlantShift
  private val PlantMod = Multimodal.PlantMod

  def pipelineE2eAudio(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(s, "pipeline_e2e_audio", dir) {
      // ---- stages 0-1: arrive (corpus + planted duplicate feed, the
      // id-collision guard riding the memoized frame) and the shared
      // Gopher rule gate — ONE [[Pipeline.qfPlanted]] build per
      // (session, dir, PlantMod), shared across the mm/audio family
      val qf = Pipeline.qfPlanted(s, dir, PlantMod)
      val s1 = qf.filter(col("keep"))
        .select(col("doc_id"), col("text"), col("n_tokens"), col("planted"))
        .persist()

      // ---- stage 2: audio near-dedup over survivors — verified
      // fingerprint pairs both of whose endpoints survived quality,
      // components, keep the min-id member
      val pairs = AudioFp.audioFpPairs(s, dir)
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

      // ---- stage 3: interleave accounting — audio tokens enter here,
      // priced from the REAL decoded (samples, rate)
      val acc = Multimodal.audioAccounting(s, dir,
          s2.select(col("doc_id"), col("text")))
        .persist()

      // ---- stage 4: audio-token-balanced shard layout (O(shards))
      val layout = Multimodal.mediaLayout(
          acc.select(col("doc_id"), col("n_clips"), col("n_text_tokens"),
            col("n_audio_tokens"), col("n_total_tokens")),
          "n_clips", "n_audio_tokens")
        .persist()

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
        coalesce(sum(col("n_clips")), lit(0L)).as("nclips"),
        sum(when(col("n_clips") > 0, 1L).otherwise(0L)).as("ndwa"),
        coalesce(sum(col("n_total_tokens")), lit(0L)).as("t3"))
      val a4 = layout.agg(count(lit(1)).as("nshards"),
        coalesce(sum(col("member_check")), lit(0L)).as("chk"))

      // the plant self-check, FAIL-LOUDLY in-plan: every planted copy
      // shares its source's quality verdict, so it either dies at
      // quality with the source or dies at audio dedup TO the source
      val plantDead = s2.agg(coalesce(
        assert_true(
          coalesce(sum(col("planted")), lit(0L)) === 0L,
          lit("pipeline_e2e_audio: a planted duplicate survived audio " +
            "dedup — the quality/dedup stage contract broke"))
          .cast("long"),
        lit(0L)).as("__pd"))

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
        .unionByName(row(2, "audio_dedup", col("d1"), col("d2"),
          col("t1"), col("t2"),
          concat(lit("clusters="), st(col("ncl")), lit(",members="),
            st(col("nmem")))))
        .unionByName(row(3, "interleave", col("d2"), col("d2"),
          col("t2"), col("t3"),
          concat(lit("clips="), st(col("nclips")),
            lit(",docs_with_audio="), st(col("ndwa")),
            lit(",audio_tokens="), st(col("t3") - col("t2")))))
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

  /** The audio-accounting CTE body over a survivor CTE exposing
    * `(doc_id, text)` — the `audio_interleave` arithmetic as the oracle
    * replays it (clip geometry from the parity constants), shared by
    * the full pipeline oracle and the incremental twins'
    * ([[PipelineAudioIncr]]).
    */
  private[operators] def audioAccSql(src: String): String = {
    val full = Multimodal.AudRate.toInt
    val samples = Multimodal.AudSamples
    val tps = Multimodal.AudioTokensPerSec
    s"""
      SELECT doc_id,
        CAST(n_clips AS BIGINT) AS n_clips,
        CAST(n_text_tokens AS BIGINT) AS n_text_tokens,
        CAST(CASE WHEN n_clips > 0 THEN n_clips *
            ((clip_samples * $tps + clip_rate - 1) // clip_rate)
          ELSE 0 END AS BIGINT) AS n_audio_tokens,
        CAST(n_text_tokens + CASE WHEN n_clips > 0 THEN n_clips *
            ((clip_samples * $tps + clip_rate - 1) // clip_rate)
          ELSE 0 END AS BIGINT) AS n_total_tokens
      FROM (SELECT doc_id,
              len(string_split($normSql, ' ')) AS n_text_tokens,
              CASE WHEN doc_id % 3 = 1 THEN 1 + (doc_id // 3) % 3
                ELSE 0 END AS n_clips,
              CASE WHEN doc_id % 2 = 0 THEN $full ELSE ${full / 2} END
                AS clip_rate,
              CASE WHEN doc_id % 2 = 0 THEN $samples
                ELSE ${samples / 2} END AS clip_samples
            FROM $src)"""
  }

  val pipelineE2eAudioSql: String = {
    val shards = TrainPrep.OutShards
    s"""
    WITH RECURSIVE ${AudioFp.audioFpCtesSql},
    pa_u AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      SELECT doc_id + $PlantShift, lang, text FROM documents
      WHERE doc_id % $PlantMod = 0),
    ${Pipeline.gopherCtes("pa_u", "pa_")},
    pa_s1 AS MATERIALIZED (
      SELECT doc_id, text, n_tokens FROM pa_qf
      WHERE r_words AND r_mean_len AND r_symbols AND r_alpha
        AND r_stopwords),
    pa_edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM afcand
        JOIN pa_s1 a ON id_a = a.doc_id JOIN pa_s1 b ON id_b = b.doc_id
      WHERE hamming <= ${AudioFp.AudioFpMaxHamming}
      UNION
      SELECT id_b, id_a FROM afcand
        JOIN pa_s1 a ON id_a = a.doc_id JOIN pa_s1 b ON id_b = b.doc_id
      WHERE hamming <= ${AudioFp.AudioFpMaxHamming}),
    pa_reach(id, lab) AS (
      SELECT src, src FROM pa_edges
      UNION
      SELECT e.src, r.lab FROM pa_edges e JOIN pa_reach r ON r.id = e.dst),
    pa_comp AS MATERIALIZED (
      SELECT id AS doc_id, min(lab) AS lab FROM pa_reach GROUP BY id),
    pa_s2 AS MATERIALIZED (
      SELECT p.doc_id, p.text, p.n_tokens
      FROM pa_s1 p LEFT JOIN pa_comp c USING (doc_id)
      WHERE c.lab IS NULL OR p.doc_id = c.lab),
    pa_ac AS MATERIALIZED (${audioAccSql("pa_s2")}),
    pa_sz AS (
      SELECT CAST((sum(n_total_tokens) + ${shards - 1}) // $shards
        AS BIGINT) AS ssize
      FROM pa_ac),
    pa_sh AS MATERIALIZED (
      SELECT CAST((cs - n_total_tokens) // ssize AS BIGINT) AS shard_id,
        ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':ck'),
          1, 8))::BIGINT AS ck
      FROM (SELECT doc_id, n_total_tokens,
              CAST(sum(n_total_tokens) OVER (ORDER BY h, doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
            FROM (SELECT *, ('0x' || substring(
                md5(CAST(doc_id AS VARCHAR) || ':mm'), 1, 8))::BIGINT AS h
              FROM pa_ac)), pa_sz),
    pa_a0 AS (
      SELECT count(*) AS d_u, CAST(sum(n_tokens) AS BIGINT) AS t_u,
        (SELECT count(*) FROM documents WHERE doc_id % $PlantMod = 0) AS np
      FROM pa_tok),
    pa_a1 AS (
      SELECT count(*) FILTER (WHERE NOT r_words) AS fw,
        count(*) FILTER (WHERE NOT r_mean_len) AS fm,
        count(*) FILTER (WHERE NOT r_symbols) AS fs,
        count(*) FILTER (WHERE NOT r_alpha) AS fa,
        count(*) FILTER (WHERE NOT r_stopwords) AS fst
      FROM pa_qf),
    pa_a2 AS (
      SELECT count(*) AS d1,
        CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t1
      FROM pa_s1),
    pa_a3 AS (
      SELECT count(DISTINCT lab) AS ncl, count(*) AS nmem FROM pa_comp),
    pa_a4 AS (
      SELECT count(*) AS d2,
        CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t2
      FROM pa_s2),
    pa_a5 AS (
      SELECT CAST(coalesce(sum(n_clips), 0) AS BIGINT) AS nclips,
        count(*) FILTER (WHERE n_clips > 0) AS ndwa,
        CAST(coalesce(sum(n_total_tokens), 0) AS BIGINT) AS t3
      FROM pa_ac),
    pa_a6 AS (
      SELECT count(DISTINCT shard_id) AS nshards,
        CAST(coalesce(sum(ck), 0) AS BIGINT) AS chk
      FROM pa_sh),
    pa_a AS (
      SELECT * FROM pa_a0, pa_a1, pa_a2, pa_a3, pa_a4, pa_a5, pa_a6)
    SELECT stage_id, stage, docs_in, docs_kept,
      docs_in - docs_kept AS docs_dropped, tokens_in, tokens_out, detail
    FROM (
      SELECT CAST(0 AS BIGINT) AS stage_id, 'arrive' AS stage,
        d_u AS docs_in, d_u AS docs_kept, t_u AS tokens_in,
        t_u AS tokens_out,
        'planted=' || CAST(np AS VARCHAR) AS detail FROM pa_a
      UNION ALL
      SELECT 1, 'quality', d_u, d1, t_u, t1,
        'r_words=' || CAST(fw AS VARCHAR)
          || ',r_mean_len=' || CAST(fm AS VARCHAR)
          || ',r_symbols=' || CAST(fs AS VARCHAR)
          || ',r_alpha=' || CAST(fa AS VARCHAR)
          || ',r_stopwords=' || CAST(fst AS VARCHAR) FROM pa_a
      UNION ALL
      SELECT 2, 'audio_dedup', d1, d2, t1, t2,
        'clusters=' || CAST(ncl AS VARCHAR)
          || ',members=' || CAST(nmem AS VARCHAR) FROM pa_a
      UNION ALL
      SELECT 3, 'interleave', d2, d2, t2, t3,
        'clips=' || CAST(nclips AS VARCHAR)
          || ',docs_with_audio=' || CAST(ndwa AS VARCHAR)
          || ',audio_tokens=' || CAST(t3 - t2 AS VARCHAR) FROM pa_a
      UNION ALL
      SELECT 4, 'shard', d2, d2, t3, t3,
        'shards=' || CAST(nshards AS VARCHAR)
          || ',check=' || CAST(chk AS VARCHAR) FROM pa_a)
    ORDER BY stage_id"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_e2e_audio" -> (pipelineE2eAudio _))

  val oracles: Map[String, String] = Map(
    "pipeline_e2e_audio" -> pipelineE2eAudioSql)
}
