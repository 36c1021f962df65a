package graft.operators

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The INCREMENTAL audio pipeline — [[PipelineAudio]]'s Level-5 twin,
  * completing the full/incremental/maintained symmetry across the three
  * modalities (text: `pipeline_e2e`/`_incr`/`incr_state`; image:
  * `pipeline_e2e_mm`/`_mm_incr`/`mm_incr_state`; audio: this pair):
  * an arriving clip-bearing batch (documents + their planted byte-copy
  * clips, batch membership keyed on the SOURCE residue so a copy
  * arrives WITH its source) flows quality → audio near-dedup against
  * the base's MERGED fingerprint components → rate-derived interleave
  * accounting → audio-token shard DELTA continuing from the base
  * layout, under the 5-row conservation ledger.
  *
  * Incremental contracts (identical discipline to [[PipelineMmIncr]]):
  * THE EXISTING CORPUS WINS (a batch doc whose merged component holds
  * any base survivor dies — the audio re-crawl family guarantees this
  * path is exercised: doc id%10==9 is batch and plays the clip of
  * id−4, which is base); base components CONTRACT to their min-id
  * labels so per-batch propagation is batch-sized; shard ids continue
  * from the base audio-token total at the base's FIXED shard size;
  * every batch plant dies by stage 2 (in-plan assert).
  *
  * Reference analog: `sql/02-bde_control_functions.sql.in:1576
  * bde_ApplyLevel5Update` and `lib/LINZ/BdeUpload.pm:653
  * GetLevel5Updates`.
  */
object PipelineAudioIncr {

  import TextNorm.{norm, normSql}

  private val PlantShift = Multimodal.PlantShift
  private val PlantMod = Multimodal.PlantMod
  private val IncrMod = PipelineIncr.IncrMod
  private val IncrRes = PipelineIncr.IncrRes

  def pipelineE2eAudioIncr(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(s, "pipeline_e2e_audio_incr", dir)(build(s, dir))

  /** The SAME incremental audio ledger read from MAINTAINED state —
    * base fingerprint components from [[graft.streaming.StreamCluster]]
    * spanning forests (the `stream_audiofp_maintain` path), base
    * accounting totals from the [[graft.streaming.StreamHighWater]]
    * counter fold; value-identical by fold algebra, oracle shared
    * VERBATIM (the hash-identity claim), one parameterized build.
    */
  def pipelineAudioIncrState(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(s, "pipeline_audio_incr_state", dir)(
      build(s, dir, maintained = true))

  private[graft] def build(s: SparkSession, dir: String,
                           maintained: Boolean = false): DataFrame = {
      import s.implicits._
      import graft.streaming.{EdgeObs, HwmPart}
      // ---- universe: corpus + the planted duplicate-clip feed, plants
      // tagged at construction, collision asserted in-plan — ONE shared
      // [[Pipeline.qfPlanted]] build per (session, dir, PlantMod) serves
      // the whole mm/audio family; batch membership keys on the SOURCE
      // residue (doc_id % PlantShift)
      val srcRes = (col("doc_id") % PlantShift) % IncrMod
      val isB = srcRes =!= IncrRes
      val isI = srcRes === IncrRes

      // ---- stage 1 (shared): the Gopher rule gate over the universe
      val qf = Pipeline.qfPlanted(s, dir, PlantMod)
      val s1 = qf.filter(col("keep"))
        .select(col("doc_id"), col("text"), col("n_tokens"), col("planted"))
        .persist()
      val s1b = s1.filter(isB)
      val s1i = s1.filter(isI)
      val idsB = s1b.select(col("doc_id"))
      val idsI = s1i.select(col("doc_id"))
      val ids1 = s1.select(col("doc_id"))

      // ---- the base store: audio dedup over base survivors, then the
      // accounting totals the delta continues from
      val pairs = AudioFp.audioFpPairs(s, dir)
        .select(col("id_a"), col("id_b"))
      val bPairs = pairs
        .join(idsB.withColumnRenamed("doc_id", "id_a"), "id_a")
        .join(idsB.withColumnRenamed("doc_id", "id_b"), "id_b")
        .persist()
      // base components: batch frontier propagation, or the per-shard
      // spanning forests' read-time merge (the stream_audiofp_maintain
      // path)
      val bLab =
        if (!maintained)
          Clustering.ccLabels(
            bPairs.select(col("id_a").as("src"), col("id_b").as("dst"))
              .unionByName(bPairs.select(col("id_b").as("src"),
                col("id_a").as("dst"))))
        else {
          val forest = graft.streaming.StreamCluster.forests(
              bPairs.select(
                pmod(least(col("id_a"), col("id_b")),
                  lit(Clustering.CcShards.toLong)).as("shard"),
                col("id_a").as("a"), col("id_b").as("b")).as[EdgeObs])
            .toDF()
            .select(explode(col("fedges")).as("e"))
            .select(col("e.a").as("a"), col("e.b").as("b"))
          Clustering.clustersFromForest(forest)
        }
      val bLabP =
        (if (!maintained) bLab.select(col("id"), col("lab"))
         else bLab.select(col("doc_id").as("id"), col("cluster").as("lab")))
          .persist()
      val s2b = s1b
        .join(bLabP.select(col("id").as("doc_id"), col("lab")),
          Seq("doc_id"), "left")
        .filter(col("lab").isNull || col("doc_id") === col("lab"))
        .select(col("doc_id"), col("text"))
        .persist()
      val accB = Multimodal.audioAccounting(s, dir, s2b)
      // base accounting totals: batch aggregation, or the high-water
      // counter fold over arrival-chunk partials
      var hwmFrame: Option[DataFrame] = None
      val bTot =
        if (!maintained)
          accB.agg(count(lit(1)).as("base_docs"),
            coalesce(sum(col("n_total_tokens")), lit(0L)).as("base_total"))
        else {
          val hwm = graft.streaming.StreamHighWater.states(
              accB.groupBy(lit("au").as("strat"),
                  pmod(col("doc_id"), lit(3L)).as("ch"))
                .agg(count(lit(1)).as("n_docs"),
                  sum(col("n_total_tokens")).as("n_tokens"))
                .select(col("strat"), col("n_docs"), col("n_tokens"))
                .as[HwmPart])
            .toDF()
            .groupBy(col("strat"))
            .agg(max(col("n_docs")).as("n_docs"),
              max(col("n_tokens")).as("n_tokens"))
            .localCheckpoint(true)
          hwmFrame = Some(hwm)
          hwm.agg(coalesce(sum(col("n_docs")), lit(0L)).as("base_docs"),
            coalesce(sum(col("n_tokens")), lit(0L)).as("base_total"))
        }

      // ---- stage 2: audio near-dedup over MERGED components (base
      // contraction — the PipelineIncr stage-3 shape; the oracle
      // replays the full merged reach, hash-equal)
      val pairsS = pairs
        .join(ids1.withColumnRenamed("doc_id", "id_a"), "id_a")
        .join(ids1.withColumnRenamed("doc_id", "id_b"), "id_b")
      val touched = pairsS
        .join(idsI.select(col("doc_id").as("id_a"), lit(1).as("ia")),
          Seq("id_a"), "left")
        .join(idsI.select(col("doc_id").as("id_b"), lit(1).as("ib")),
          Seq("id_b"), "left")
        .filter(col("ia").isNotNull || col("ib").isNotNull)
      val cPairs = touched
        .join(bLabP.select(col("id").as("id_a"), col("lab").as("la")),
          Seq("id_a"), "left")
        .join(bLabP.select(col("id").as("id_b"), col("lab").as("lb")),
          Seq("id_b"), "left")
        .select(coalesce(col("la"), col("id_a")).as("id_a"),
          coalesce(col("lb"), col("id_b")).as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
        .persist()
      val mLab = Clustering.ccLabels(
        cPairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(cPairs.select(col("id_b").as("src"),
            col("id_a").as("dst"))))
      val mLabP = mLab.select(col("id"), col("lab")).persist()
      val hasBase = mLabP
        .join(idsB.withColumnRenamed("doc_id", "id"), "id")
        .select(col("lab")).distinct()
        .withColumn("has_base", lit(1))
        .persist()
      val i2c = s1i
        .join(mLabP.select(col("id").as("doc_id"), col("lab")),
          Seq("doc_id"), "left")
        .join(hasBase, Seq("lab"), "left")
        .persist()
      val s2i = i2c
        .filter(col("lab").isNull ||
          (col("has_base").isNull && col("doc_id") === col("lab")))
        .select(col("doc_id"), col("text"), col("n_tokens"), col("planted"))
        .persist()

      // ---- stage 3: interleave accounting — audio tokens enter here
      val accI = Multimodal.audioAccounting(s, dir,
          s2i.select(col("doc_id"), col("text")))
        .persist()

      // ---- stage 4: shard DELTA continuing from the base total at the
      // base layout's FIXED shard size
      val en0 = accI
        .withColumn("h", expr("cast(conv(substring(md5(concat(" +
          "cast(doc_id as string), ':mm')), 1, 8), 16, 10) as bigint)"))
        .withColumn("__all", lit(0L))
      val en1 = DistRank.runningSum(en0, "__all",
        Seq(col("h"), col("doc_id")), "doc_id", col("n_total_tokens"),
        "cs")
      // en has exactly one consumer (the a4 aggregate) — no persist
      val en = en1.crossJoin(broadcast(bTot))
        .withColumn("ssize", greatest(lit(1L),
          expr(s"(base_total + ${TrainPrep.OutShards - 1})" +
            s" div ${TrainPrep.OutShards}")))
        .withColumn("shard_id",
          expr("(base_total + cs - n_total_tokens) div ssize"))

      // ---- the ledger: 5 rows of scalar aggregates. The three arriving-
      // batch aggregates (totals + rule failures + stage-1 survivors)
      // FUSE into one pass over the batch slice of qf.
      def st(c: org.apache.spark.sql.Column) = c.cast("string")
      val a0 = qf.filter(isI).agg(count(lit(1)).as("d_i0"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("t_i0"),
        coalesce(sum(col("planted")), lit(0L)).as("np"),
        sum(when(!col("r_words"), 1L).otherwise(0L)).as("fw"),
        sum(when(!col("r_mean_len"), 1L).otherwise(0L)).as("fm"),
        sum(when(!col("r_symbols"), 1L).otherwise(0L)).as("fs"),
        sum(when(!col("r_alpha"), 1L).otherwise(0L)).as("fa"),
        sum(when(!col("r_stopwords"), 1L).otherwise(0L)).as("fst"),
        coalesce(sum(when(col("keep"), 1L).otherwise(0L)), lit(0L))
          .as("d1"),
        coalesce(sum(when(col("keep"), col("n_tokens"))), lit(0L))
          .as("t1"))
      val aC = i2c.agg(
        coalesce(sum(when(col("has_base").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("vs_base"),
        countDistinct(when(col("lab").isNotNull && col("has_base").isNull,
          col("lab"))).as("clusters_new"))
      val a2 = s2i.agg(count(lit(1)).as("d2"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("t2"))
      val a3 = accI.agg(
        coalesce(sum(col("n_clips")), lit(0L)).as("nclips"),
        sum(when(col("n_clips") > 0, 1L).otherwise(0L)).as("ndwa"),
        coalesce(sum(col("n_total_tokens")), lit(0L)).as("t3"))
      val a4 = en.agg(countDistinct(col("shard_id")).as("nshards"),
        coalesce(sum(expr("cast(conv(substring(md5(concat(" +
          "cast(doc_id as string), ':ck')), 1, 8), 16, 10) as bigint)")),
          lit(0L)).as("chk"))

      // the plant self-check, FAIL-LOUDLY in-plan: every batch plant
      // dies by stage 2 (with its source at quality, to its source or
      // to the base at audio dedup)
      val plantDead = s2i.agg(coalesce(
        assert_true(
          coalesce(sum(col("planted")), lit(0L)) === 0L,
          lit("pipeline_e2e_audio_incr: a planted duplicate survived " +
            "audio dedup — the arrival/dedup stage contract broke"))
          .cast("long"),
        lit(0L)).as("__pd"))

      val scalars = a0.crossJoin(aC)
        .crossJoin(a2).crossJoin(a3).crossJoin(a4)
        .crossJoin(broadcast(bTot))
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

      val ledger = row(0, "arrive", col("d_i0"), col("d_i0"), col("t_i0"),
          col("t_i0"),
          concat(lit("planted="), st(col("np")), lit(",base_docs="),
            st(col("base_docs")), lit(",base_tokens="),
            st(col("base_total"))))
        .unionByName(row(1, "quality", col("d_i0"), col("d1"),
          col("t_i0"), col("t1"),
          concat(lit("r_words="), st(col("fw")), lit(",r_mean_len="),
            st(col("fm")), lit(",r_symbols="), st(col("fs")),
            lit(",r_alpha="), st(col("fa")), lit(",r_stopwords="),
            st(col("fst")))))
        .unionByName(row(2, "audio_dedup", col("d1"), col("d2"),
          col("t1"), col("t2"),
          concat(lit("vs_base="), st(col("vs_base")),
            lit(",clusters_new="), st(col("clusters_new")))))
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
      Seq(s1, bPairs, bLabP, s2b, cPairs, mLabP, hasBase, i2c, s2i,
        accI).foreach(_.unpersist(false))
      bLab.unpersist(false)
      mLab.unpersist(false)
      hwmFrame.foreach(_.unpersist(false))
      ledger
    }

  val pipelineE2eAudioIncrSql: String = {
    val shards = TrainPrep.OutShards
    s"""
    WITH RECURSIVE ${AudioFp.audioFpCtesSql},
    pb_u AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      SELECT doc_id + $PlantShift, lang, text FROM documents
      WHERE doc_id % $PlantMod = 0),
    ${Pipeline.gopherCtes("pb_u", "pb_")},
    pb_s1 AS MATERIALIZED (
      SELECT doc_id, text, n_tokens FROM pb_qf
      WHERE r_words AND r_mean_len AND r_symbols AND r_alpha
        AND r_stopwords),
    pb_b1 AS MATERIALIZED (SELECT * FROM pb_s1
      WHERE (doc_id % $PlantShift) % $IncrMod <> $IncrRes),
    pb_i1 AS MATERIALIZED (SELECT * FROM pb_s1
      WHERE (doc_id % $PlantShift) % $IncrMod = $IncrRes),
    pb_bedges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM afcand
        JOIN pb_b1 a ON id_a = a.doc_id JOIN pb_b1 b ON id_b = b.doc_id
      WHERE hamming <= ${AudioFp.AudioFpMaxHamming}
      UNION
      SELECT id_b, id_a FROM afcand
        JOIN pb_b1 a ON id_a = a.doc_id JOIN pb_b1 b ON id_b = b.doc_id
      WHERE hamming <= ${AudioFp.AudioFpMaxHamming}),
    pb_breach(id, lab) AS (
      SELECT src, src FROM pb_bedges
      UNION
      SELECT e.src, r.lab FROM pb_bedges e JOIN pb_breach r
        ON r.id = e.dst),
    pb_bcomp AS MATERIALIZED (
      SELECT id AS doc_id, min(lab) AS lab FROM pb_breach GROUP BY id),
    pb_b2 AS MATERIALIZED (
      SELECT p.doc_id, p.text
      FROM pb_b1 p LEFT JOIN pb_bcomp c USING (doc_id)
      WHERE c.lab IS NULL OR p.doc_id = c.lab),
    pb_bac AS MATERIALIZED (${PipelineAudio.audioAccSql("pb_b2")}),
    pb_btot AS MATERIALIZED (
      SELECT count(*) AS base_docs,
        CAST(coalesce(sum(n_total_tokens), 0) AS BIGINT) AS base_total
      FROM pb_bac),
    pb_medges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM afcand
        JOIN pb_s1 a ON id_a = a.doc_id JOIN pb_s1 b ON id_b = b.doc_id
      WHERE hamming <= ${AudioFp.AudioFpMaxHamming}
      UNION
      SELECT id_b, id_a FROM afcand
        JOIN pb_s1 a ON id_a = a.doc_id JOIN pb_s1 b ON id_b = b.doc_id
      WHERE hamming <= ${AudioFp.AudioFpMaxHamming}),
    pb_mreach(id, lab) AS (
      SELECT src, src FROM pb_medges
      UNION
      SELECT e.src, r.lab FROM pb_medges e JOIN pb_mreach r
        ON r.id = e.dst),
    pb_mcomp AS MATERIALIZED (
      SELECT id AS doc_id, min(lab) AS lab FROM pb_mreach GROUP BY id),
    pb_hasb AS MATERIALIZED (
      SELECT DISTINCT m.lab FROM pb_mcomp m
      JOIN pb_b1 b ON m.doc_id = b.doc_id),
    pb_i2 AS MATERIALIZED (
      SELECT i.doc_id, i.text, i.n_tokens
      FROM pb_i1 i LEFT JOIN pb_mcomp m ON i.doc_id = m.doc_id
      WHERE m.lab IS NULL
        OR (m.lab NOT IN (SELECT lab FROM pb_hasb)
            AND i.doc_id = m.lab)),
    pb_iac AS MATERIALIZED (${PipelineAudio.audioAccSql("pb_i2")}),
    pb_isz AS (
      SELECT greatest(1, CAST((base_total + ${shards - 1})
        // $shards AS BIGINT)) AS ssize
      FROM pb_btot),
    pb_ish AS MATERIALIZED (
      SELECT doc_id,
        CAST((base_total + cs - n_total_tokens) // ssize AS BIGINT)
          AS shard_id,
        ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':ck'),
          1, 8))::BIGINT AS ck
      FROM (SELECT doc_id, n_total_tokens,
              CAST(sum(n_total_tokens) OVER (ORDER BY h, doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
            FROM (SELECT *, ('0x' || substring(
                md5(CAST(doc_id AS VARCHAR) || ':mm'), 1, 8))::BIGINT AS h
              FROM pb_iac)), pb_isz, pb_btot),
    pb_a0 AS (
      SELECT count(*) AS d_i0,
        CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t_i0,
        (SELECT count(*) FROM documents WHERE doc_id % $PlantMod = 0
           AND (doc_id % $PlantShift) % $IncrMod = $IncrRes) AS np
      FROM pb_tok
      WHERE (doc_id % $PlantShift) % $IncrMod = $IncrRes),
    pb_a1 AS (
      SELECT count(*) FILTER (WHERE NOT r_words) AS fw,
        count(*) FILTER (WHERE NOT r_mean_len) AS fm,
        count(*) FILTER (WHERE NOT r_symbols) AS fs,
        count(*) FILTER (WHERE NOT r_alpha) AS fa,
        count(*) FILTER (WHERE NOT r_stopwords) AS fst
      FROM pb_qf WHERE (doc_id % $PlantShift) % $IncrMod = $IncrRes),
    pb_a2 AS (
      SELECT count(*) AS d1,
        CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t1 FROM pb_i1),
    pb_a3 AS (
      SELECT count(*) FILTER (WHERE m.lab IN (SELECT lab FROM pb_hasb))
          AS vs_base,
        count(DISTINCT CASE WHEN m.lab IS NOT NULL
          AND m.lab NOT IN (SELECT lab FROM pb_hasb)
          THEN m.lab END) AS clusters_new
      FROM pb_i1 i LEFT JOIN pb_mcomp m ON i.doc_id = m.doc_id),
    pb_a4 AS (
      SELECT count(*) AS d2,
        CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t2 FROM pb_i2),
    pb_a5 AS (
      SELECT CAST(coalesce(sum(n_clips), 0) AS BIGINT) AS nclips,
        count(*) FILTER (WHERE n_clips > 0) AS ndwa,
        CAST(coalesce(sum(n_total_tokens), 0) AS BIGINT) AS t3
      FROM pb_iac),
    pb_a6 AS (
      SELECT count(DISTINCT shard_id) AS nshards,
        CAST(coalesce(sum(ck), 0) AS BIGINT) AS chk
      FROM pb_ish),
    pb_a AS (
      SELECT * FROM pb_a0, pb_a1, pb_a2, pb_a3, pb_a4, pb_a5, pb_a6,
        pb_btot)
    SELECT stage_id, stage, docs_in, docs_kept,
      docs_in - docs_kept AS docs_dropped, tokens_in, tokens_out, detail
    FROM (
      SELECT CAST(0 AS BIGINT) AS stage_id, 'arrive' AS stage,
        d_i0 AS docs_in, d_i0 AS docs_kept, t_i0 AS tokens_in,
        t_i0 AS tokens_out,
        'planted=' || CAST(np AS VARCHAR)
          || ',base_docs=' || CAST(base_docs AS VARCHAR)
          || ',base_tokens=' || CAST(base_total AS VARCHAR) AS detail
        FROM pb_a
      UNION ALL
      SELECT 1, 'quality', d_i0, d1, t_i0, t1,
        'r_words=' || CAST(fw AS VARCHAR)
          || ',r_mean_len=' || CAST(fm AS VARCHAR)
          || ',r_symbols=' || CAST(fs AS VARCHAR)
          || ',r_alpha=' || CAST(fa AS VARCHAR)
          || ',r_stopwords=' || CAST(fst AS VARCHAR) FROM pb_a
      UNION ALL
      SELECT 2, 'audio_dedup', d1, d2, t1, t2,
        'vs_base=' || CAST(vs_base AS VARCHAR)
          || ',clusters_new=' || CAST(clusters_new AS VARCHAR) FROM pb_a
      UNION ALL
      SELECT 3, 'interleave', d2, d2, t2, t3,
        'clips=' || CAST(nclips AS VARCHAR)
          || ',docs_with_audio=' || CAST(ndwa AS VARCHAR)
          || ',audio_tokens=' || CAST(t3 - t2 AS VARCHAR) FROM pb_a
      UNION ALL
      SELECT 4, 'shard', d2, d2, t3, t3,
        'shards=' || CAST(nshards AS VARCHAR)
          || ',check=' || CAST(chk AS VARCHAR) FROM pb_a) z
    ORDER BY stage_id"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_e2e_audio_incr" -> (pipelineE2eAudioIncr _),
    "pipeline_audio_incr_state" -> (pipelineAudioIncrState _))

  // pipeline_audio_incr_state shares the oracle VERBATIM — the
  // maintained-state read is value-identical by fold algebra; the
  // shared SQL is the hash-identity claim
  val oracles: Map[String, String] = Map(
    "pipeline_e2e_audio_incr" -> pipelineE2eAudioIncrSql,
    "pipeline_audio_incr_state" -> pipelineE2eAudioIncrSql)
}
