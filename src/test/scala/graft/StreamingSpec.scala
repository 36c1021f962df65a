package graft

import graft.streaming.{ChangeRecord, ChangesetStream, IntervalJoin, StreamTopK, WindowCounts}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {

  test("changeset stream: state evolves across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeRecord]
    val query = ChangesetStream.latestState(input.toDS())
      .writeStream.format("memory").queryName("chg_state")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: two inserts
      input.addData(ChangeRecord(1, "I", 10.0, 1), ChangeRecord(2, "I", 20.0, 1))
      query.processAllAvailable()
      val b1 = spark.table("chg_state").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(b1 == Map(1L -> 10.0, 2L -> 20.0))
      // batch 2: update key 1, delete key 2 — state must carry over
      input.addData(ChangeRecord(1, "U", 11.0, 2), ChangeRecord(2, "D", 0.0, 2))
      query.processAllAvailable()
      val rows = spark.table("chg_state").collect()
      val k1 = rows.filter(_.getLong(0) == 1L).maxBy(_.getAs[Long]("last_seq"))
      assert(k1.getDouble(1) == 11.0 && k1.getAs[Int]("n_changes") == 2)
      // batch 3: re-insert deleted key with fresh state
      input.addData(ChangeRecord(2, "I", 25.0, 3))
      query.processAllAvailable()
      val k2 = spark.table("chg_state").collect()
        .filter(_.getLong(0) == 2L).maxBy(_.getAs[Long]("last_seq"))
      assert(k2.getDouble(1) == 25.0)
    } finally query.stop()
  }

  test("changeset stream: replayed and late records are idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeRecord]
    val query = ChangesetStream.latestState(input.toDS())
      .writeStream.format("memory").queryName("chg_replay")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(ChangeRecord(1, "I", 10.0, 1), ChangeRecord(1, "U", 11.0, 2))
      query.processAllAvailable()
      // an at-least-once source re-delivers seq 1 and 2 in a later batch:
      // stale changes must not re-apply (payload stays 11.0, n_changes 2)
      input.addData(ChangeRecord(1, "I", 10.0, 1), ChangeRecord(1, "U", 11.0, 2))
      query.processAllAvailable()
      val k1 = spark.table("chg_replay").collect()
        .filter(_.getLong(0) == 1L).maxBy(_.getAs[Long]("last_seq"))
      assert(k1.getDouble(1) == 11.0 && k1.getAs[Int]("n_changes") == 2)
      // a genuinely new change still applies
      input.addData(ChangeRecord(1, "U", 12.0, 3))
      query.processAllAvailable()
      val k1b = spark.table("chg_replay").collect()
        .filter(_.getLong(0) == 1L).maxBy(_.getAs[Long]("last_seq"))
      assert(k1b.getDouble(1) == 12.0 && k1b.getAs[Int]("n_changes") == 3)
    } finally query.stop()
  }

  test("CDC-maintained aggregate tracks the live state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeRecord]
    // the maintained view: per-bucket count of live keys from latest state
    val query = ChangesetStream.latestState(input.toDS())
      .writeStream.format("memory").queryName("agg_state")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(ChangeRecord(1, "I", 10.0, 1), ChangeRecord(11, "I", 5.0, 1),
        ChangeRecord(2, "I", 7.0, 1))
      query.processAllAvailable()
      input.addData(ChangeRecord(2, "D", 0.0, 2), ChangeRecord(11, "U", 6.0, 2))
      query.processAllAvailable()
      // fold the update-mode log to latest-per-key, then bucket like the gate
      val live = spark.table("agg_state").collect()
        .groupBy(_.getLong(0)).map { case (_, g) =>
          g.maxBy(_.getAs[Long]("last_seq")) }
        .toSeq
      val byBucket = live.groupBy(r => r.getLong(0) % 10)
        .map { case (b, g) => b -> g.map(_.getDouble(1)).sum }
      assert(byBucket(1L) == 16.0) // keys 1 and 11: 10.0 + updated 6.0
      // the delete emits no update (state removed): key 2's last sink entry
      // stays at seq 1 — a downstream view learns of the delete from the
      // batch reconciliation path, which the gate query checks
      assert(live.filter(_.getLong(0) == 2L).forall(_.getAs[Long]("last_seq") == 1L))
    } finally query.stop()
  }

  test("CDC stream materializes one versioned revision per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.CdcToVersioned
    import graft.operators.Versioned
    val path = s"${sys.props("java.io.tmpdir")}/graft-cdc-store"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val in = MemoryStream[ChangeRecord]
    val q = CdcToVersioned.run(in.toDS().toDF(), path)
    try {
      in.addData(ChangeRecord(1, "I", 10.0, 1), ChangeRecord(2, "I", 20.0, 2))
      q.processAllAvailable()
      in.addData(ChangeRecord(1, "U", 11.0, 3), ChangeRecord(3, "I", 30.0, 4))
      q.processAllAvailable()
      in.addData(ChangeRecord(2, "D", 0.0, 5))
      q.processAllAvailable()
      val store = graft.sources.ManifestStore.resolve(spark, path)
      def snap(r: Int): Map[Long, Double] =
        Versioned.atRevision(store, r).collect()
          .map(x => x.getAs[Long]("key") -> x.getAs[Double]("payload")).toMap
      assert(snap(1) == Map(1L -> 10.0, 2L -> 20.0))
      assert(snap(2) == Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0))
      assert(snap(3) == Map(1L -> 11.0, 3L -> 30.0))
      // the store is exactly what a from-scratch SCD2 build would produce
      val rebuilt = Versioned.build(Seq(
        1 -> Seq((1L, 10.0), (2L, 20.0)).toDF("key", "payload"),
        2 -> Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)).toDF("key", "payload"),
        3 -> Seq((1L, 11.0), (3L, 30.0)).toDF("key", "payload")), "key")
      assert(store.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(store).isEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(java.sql.Timestamp, Long)]
    val pIn = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val q = IntervalJoin.attribute(
        vIn.toDS().toDF("tss", "user_id"),
        pIn.toDS().toDF("tss", "user_id", "value"))
      .select(col("v.user_id").as("user_id"), col("p.value").as("value"))
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      vIn.addData((ts(0), 1L), (ts(5), 2L))
      q.processAllAvailable()
      // purchases arrive in LATER micro-batches — the view state must
      // persist in the store for the range condition to match
      pIn.addData((ts(30), 1L, 10.0))
      q.processAllAvailable()
      pIn.addData((ts(50), 2L, 5.0), (ts(59), 1L, 2.0))
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
      assert(rows.count(_.getLong(0) == 1L) == 2) // purchases at :30 and :59
      assert(rows.count(_.getLong(0) == 2L) == 1) // purchase at :50
      assert(rows.map(_.getDouble(1)).sum == 17.0)
    } finally q.stop()
  }

  test("stream dedup drops re-delivered ids across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val events = input.toDF().toDF("ts", "event_id", "payload")
    val query = graft.streaming.StreamDedup.dedupe(events, Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "a"),
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 1L, "a-dup"),
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:02"), 2L, "b"))
      query.processAllAvailable()
      // re-delivery in a later batch, inside the watermark
      input.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:03"), 1L, "a-redelivered"),
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:04"), 3L, "c"))
      query.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getLong(1)).sorted
      assert(ids.sameElements(Array(1L, 2L, 3L)), s"got ${ids.toSeq}")
    } finally query.stop()
  }

  test("sessionizer carries open sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{SessionEvent, StreamSessionize}
    def ev(u: Long, t: String, v: Double) =
      SessionEvent(u, java.sql.Timestamp.valueOf(t), v)
    val input = MemoryStream[SessionEvent]
    val query = StreamSessionize.sessions(input.toDS())
      .writeStream.format("memory").queryName("sess_state")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(ev(1, "2024-01-01 10:00:00", 1.0),
        ev(1, "2024-01-01 10:10:00", 2.0))
      query.processAllAvailable()
      // batch 2: within the gap → same session continues; then a >30min
      // gap opens session 2
      input.addData(ev(1, "2024-01-01 10:20:00", 3.0),
        ev(1, "2024-01-01 12:00:00", 10.0))
      query.processAllAvailable()
      val rows = spark.table("sess_state").collect()
        .groupBy(_.getAs[Long]("session_id"))
        .map { case (sid, g) => // Update mode re-emits; keep the final shape
          sid -> g.maxBy(_.getAs[Long]("n_events"))
        }
      assert(rows(1L).getAs[Long]("n_events") == 3)
      assert(rows(1L).getAs[Double]("sum_value") == 6.0)
      assert(rows(2L).getAs[Long]("n_events") == 1)
      assert(rows(2L).getAs[Double]("sum_value") == 10.0)
    } finally query.stop()
  }

  test("windowed counts run streaming with watermark and match batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val query = WindowCounts.streamingCounts(events)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "a", 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 10:55:00"), "a", 2.0),
        (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "b", 3.0))
      query.processAllAvailable()
      val rows = spark.table("win_counts").collect()
      val hourA = rows.filter(r => r.getString(2) == "a")
      assert(hourA.map(_.getAs[Long]("n")).sum == 2)
      assert(rows.forall(r =>
        r.getAs[java.sql.Timestamp]("win_end").getTime -
          r.getAs[java.sql.Timestamp]("win_start").getTime == 3600000L))
    } finally query.stop()
  }

  test("watermark drops events arriving beyond the lateness bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val query = WindowCounts.streamingCounts(events)
      .writeStream.format("memory").queryName("late_drop")
      .outputMode(OutputMode.Update).start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData((ts("2024-01-01 10:05:00"), "a", 1.0),
        (ts("2024-01-01 20:00:00"), "b", 1.0))
      // after this batch the 2h watermark sits at 18:00
      query.processAllAvailable()
      input.addData(
        (ts("2024-01-01 10:10:00"), "a", 5.0), // beyond the bound → dropped
        (ts("2024-01-01 20:05:00"), "b", 1.0)) // on time → counted
      query.processAllAvailable()
      val perWin = spark.table("late_drop")
        .groupBy("win_start", "event_type")
        .agg(max("n").as("n"), max("sum_value").as("sv"))
        .collect()
        .map(r => (r.getAs[java.sql.Timestamp]("win_start").toString,
          r.getString(1)) -> ((r.getAs[Long]("n"), r.getAs[Double]("sv"))))
        .toMap
      // the hour-10 window never saw the late event: count and sum frozen
      assert(perWin(("2024-01-01 10:00:00.0", "a")) == ((1L, 1.0)),
        "late event must be dropped, not aggregated")
      assert(perWin(("2024-01-01 20:00:00.0", "b"))._1 == 2L,
        "on-time events keep flowing")
    } finally query.stop()
  }

  test("HLL registers evolve by max across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{HllObs, StreamHll}
    val input = MemoryStream[HllObs]
    val query = StreamHll.registers(input.toDS())
      .writeStream.format("memory").queryName("hll_state")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(HllObs(0, 3), HllObs(0, 7), HllObs(5, 2))
      query.processAllAvailable()
      def regs(): Map[Long, Long] = spark.table("hll_state").collect()
        .groupBy(_.getAs[Long]("bucket"))
        .map { case (b, g) => b -> g.map(_.getAs[Long]("maxrank")).max }
      assert(regs() == Map(0L -> 7L, 5L -> 2L))
      // batch 2: a lower rank for bucket 0 must NOT regress the register
      // (idempotent max — replays and out-of-order arrivals are safe);
      // bucket 5 advances; bucket 9 appears
      input.addData(HllObs(0, 4), HllObs(5, 11), HllObs(9, 1))
      query.processAllAvailable()
      assert(regs() == Map(0L -> 7L, 5L -> 11L, 9L -> 1L))
      // exact replay of batch 2 changes nothing
      input.addData(HllObs(0, 4), HllObs(5, 11), HllObs(9, 1))
      query.processAllAvailable()
      assert(regs() == Map(0L -> 7L, 5L -> 11L, 9L -> 1L))
    } finally query.stop()
  }

  test("KMV minima evolve by take-k-smallest across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{KmvObs, StreamKmv}
    val input = MemoryStream[KmvObs]
    val query = StreamKmv.minima(input.toDS(), k = 3)
      .writeStream.format("memory").queryName("kmv_state")
      .outputMode(OutputMode.Update).start()
    try {
      def mins(): Map[String, Seq[Double]] = {
        // Update mode appends a row per (group, batch): latest batch wins
        val rows = spark.table("kmv_state").collect()
        rows.zipWithIndex.groupBy(_._1.getAs[String]("lang"))
          .map { case (l, g) =>
            // getSeq, not getAs[Seq[...]]: Spark hands back a
            // mutable.ArraySeq and the erased cast to immutable Seq blows
            // up only in some runtimes — getSeq + toSeq is always sound
            val r = g.maxBy(_._2)._1
            l -> r.getSeq[Double](r.fieldIndex("minima")).toSeq }
      }
      input.addData(KmvObs("en", 0.5), KmvObs("en", 0.2), KmvObs("de", 0.9))
      query.processAllAvailable()
      assert(mins() == Map("en" -> Seq(0.2, 0.5), "de" -> Seq(0.9)))
      // batch 2: 0.1 enters, 0.5 is evicted at k=3 (0.3 also enters);
      // a replayed 0.2 is idempotent
      input.addData(KmvObs("en", 0.1), KmvObs("en", 0.3), KmvObs("en", 0.2))
      query.processAllAvailable()
      assert(mins() == Map("en" -> Seq(0.1, 0.2, 0.3), "de" -> Seq(0.9)))
      // exact replay of batch 2 changes nothing
      input.addData(KmvObs("en", 0.1), KmvObs("en", 0.3), KmvObs("en", 0.2))
      query.processAllAvailable()
      assert(mins() == Map("en" -> Seq(0.1, 0.2, 0.3), "de" -> Seq(0.9)))
    } finally query.stop()
  }

  test("streaming KMV batch gate equals the one-shot grouped sketch") {
    val streamed = graft.streaming.StreamScenarios
      .streamKmvMaintain(spark, sf).collect()
    val batch = graft.operators.Sketch.kmvByGroup(spark, sf).collect()
    assert(streamed.map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .toSeq ==
      batch.map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq)
  }

  test("quantile summaries compact across micro-batches within the bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{QuantObs, StreamQuantile}
    val input = MemoryStream[QuantObs]
    val query = StreamQuantile.summaries(input.toDS(), samples = 4)
      .writeStream.format("memory").queryName("quant_state")
      .outputMode(OutputMode.Update).start()
    try {
      def latest(): Map[Long, (Seq[(Long, Long)], Long)] = {
        val rows = spark.table("quant_state").collect()
        rows.zipWithIndex.groupBy(_._1.getAs[Long]("shard"))
          .map { case (sh, g) =>
            val r = g.maxBy(_._2)._1
            sh -> (r.getSeq[Row](r.fieldIndex("points")).toSeq
                .map(p => (p.getAs[Long]("v"), p.getAs[Long]("w"))),
              r.getAs[Long]("stride_sum"))
          }
      }
      // batch 1: 4 points fit uncompacted (S = 4), weights exact
      input.addData((1 to 4).map(i => QuantObs(0, i * 10L, f"k$i%03d")): _*)
      query.processAllAvailable()
      val (p1, b1) = latest()(0L)
      assert(p1 == (1 to 4).map(i => (i * 10L, 1L)) && b1 == 0L)
      // batch 2: 6 more rows force a compaction of n=10 at stride
      // ceil(10/4)=3: kept cumulative-weight crossings + max, weight
      // conserved exactly, bound advances by the stride
      input.addData((5 to 10).map(i => QuantObs(0, i * 10L, f"k$i%03d")): _*)
      query.processAllAvailable()
      val (p2, b2) = latest()(0L)
      assert(p2.map(_._2).sum == 10L, "total weight conserved")
      assert(p2.size <= 5 && b2 == 3L)
      assert(p2.map(_._1) == p2.map(_._1).sorted, "points stay ordered")
      // every pick's true rank is within stride_sum of its cumulative weight
      val exact = (1 to 10).map(_ * 10L)
      p2.foldLeft(0L) { case (cw, (v, w)) =>
        val rank = exact.count(_ <= v)
        assert(math.abs(rank - (cw + w)) <= b2,
          s"pick $v: rank $rank vs cw ${cw + w} beyond bound $b2")
        cw + w
      }
    } finally query.stop()
  }

  test("gram registry evolves across micro-batches, replay-idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{GramObs, StreamGrams}
    val input = MemoryStream[GramObs]
    val query = StreamGrams.states(input.toDS())
      .writeStream.format("memory").queryName("gram_state")
      .outputMode(OutputMode.Update).start()
    try {
      def latest(): Map[String, (Long, Long, Long)] = {
        val rows = spark.table("gram_state").collect()
        rows.zipWithIndex.groupBy(_._1.getAs[String]("g"))
          .map { case (g, grp) =>
            val r = grp.maxBy(_._2)._1
            g -> (r.getAs[Long]("min_okey"), r.getAs[Long]("doc_lo"),
              r.getAs[Long]("doc_hi"))
          }
      }
      // batch 1: gram only in doc 7 — not yet cross-doc
      input.addData(GramObs("g1", 7L, 3), GramObs("g1", 7L, 9))
      query.processAllAvailable()
      assert(latest()("g1") == ((7000003L, 7L, 7L)))
      // batch 2: doc 2 arrives with an EARLIER key — becomes cross-doc
      // and takes over first occurrence
      input.addData(GramObs("g1", 2L, 5))
      query.processAllAvailable()
      assert(latest()("g1") == ((2000005L, 2L, 7L)))
      // exact replay of batch 2 changes nothing (min/max idempotent)
      input.addData(GramObs("g1", 2L, 5))
      query.processAllAvailable()
      assert(latest()("g1") == ((2000005L, 2L, 7L)))
    } finally query.stop()
  }

  test("streaming substring batch gate equals the one-shot strip") {
    val streamed = graft.streaming.StreamScenarios
      .streamSubstringMaintain(spark, sf).collect()
    val batch = graft.operators.SubstringDedup
      .dedupSubstringStrip(spark, sf).collect()
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("streaming quantile batch gate equals the one-shot sketch") {
    val streamed = graft.streaming.StreamScenarios
      .streamQuantileMaintain(spark, sf).collect()
    val batch = graft.operators.Quantile.qQuantilesSketch(spark, sf).collect()
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("Bloom mask words evolve by OR across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{BloomObs, StreamBloom}
    val input = MemoryStream[BloomObs]
    val query = StreamBloom.mask(input.toDS())
      .writeStream.format("memory").queryName("bloom_state")
      .outputMode(OutputMode.Update).start()
    try {
      def words(): Map[Long, Long] = spark.table("bloom_state").collect()
        .groupBy(_.getAs[Long]("w"))
        .map { case (w, g) => w -> g.map(_.getAs[Long]("mask"))
          .reduce(_ | _) }
      input.addData(BloomObs(0, 1L), BloomObs(0, 4L), BloomObs(7, 2L))
      query.processAllAvailable()
      assert(words() == Map(0L -> 5L, 7L -> 2L))
      // replayed and new bits: OR is idempotent, word 7 gains a bit
      input.addData(BloomObs(0, 4L), BloomObs(7, 8L))
      query.processAllAvailable()
      assert(words() == Map(0L -> 5L, 7L -> 10L))
    } finally query.stop()
  }

  test("streaming Bloom batch gate equals the direct word table") {
    val streamed = graft.streaming.StreamScenarios
      .streamBloomMaintain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val direct = graft.operators.JoinShapes.bloomObs(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("w"))
      .agg(org.apache.spark.sql.functions.expr("bit_or(m)").as("mask"))
      .orderBy("w").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed == direct)
  }

  test("streaming HLL batch gate equals the one-shot register sketch") {
    // the same stateful function, run over the bounded observation frame,
    // must reproduce hll_registers exactly (what the DuckDB gate checks)
    val streamed = graft.streaming.StreamScenarios
      .streamHllMaintain(spark, sf).collect()
    val batch = graft.operators.Sketch.hllRegisters(spark, sf).collect()
    assert(streamed.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      batch.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("stream top-k: counting layer streams, rank layer matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    val query = StreamTopK.streamingCounts(events)
      .writeStream.format("memory").queryName("topk_counts")
      .outputMode(OutputMode.Update).start()
    try {
      def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      // hour 10: a×3, b×2, c×1, d×1 → top-3 is a, b, then c (tie c<d)
      input.addData((t(1), "a"), (t(2), "a"), (t(10), "b"))
      query.processAllAvailable()
      input.addData((t(20), "a"), (t(21), "b"), (t(30), "c"), (t(31), "d"))
      query.processAllAvailable()
      // update mode re-emits refined counts; latest row per key wins
      val counts = spark.table("topk_counts")
        .groupBy("win_start", "event_type").agg(max("n").as("n"))
      val ranked = StreamTopK.topk(counts).collect()
        .sortBy(_.getAs[Int]("rank"))
      assert(ranked.map(r =>
        (r.getAs[Int]("rank"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"))).toSeq ==
        Seq((1, "a", 3L), (2, "b", 2L), (3, "c", 1L)))
    } finally query.stop()
  }

  test("streaming profile: per-batch partials fold across batches, " +
    "replay leaves extremes unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{ProfPart, StreamProfile}
    val input = MemoryStream[ProfPart]
    val query = StreamProfile.states(input.toDS())
      .writeStream.format("memory").queryName("prof_state")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: the micro-batch pre-aggregate of two price cells + one
      // flag cell
      input.addData(
        ProfPart(0, "price", "dec", 2, Some(1.25), Some(3.5),
          Some("1.25"), Some("3.50")),
        ProfPart(0, "flag", "str", 1, None, None, Some("N"), Some("N")))
      query.processAllAvailable()
      // batch 2: counts add, extremes fold; an all-null batch partial
      // (n = 0, no extremes) folds as a no-op
      input.addData(
        ProfPart(0, "price", "dec", 1, Some(9.0), Some(9.0),
          Some("9.00"), Some("9.00")),
        ProfPart(0, "flag", "str", 1, None, None, Some("A"), Some("A")),
        ProfPart(0, "flag", "str", 0, None, None, None, None))
      query.processAllAvailable()
      val rows = spark.table("prof_state").collect()
      def last(c: String) = rows.filter(_.getAs[String]("cname") == c)
        .maxBy(_.getAs[Long]("n_nonnull"))
      val price = last("price")
      assert(price.getAs[Long]("n_nonnull") == 3L)
      assert(price.getAs[Double]("min_num") == 1.25)
      assert(price.getAs[Double]("max_num") == 9.0)
      val flag = last("flag")
      assert(flag.getAs[Long]("n_nonnull") == 2L)
      assert(flag.getAs[String]("min_str") == "A")
      assert(flag.getAs[String]("max_str") == "N")
      // replaying an already-seen extreme changes no min/max
      input.addData(ProfPart(0, "price", "dec", 1, Some(9.0), Some(9.0),
        Some("9.00"), Some("9.00")))
      query.processAllAvailable()
      val p2 = spark.table("prof_state").collect()
        .filter(_.getAs[String]("cname") == "price")
        .maxBy(_.getAs[Long]("n_nonnull"))
      assert(p2.getAs[Double]("min_num") == 1.25 &&
        p2.getAs[Double]("max_num") == 9.0)
    } finally query.stop()
  }

  test("streaming as-of: carry evolves across batches, no look-ahead") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{AsofObs, StreamAsof}
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val input = MemoryStream[AsofObs]
    val query = StreamAsof.joined(input.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: left before any right -> null; right(10)@t3; left@t4 -> 10
      input.addData(
        AsofObs(7, ts(1), 1, Some(100), None),
        AsofObs(7, ts(3), 0, None, Some(10L)),
        AsofObs(7, ts(4), 1, Some(101), None))
      query.processAllAvailable()
      // batch 2: carry persists; newer right supersedes within its batch;
      // a left at the right's own time sees it (inclusive semantics)
      input.addData(
        AsofObs(7, ts(5), 1, Some(102), None),
        AsofObs(7, ts(6), 0, None, Some(20L)),
        AsofObs(7, ts(6), 1, Some(103), None))
      query.processAllAvailable()
      val got = spark.table("asof_out").collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[Any]("asof_orderkey"))).toMap
      assert(got(100L).isEmpty, "left before any right must get null")
      assert(got(101L).contains(10L))
      assert(got(102L).contains(10L), "carry must survive the batch gap")
      assert(got(103L).contains(20L), "right sorts before left at equal t")
    } finally query.stop()
  }

  test("streaming as-of in batch mode equals the batch as-of gate") {
    val a = streaming.StreamScenarios.streamAsofMaintain(spark, sf).collect()
    val b = operators.AsOf.asofJoinQuery(spark, sf).collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[Long]("event_id") == y.getAs[Long]("event_id"))
      assert(Option(x.getAs[Any]("asof_orderkey")) ==
        Option(y.getAs[Any]("asof_orderkey")), s"mismatch at $x vs $y")
    }
  }

  test("streaming LM counts: bigram counters add across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{LmPart, StreamLm}
    val input = MemoryStream[LmPart]
    val query = StreamLm.counts(input.toDS())
      .writeStream.format("memory").queryName("lm_state")
      .outputMode(OutputMode.Update).start()
    try {
      // batches arrive pre-reduced (bigram, count), as production's
      // foreachBatch partial aggregation delivers them
      input.addData(LmPart("the", "table", 2), LmPart("big", "join", 1))
      query.processAllAvailable()
      input.addData(LmPart("the", "table", 1), LmPart("big", "scan", 1))
      query.processAllAvailable()
      val last = spark.table("lm_state").collect()
        .groupBy(r => (r.getAs[String]("w1"), r.getAs[String]("w2")))
        .view.mapValues(_.map(_.getAs[Long]("c12")).max).toMap
      assert(last == Map(("the", "table") -> 3L, ("big", "join") -> 1L,
        ("big", "scan") -> 1L))
    } finally query.stop()
  }

  test("streaming DSIR model: bucket count pairs add across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{DsirPart, StreamDsir}
    val input = MemoryStream[DsirPart]
    val query = StreamDsir.counts(input.toDS())
      .writeStream.format("memory").queryName("dsir_state")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(DsirPart(3, 10, 4), DsirPart(7, 2, 0))
      query.processAllAvailable()
      input.addData(DsirPart(3, 5, 5), DsirPart(9, 1, 1))
      query.processAllAvailable()
      val last = spark.table("dsir_state").collect()
        .groupBy(_.getAs[Long]("f"))
        .view.mapValues(rs => rs.maxBy(_.getAs[Long]("cnt")))
        .toMap
      assert(last(3L).getAs[Long]("cnt") == 15L &&
        last(3L).getAs[Long]("tcnt") == 9L)
      assert(last(7L).getAs[Long]("cnt") == 2L &&
        last(7L).getAs[Long]("tcnt") == 0L)
      assert(last(9L).getAs[Long]("cnt") == 1L &&
        last(9L).getAs[Long]("tcnt") == 1L)
    } finally query.stop()
  }

  test("streaming line census: distinct-doc and occurrence counts add " +
    "across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{LinePart, StreamLineCensus}
    val input = MemoryStream[LinePart]
    val query = StreamLineCensus.counts(input.toDS())
      .writeStream.format("memory").queryName("line_state")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: boilerplate line h1 in 2 docs (3 occurrences), h2 once
      input.addData(LinePart("h1", 2, 3), LinePart("h2", 1, 1))
      query.processAllAvailable()
      // batch 2: h1 again in 2 more docs, new line h3
      input.addData(LinePart("h1", 2, 2), LinePart("h3", 1, 1))
      query.processAllAvailable()
      val last = spark.table("line_state").collect()
        .groupBy(_.getAs[String]("lh"))
        .view.mapValues(rs => rs.maxBy(_.getAs[Long]("n_docs"))).toMap
      assert(last("h1").getAs[Long]("n_docs") == 4L &&
        last("h1").getAs[Long]("n_occ") == 5L)
      assert(last("h2").getAs[Long]("n_docs") == 1L)
      assert(last("h3").getAs[Long]("n_occ") == 1L)
    } finally query.stop()
  }

  test("streaming line census in batch mode equals the batch " +
    "line_census gate") {
    val a = streaming.StreamScenarios.streamLineMaintain(spark, sf).collect()
    val b = operators.LineDedup.lineCensus(spark, sf).collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[String]("line_hash") == y.getAs[String]("line_hash"))
      assert(x.getAs[Long]("n_docs") == y.getAs[Long]("n_docs"))
      assert(x.getAs[Long]("n_occ") == y.getAs[Long]("n_occ"))
    }
  }

  test("streaming URL registry: min-doc, counts and surface sets fold " +
    "across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{StreamUrlDedup, UrlPart}
    val input = MemoryStream[UrlPart]
    val query = StreamUrlDedup.states(input.toDS())
      .writeStream.format("memory").queryName("url_state")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        UrlPart("https://a.example/x", 7, 2, Seq("HTTPS://A.EXAMPLE/x")),
        UrlPart("https://a.example/y", 9, 1, Seq("https://a.example/y/")))
      query.processAllAvailable()
      // batch 2: an earlier crawl order for /x and one repeated surface
      input.addData(UrlPart("https://a.example/x", 3, 2,
        Seq("HTTPS://A.EXAMPLE/x", "https://a.example:443/x")))
      query.processAllAvailable()
      val last = spark.table("url_state").collect()
        .groupBy(_.getAs[String]("cu"))
        .view.mapValues(rs => rs.maxBy(_.getAs[Long]("n_docs"))).toMap
      val x = last("https://a.example/x")
      assert(x.getAs[Long]("min_doc") == 3L && x.getAs[Long]("n_docs") == 4L)
      assert(x.getAs[scala.collection.Seq[String]]("surfaces").toSeq ==
        Seq("HTTPS://A.EXAMPLE/x", "https://a.example:443/x"))
      assert(last("https://a.example/y").getAs[Long]("n_docs") == 1L)
    } finally query.stop()
  }

  test("streaming URL registry: a surface flood past the cap keeps only " +
    "the cap-smallest surfaces and counts every drop exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{StreamUrlDedup, UrlPart}
    val K = StreamUrlDedup.SurfaceCap
    val all = (0 until 3 * K).map(i => f"https://f.example/x?v=$i%03d")
    val input = MemoryStream[UrlPart]
    val query = StreamUrlDedup.states(input.toDS())
      .writeStream.format("memory").queryName("url_flood")
      .outputMode(OutputMode.Update).start()
    try {
      // flood one canonical key across three batches, DESCENDING so the
      // eviction path (insert + evict-max) fires, not just the reject path
      all.reverse.grouped(K).zipWithIndex.foreach { case (chunk, i) =>
        input.addData(UrlPart("https://f.example/x", 100L + i, chunk.length,
          chunk))
        query.processAllAvailable()
      }
      // re-observe an already-kept surface: a no-op, not a drop
      input.addData(UrlPart("https://f.example/x", 99L, 1, Seq(all.head)))
      query.processAllAvailable()
      val last = spark.table("url_flood").collect()
        .maxBy(_.getAs[Long]("n_docs"))
      val kept = last.getAs[scala.collection.Seq[String]]("surfaces").toSeq
      assert(kept.length == K, s"state grew past the cap: ${kept.length}")
      assert(kept == all.take(K).sorted,
        "kept set is not the cap-smallest distinct surfaces")
      // 3K distinct observed, K kept → exactly 2K drop events (the
      // re-observation of a kept surface must not count)
      assert(last.getAs[Long]("n_dropped") == 2L * K)
      assert(last.getAs[Long]("min_doc") == 99L)
    } finally query.stop()
  }

  test("streaming URL registry in batch mode equals the batch " +
    "dedup_url gate") {
    val a = streaming.StreamScenarios.streamUrlMaintain(spark, sf).collect()
    val b = operators.UrlOps.dedupUrl(spark, sf).collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[String]("canon_url") == y.getAs[String]("canon_url"))
      assert(x.getAs[String]("site") == y.getAs[String]("site"))
      assert(x.getAs[Long]("n_docs") == y.getAs[Long]("n_docs"))
      assert(x.getAs[Long]("n_surfaces") == y.getAs[Long]("n_surfaces"))
      assert(x.getAs[Long]("keep_doc") == y.getAs[Long]("keep_doc"))
    }
  }

  test("streaming quality curve: threshold-bucket counters add across " +
    "batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{QtPart, StreamQualityCurve}
    val input = MemoryStream[QtPart]
    val query = StreamQualityCurve.counters(input.toDS())
      .writeStream.format("memory").queryName("qt_state")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(QtPart(0, 10, 10, 500, 4000000),
        QtPart(5, 10, 4, 180, 2400000))
      query.processAllAvailable()
      input.addData(QtPart(5, 6, 2, 90, 1300000))
      query.processAllAvailable()
      val last = spark.table("qt_state").collect()
        .groupBy(_.getAs[Int]("k"))
        .view.mapValues(rs => rs.maxBy(_.getAs[Long]("n_docs"))).toMap
      assert(last(5).getAs[Long]("n_docs") == 16L)
      assert(last(5).getAs[Long]("n_docs_kept") == 6L)
      assert(last(5).getAs[Long]("n_tokens_kept") == 270L)
      assert(last(5).getAs[Long]("sumq") == 3700000L)
      assert(last(0).getAs[Long]("n_docs") == 10L)
    } finally query.stop()
  }

  test("streaming drift monitor: bucket counters add across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{DrPart, StreamDrift}
    val input = MemoryStream[DrPart]
    val query = StreamDrift.counters(input.toDS())
      .writeStream.format("memory").queryName("dr_state")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(DrPart(3, 10, 7), DrPart(8, 2, 5))
      query.processAllAvailable()
      input.addData(DrPart(3, 4, 6), DrPart(0, 1, 0))
      query.processAllAvailable()
      val last = spark.table("dr_state").collect()
        .groupBy(_.getAs[Long]("k"))
        .view.mapValues(rs => rs.maxBy(r =>
          r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur"))).toMap
      assert(last(3L).getAs[Long]("n_ref") == 14L)
      assert(last(3L).getAs[Long]("n_cur") == 13L)
      assert(last(8L).getAs[Long]("n_ref") == 2L)
      assert(last(8L).getAs[Long]("n_cur") == 5L)
      assert(last(0L).getAs[Long]("n_ref") == 1L)
    } finally query.stop()
  }

  test("streaming novelty maintainer: gram state folds min/bit-or " +
    "across batches and replays are harmless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{NvObs, StreamNovelty}
    val input = MemoryStream[NvObs]
    val query = StreamNovelty.gramStates(input.toDS())
      .writeStream.format("memory").queryName("nv_state")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(NvObs("g1", 2), NvObs("g2", 0))
      query.processAllAvailable()
      // later window for g1, then a REPLAY of the first observation —
      // min/bit-or are idempotent, so the replay must change nothing
      input.addData(NvObs("g1", 5), NvObs("g1", 2))
      query.processAllAvailable()
      val last = spark.table("nv_state").collect()
        .groupBy(_.getAs[String]("g"))
        .view.mapValues(rs => rs.maxBy(_.getAs[Long]("wmask"))).toMap
      assert(last("g1").getAs[Long]("first_w") == 2L)
      assert(last("g1").getAs[Long]("base_w") == 0L)
      assert(last("g1").getAs[Long]("wmask") == ((1L << 2) | (1L << 5)))
      assert(last("g2").getAs[Long]("first_w") == 0L)
      assert(last("g2").getAs[Long]("wmask") == 1L)
    } finally query.stop()
  }

  test("streaming novelty maintainer: the bitmap ROLLS past the 64-window " +
    "horizon — old bits shift out, first_w stays exact, replays of " +
    "rolled-out windows are no-ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{NvObs, StreamNovelty}
    val input = MemoryStream[NvObs]
    val query = StreamNovelty.gramStates(input.toDS())
      .writeStream.format("memory").queryName("nv_roll")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(NvObs("g", 2), NvObs("g", 10))
      query.processAllAvailable()
      // cross the horizon: window 70 forces base_w = 7; window 2 rolls
      // out, window 10 survives at bit 3
      input.addData(NvObs("g", 70))
      query.processAllAvailable()
      // replay a rolled-out window — must be a no-op
      input.addData(NvObs("g", 2))
      query.processAllAvailable()
      val st = spark.table("nv_roll").collect()
        .filter(_.getAs[String]("g") == "g")
        .maxBy(_.getAs[Long]("base_w"))
      assert(st.getAs[Long]("first_w") == 2L, "first_w is exact forever")
      assert(st.getAs[Long]("base_w") == 7L)
      assert(st.getAs[Long]("wmask") == ((1L << 3) | (1L << 63)),
        s"mask ${st.getAs[Long]("wmask")}: window 10 at bit 3, 70 at 63")
      // a jump past the whole mask clears it (no mod-64 aliasing)
      input.addData(NvObs("g", 500))
      query.processAllAvailable()
      val st2 = spark.table("nv_roll").collect()
        .filter(_.getAs[String]("g") == "g")
        .maxBy(_.getAs[Long]("base_w"))
      assert(st2.getAs[Long]("base_w") == 437L)
      assert(st2.getAs[Long]("wmask") == (1L << 63))
      assert(st2.getAs[Long]("first_w") == 2L)
    } finally query.stop()
  }

  test("streaming novelty maintainer in batch mode equals the batch " +
    "corpus_novelty gate") {
    val a = streaming.StreamScenarios.streamNoveltyMaintain(spark, sf)
      .collect()
    val b = operators.CorpusFilters.corpusNovelty(spark, sf).collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[Long]("w") == y.getAs[Long]("w"))
      assert(x.getAs[Long]("n_docs") == y.getAs[Long]("n_docs"))
      assert(x.getAs[Long]("n_occ") == y.getAs[Long]("n_occ"))
      assert(x.getAs[Long]("n_grams_distinct") ==
        y.getAs[Long]("n_grams_distinct"))
      assert(x.getAs[Long]("n_new_grams") == y.getAs[Long]("n_new_grams"))
      assert(x.getAs[Double]("novelty_rate") ==
        y.getAs[Double]("novelty_rate"))
    }
  }

  test("streaming drift monitor in batch mode equals the batch " +
    "quality_drift gate") {
    val a = streaming.StreamScenarios.streamDriftMaintain(spark, sf)
      .collect()
    val b = operators.Quality.qualityDrift(spark, sf).collect()
    assert(a.length == 10 && b.length == 10)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[Long]("k") == y.getAs[Long]("k"))
      assert(x.getAs[Long]("n_ref") == y.getAs[Long]("n_ref"))
      assert(x.getAs[Long]("n_cur") == y.getAs[Long]("n_cur"))
      assert(x.getAs[Double]("chi2_term") == y.getAs[Double]("chi2_term"))
      assert(x.getAs[Boolean]("no_ref") == y.getAs[Boolean]("no_ref"))
    }
  }

  test("streaming quality curve in batch mode equals the batch " +
    "quality_tradeoff gate") {
    val a = streaming.StreamScenarios.streamQualityMaintain(spark, sf)
      .collect()
    val b = operators.TrainPrep.qualityTradeoff(spark, sf).collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[Double]("tau") == y.getAs[Double]("tau"))
      assert(x.getAs[Long]("n_docs_kept") == y.getAs[Long]("n_docs_kept"))
      assert(x.getAs[Long]("n_tokens_kept") == y.getAs[Long]("n_tokens_kept"))
      assert(x.getAs[Double]("frac_docs") == y.getAs[Double]("frac_docs"))
      assert(x.getAs[Long]("mean_quality_q6") ==
        y.getAs[Long]("mean_quality_q6"))
    }
  }

  test("streaming epoch census: per-source doc/token counts add across " +
    "batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{EpPart, StreamEpochCensus}
    val input = MemoryStream[EpPart]
    val query = StreamEpochCensus.census(input.toDS())
      .writeStream.format("memory").queryName("ep_state")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(EpPart("src1", 10, 1200), EpPart("src2", 5, 800))
      query.processAllAvailable()
      input.addData(EpPart("src1", 3, 450))
      query.processAllAvailable()
      val last = spark.table("ep_state").collect()
        .groupBy(_.getAs[String]("source"))
        .view.mapValues(rs => rs.maxBy(_.getAs[Long]("n_docs"))).toMap
      assert(last("src1").getAs[Long]("n_docs") == 13L)
      assert(last("src1").getAs[Long]("n_tokens") == 1650L)
      assert(last("src2").getAs[Long]("n_tokens") == 800L)
    } finally query.stop()
  }

  test("streaming epoch census in batch mode equals the batch " +
    "corpus_epochs gate") {
    val a = streaming.StreamScenarios.streamEpochMaintain(spark, sf)
      .collect()
    val b = operators.TrainPrep.corpusEpochs(spark, sf).collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[String]("source") == y.getAs[String]("source"))
      assert(x.getAs[Long]("alloc_tokens") == y.getAs[Long]("alloc_tokens"))
      assert(x.getAs[Boolean]("saturated") == y.getAs[Boolean]("saturated"))
      assert(x.getAs[Double]("epochs") == y.getAs[Double]("epochs"))
    }
  }

  test("streaming LM in batch mode equals the batch bigram-LM gate") {
    val a = streaming.StreamScenarios.streamLmMaintain(spark, sf).collect()
    val b = operators.TrainPrep.textBigramLm(spark, sf).collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[String]("w1") == y.getAs[String]("w1"))
      assert(x.getAs[String]("w2") == y.getAs[String]("w2"))
      assert(x.getAs[Long]("c12") == y.getAs[Long]("c12"))
      assert(x.getAs[Long]("c1") == y.getAs[Long]("c1"))
      assert(x.getAs[Double]("p") == y.getAs[Double]("p"))
    }
  }
}
