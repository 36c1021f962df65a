package graft.sources

import graft.operators.{Merge, Versioned}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** One table's state after an upload run: the current table, its full
  * revision history, the per-dataset bookkeeping, and the row-count check
  * grades — everything the reference persists across
  * `bde_ApplyLevel0Update` / `bde_ApplyLevel5Update` /
  * `_bde_RecordDatasetLoaded` / `_bde_CheckTableCount`.
  */
case class UploadedTable(
    current: DataFrame,
    versioned: DataFrame,
    bookkeeping: DataFrame,
    countChecks: DataFrame)

/** Persisted upload state a later run resumes from: the published current
  * table plus the name of the last dataset it reflects — the minimum the
  * reference keeps between runs (the live table + `bde_LastUploadStats`'s
  * last-dataset bookkeeping) so `GetLevel5Updates` (`BdeUpload.pm:653`)
  * can apply only datasets newer than the stored state.
  */
final case class UploadSeed(current: DataFrame, lastDataset: String)

/** Everything one apply knew, handed to registered post-load hooks — the
  * Spark-side seam for the reference's registered SQL functions
  * (`bde_ApplyPostLevel0Functions` / `bde_ApplyPostUploadFunctions` run
  * `bde_postlevel0_*` / `bde_postupload_*` per upload:
  * `sql/02-bde_control_functions.sql.in:2645,2661`, `BdeUpload.pm:819,590`).
  * `previous`/`incoming`/`actions` are None for the level-0 load (a fresh
  * snapshot has no delta); for level-5 applies they carry exactly the
  * inputs incremental view maintenance needs, so maintained artifacts
  * ([[graft.operators.Merge.incrementalAgg]] /
  * [[graft.operators.Merge.incrementalJoin]]) update in O(|changeset|)
  * without rescanning the table.
  */
final case class ApplyEvent(
    table: String,
    dataset: String,
    level: Int,
    previous: Option[DataFrame],
    incoming: Option[DataFrame],
    actions: Option[DataFrame],
    current: DataFrame)

/** The reference's top-level upload loop (`BdeUpload.pm:560 ApplyUpdates` →
  * `GetLevel0Updates`/`GetLevel5Updates` → per-dataset applies), composed
  * from graft's operators:
  *
  *  1. discover datasets in the filesystem repository ([[BdeRepository]]);
  *  2. for each configured table: load the newest level-0 that carries its
  *     files ([[BdeReader]] with the configured error policy);
  *  3. apply every later level-5 in name order — change keys from the
  *     `l5_change_table` file, actions re-derived against the current
  *     table ([[Merge.changesetActions]]), `level5_is_full` tables
  *     re-diffed as snapshots ([[Merge.diffActions]]);
  *  4. record bookkeeping per apply and grade row counts against the
  *     table's configured tolerances;
  *  5. keep every revision so the versioned store ([[Versioned.build]])
  *     reconstructs any point in history.
  *
  * Scale: each apply is the operators' own single-shuffle plans; the only
  * driver-side values are counts (bookkeeping metadata, as in the
  * reference's event log). Production runs persist each revision via
  * [[ParquetSink.writeApplyResult]] / [[ParquetSink.writeVersioned]]
  * instead of holding the chain in cache.
  */
object Upload {

  private def stem(f: String): String =
    new Path(f).getName.replaceAll("\\.crs(\\.gz)?$", "")

  private def filesFor(ds: BdeRepository.Dataset, t: BdeTableDef): Seq[String] =
    ds.files.filter(f => t.files.contains(stem(f)))

  /** A post-load hook. Registration replaces the reference's
    * `bde_postlevel0_*` / `bde_postupload_*` function-name convention.
    */
  type PostApplyHook = ApplyEvent => Unit

  private val MetaFile = "_LAST_DATASET"

  /** Publish one table's post-run state through [[ManifestStore]] so a
    * later run can [[seedFrom]] it: the table parquet under `data/` plus a
    * tiny last-dataset marker, both inside the staged version directory —
    * neither is visible until the manifest rename commits. This is the
    * persistence the reference gets from PostgreSQL for free (the live
    * table survives between runs); on a lake store it is an explicit
    * publish, and the atomic pointer makes a crashed run invisible.
    */
  def publishState(table: DataFrame, lastDataset: String,
                   storeRoot: String): String = {
    val s = table.sparkSession
    ManifestStore.publishWith(s, storeRoot) { dir =>
      table.write.mode("overwrite").parquet(s"$dir/data")
      val fs = new Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val out = fs.create(new Path(dir, MetaFile), true)
      try out.write(s"$lastDataset\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Resolve the newest published state under `storeRoot` as an
    * [[UploadSeed]] — the read side of [[publishState]].
    */
  def seedFrom(s: SparkSession, storeRoot: String): UploadSeed = {
    val (_, dir) = ManifestStore.currentVersion(s, storeRoot).getOrElse(
      sys.error(s"Upload.seedFrom: nothing published under $storeRoot"))
    val fs = new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(dir, MetaFile))
    val last =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    UploadSeed(s.read.parquet(s"$dir/data"), last)
  }

  /** Run the upload loop for every data table in `tables` (the parsed
    * registry). Returns per-table results keyed by table name.
    *
    * Hook seams (each fired with the full [[ApplyEvent]]):
    *  - `postApply` — after EVERY apply (the level-0 load and each level-5
    *    changeset): the maintenance seam for incrementally-maintained
    *    artifacts;
    *  - `postLevel0` — after the level-0 load only (the reference's
    *    `bde_ApplyPostLevel0Functions`);
    *  - `postUpload` — once per table after its last apply (the reference's
    *    `bde_ApplyPostUploadFunctions`).
    *
    * `seeds` resumes a table from previously published state (the
    * reference's normal daily mode: level-5 updates against the PREVIOUSLY
    * UPLOADED table — `GetLevel5Updates`, `BdeUpload.pm:653`;
    * `bde_ApplyLevel5Update` reads the live table,
    * `sql/02-bde_control_functions.sql.in:1576`). A seeded table applies
    * only datasets newer than the seed's last dataset; a level-0 newer
    * than the seed supersedes it (the reference always prefers the newest
    * full snapshot). `l5_only` tables REQUIRE a seed — they have no
    * level-0 era to replay. The seed itself is not an apply of this run:
    * no hook fires for it and no bookkeeping row is recorded (run #1
    * already recorded its applies).
    */
  def run(spark: SparkSession, repoRoot: String, tables: Seq[BdeTableDef],
          policy: BdeErrorPolicy = BdeErrorPolicy(),
          postApply: Seq[PostApplyHook] = Nil,
          postLevel0: Seq[PostApplyHook] = Nil,
          postUpload: Seq[PostApplyHook] = Nil,
          seeds: Map[String, UploadSeed] = Map.empty): Map[String, UploadedTable] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val datasets = BdeRepository.datasets(repoRoot, conf)
    val changeDef = tables.find(_.levels.contains("C"))
    tables.filterNot(_.levels.contains("C"))
      .map(t => t.name -> runTable(spark, datasets, t, changeDef, policy,
        postApply, postLevel0, postUpload, seeds.get(t.name)))
      .toMap
  }

  private def checksRow(spark: SparkSession, name: String,
                        expected: Long, actual: Long): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(Row(name, expected, actual)),
      StructType(Seq(StructField("check_name", StringType, false),
        StructField("expected_count", LongType, false),
        StructField("actual_count", LongType, false))))

  private def runTable(spark: SparkSession, datasets: Seq[BdeRepository.Dataset],
                       t: BdeTableDef, changeDef: Option[BdeTableDef],
                       policy: BdeErrorPolicy,
                       postApply: Seq[PostApplyHook] = Nil,
                       postLevel0: Seq[PostApplyHook] = Nil,
                       postUpload: Seq[PostApplyHook] = Nil,
                       seed: Option[UploadSeed] = None): UploadedTable = {
    // a level-0 newer than the seed supersedes it — the reference always
    // loads the newest full snapshot when one exists (GetLevel0Updates
    // picks it before GetLevel5Updates runs, `BdeUpload.pm:612`)
    val l0opt =
      if (!t.levels.contains("0")) None
      else datasets
        .filter(d => d.level == 0 && filesFor(d, t).nonEmpty)
        .filter(d => seed.forall(_.lastDataset < d.name))
        .lastOption
    val (startCur, startDs, startLevel) = l0opt match {
      case Some(l0) =>
        (BdeReader.read(spark, filesFor(l0, t), None, policy), l0.name, 0)
      case None =>
        // an l5_only table has no level-0 to start from: the reference
        // errors ("no previous upload") unless prior state exists — here
        // that means a seed published by the previous run
        val sd = seed.getOrElse(throw new IllegalStateException(
          if (!t.levels.contains("0"))
            s"table ${t.name} is l5_only: incremental loads need a " +
              "previously uploaded table (publish the prior run's state " +
              "via Upload.publishState and pass it in seeds)"
          else s"no level-0 dataset carries files for table ${t.name}"))
        (sd.current, sd.lastDataset, 5)
    }
    var later5 = datasets.filter(d =>
      d.level == 5 && d.name > startDs && t.levels.contains("5") &&
        filesFor(d, t).nonEmpty)
    // level5_is_full tables treat each L5 file as a complete snapshot, so
    // only the newest matters (GetLevel5Updates keeps just the last)
    if (t.level5IsFull) later5 = later5.takeRight(1)

    var cur = startCur.cache()
    val key = t.keyColumn.getOrElse(cur.columns.head)
    val keyType = cur.schema(key).dataType

    var rev = 1
    var snapshots = List(rev -> cur)
    // a fresh level-0 load is all inserts (reference records it as such);
    // a seed's applies were recorded by the run that published it, so a
    // seeded run's bookkeeping starts empty (zero-row if nothing applies)
    var book: DataFrame =
      if (startLevel == 0)
        Merge.bookkeeping(cur.select(lit("I").as(Merge.Action)), startDs, t.name)
      else null
    val l0n = cur.count()
    val startCheck =
      if (startLevel == 0) s"${t.name}@$startDs" else s"${t.name}@seed:$startDs"
    var checks = checksRow(spark, startCheck, l0n, l0n)
    var before = l0n

    var lastEvent = ApplyEvent(t.name, startDs, startLevel, None, None, None, cur)
    if (startLevel == 0) (postApply ++ postLevel0).foreach(_(lastEvent))

    later5.foreach { ds =>
      val incoming = BdeReader.read(spark, filesFor(ds, t),
        Some(cur.schema), policy)
      val actions =
        if (t.level5IsFull) Merge.diffActions(cur, incoming, key)
        else {
          val keys = changeDef
            .map(cd => filesFor(ds, cd))
            .filter(_.nonEmpty)
            .map { fs =>
              val ct = BdeReader.read(spark, fs, None, policy)
              Merge.changeKeysFromChangeTable(ct, t.name, key)
            }
            .getOrElse(incoming.select(col(key)))
            .select(col(key).cast(keyType).as(key))
          Merge.changesetActions(cur, incoming, keys, key)
        }
      val (merged, bk) =
        Merge.applyWithBookkeeping(cur, incoming, actions, key, ds.name, t.name)
      val prev = cur
      cur = merged.cache()
      rev += 1
      snapshots = snapshots :+ (rev -> cur)
      book = if (book == null) bk else book.unionByName(bk)
      val after = cur.count()
      checks = checks.unionByName(
        checksRow(spark, s"${t.name}@${ds.name}", before, after))
      before = after
      lastEvent = ApplyEvent(t.name, ds.name, 5,
        Some(prev), Some(incoming), Some(actions), cur)
      postApply.foreach(_(lastEvent))
    }
    postUpload.foreach(_(lastEvent))
    // grade every apply's (expected=before, actual=after) pair at once
    val graded = Merge.rowCountChecks(checks,
      warnTol = t.rowTolWarning.getOrElse(1.0),
      errTol = t.rowTolError.getOrElse(1.0))
    // a seeded run with zero new datasets still reports a (zeroed)
    // bookkeeping frame so the result shape is uniform
    if (book == null)
      book = Merge.bookkeeping(
        cur.limit(0).select(lit("I").as(Merge.Action)), startDs, t.name)
    UploadedTable(cur, Versioned.build(snapshots, key), book, graded)
  }
}
