package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-diff and changeset-apply semantics of the reference engine,
  * re-expressed as declarative Spark joins.
  *
  * Semantics derive from `linz_bde_uploader`
  * (`sql/02-bde_control_functions.sql.in`):
  *  - level-0 incremental = diff a fresh snapshot against the current table
  *    on the key (`bde_ApplyLevel0Update`, line 1823, via
  *    `table_version.ver_apply_table_differences`);
  *  - level-5 = a change-key list plus new row images, with the action
  *    *derived* by joining current vs incoming (`bde_ApplyLevel5Update`,
  *    line 1576; `_bde_CreateIncDeletes/Inserts/Updates`, lines 2228-2374);
  *  - `0` marks a no-op image, `X` marks a unique-constraint column change
  *    that must be applied as delete+insert (`_bde_CreateIncUpdates`);
  *  - rows whose unique column matches an incoming image but whose key
  *    differs were missed by the extract and join the change set
  *    (`_bde_FixChangedIncKeyRecords`, line 2146);
  *  - post-apply row counts are sanity-checked against expectation within
  *    configured tolerances (`_bde_CheckTableCount`, line 2006 + per-table
  *    `row_tol_error`/`row_tol_warning`).
  *
  * Scale: each classification is a single key-partitioned join (full outer
  * for diff, semi-restricted for changesets). Change sets are small relative
  * to the table, so Spark broadcasts them; the big side never shuffles more
  * than once. No driver-side iteration.
  */
object Merge {
  val Action = "action"

  private def dataCols(cur: DataFrame, incoming: DataFrame, key: String): Seq[String] =
    cur.columns.toSeq.filter(c => c != key && incoming.columns.contains(c))

  private def classify(cur: DataFrame, incoming: DataFrame, key: String,
                       uniqueCols: Seq[String]): DataFrame = {
    val cols = dataCols(cur, incoming, key)
    val c = cur.alias("c")
    val i = incoming.alias("i")
    val allEq: Column =
      if (cols.isEmpty) lit(true)
      else cols.map(x => col(s"c.$x") <=> col(s"i.$x")).reduce(_ && _)
    val uniqChanged: Column =
      if (uniqueCols.isEmpty) lit(false)
      else uniqueCols.map(x => !(col(s"c.$x") <=> col(s"i.$x"))).reduce(_ || _)
    c.join(i, col(s"c.$key") === col(s"i.$key"), "full_outer")
      .select(
        coalesce(col(s"c.$key"), col(s"i.$key")).as(key),
        when(col(s"i.$key").isNull, "D")
          .when(col(s"c.$key").isNull, "I")
          .when(allEq, "0")
          .when(uniqChanged, "X")
          .otherwise("U")
          .as(Action))
  }

  /** Level-0 incremental: classify every key of current ∪ snapshot.
    * Action `0` rows are retained so callers can count null updates.
    */
  def diffActions(cur: DataFrame, snapshot: DataFrame, key: String,
                  uniqueCols: Seq[String] = Nil): DataFrame =
    classify(cur, snapshot, key, uniqueCols)

  /** Level-5: classification restricted to the announced change keys.
    * Keys announced but present on neither side drop out (as in the
    * reference, where both joins come up empty).
    */
  def changesetActions(cur: DataFrame, incoming: DataFrame, changeKeys: DataFrame,
                       key: String, uniqueCols: Seq[String] = Nil): DataFrame = {
    val keys = changeKeys.select(col(key)).distinct()
    classify(
      cur.join(keys, Seq(key), "left_semi"),
      incoming.join(keys, Seq(key), "left_semi"),
      key, uniqueCols)
  }

  /** `_bde_FixChangedIncKeyRecords`: current-table keys whose unique column
    * is claimed by an incoming image under a *different* key, and which the
    * change set does not already cover. They must be added (as implicit
    * deletes) or the apply would violate uniqueness.
    */
  def missedKeyChanges(cur: DataFrame, incoming: DataFrame, changeKeys: DataFrame,
                       key: String, uniqueCols: Seq[String]): DataFrame = {
    val keys = changeKeys.select(col(key)).distinct()
    val announced = incoming.join(keys, Seq(key), "left_semi").alias("i")
    val missed = uniqueCols.map { u =>
      cur.alias("c")
        .join(announced,
          col(s"c.$u") === col(s"i.$u") && col(s"c.$key") =!= col(s"i.$key"))
        .select(col(s"c.$key").as(key))
    }.reduce(_ unionByName _)
    missed.distinct().join(keys, Seq(key), "left_anti")
  }

  /** Apply classified actions: D/X keys leave, I/U/X images enter, `0`
    * keys keep their current row (`table_version._ver_apply_changes`).
    */
  def applyActions(cur: DataFrame, incoming: DataFrame, actions: DataFrame,
                   key: String): DataFrame = {
    val out = actions.filter(col(Action).isin("D", "U", "X")).select(key)
    val in = actions.filter(col(Action).isin("I", "U", "X")).select(key)
    cur.join(out, Seq(key), "left_anti")
      .unionByName(incoming.join(in, Seq(key), "left_semi")
        .select(cur.columns.map(col).toIndexedSeq: _*))
  }

  /** Invert a classified changeset: inserts become deletes, deletes become
    * inserts, updates stay updates (applied with the OLD images), no-ops
    * stay no-ops. Applying the inverted actions to the post-apply table
    * with the pre-apply table as the image source rolls the apply back
    * exactly — the recovery path when a bad dataset load must be undone
    * without restoring from a snapshot (the reference's equivalent is a
    * transaction rollback, which a lake-format table doesn't get for free).
    * A pure column mapping — no extra shuffle beyond [[applyActions]]'s.
    */
  def invertActions(actions: DataFrame): DataFrame =
    actions.withColumn(Action,
      when(col(Action) === "I", "D")
        .when(col(Action) === "D", "I")
        .otherwise(col(Action)))

  /** Per-action row counts (the reference records inserts / updates /
    * null-updates / deletes per dataset load).
    */
  def counts(actions: DataFrame): DataFrame =
    actions.groupBy(col(Action)).agg(count(lit(1)).as("n")).orderBy(col(Action))

  /** Durable apply bookkeeping — the `_bde_RecordDatasetLoaded` record
    * (`sql/02-bde_control_functions.sql.in:975`): one row per
    * (dataset, table) apply with insert / update / null-update / delete
    * counts. `X` actions are applied as delete+insert to protect
    * uniqueness, so they count toward both. A single partial-aggregating
    * pass over the action frame — at 100 TB this adds one scalar row per
    * apply, not a shuffle.
    */
  def bookkeeping(actions: DataFrame, dataset: String, table: String): DataFrame =
    actions.agg(
      count(when(col(Action).isin("I", "X"), 1)).as("n_insert"),
      count(when(col(Action) === "U", 1)).as("n_update"),
      count(when(col(Action) === "0", 1)).as("n_null_update"),
      count(when(col(Action).isin("D", "X"), 1)).as("n_delete"))
      .select(lit(dataset).as("dataset"), lit(table).as("tablename"),
        col("n_insert"), col("n_update"), col("n_null_update"), col("n_delete"))

  /** Changeset apply that also emits its bookkeeping: the merged table plus
    * the `_bde_RecordDatasetLoaded`-shaped stats row, with the load
    * duration stamped at persist time by [[graft.sources.ParquetSink
    * .writeApplyResult]]. Callers that only need the table keep using
    * [[applyActions]].
    */
  def applyWithBookkeeping(cur: DataFrame, incoming: DataFrame,
                           actions: DataFrame, key: String,
                           dataset: String, table: String): (DataFrame, DataFrame) =
    (applyActions(cur, incoming, actions, key),
      bookkeeping(actions, dataset, table))

  /** Announced keys for one table from a reference-format change table
    * (`(id, tablename, tablekeyvalue, action, timestamp)` — the level-5
    * stream in `t/data/xaud.crs`). Actions in the file are advisory only;
    * the real classification is re-derived by [[changesetActions]], exactly
    * as the reference re-derives it (`_bde_CreateIncDeletes/Inserts/
    * Updates`).
    */
  def changeKeysFromChangeTable(changeTable: DataFrame, tableName: String,
                                key: String): DataFrame =
    changeTable.filter(col("tablename") === tableName)
      .select(col("tablekeyvalue").as(key)).distinct()

  /** Aggregate state for [[incrementalAgg]]: per-group row count and exact
    * decimal measure sum. In production this frame is persisted alongside
    * the table and never recomputed from scratch.
    */
  def aggState(df: DataFrame, groupCol: String, measure: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), graft.Exact.sumDec(col(measure)).as("sum_dec"))

  /** Incremental aggregate maintenance: the post-apply aggregate computed
    * from the PRE-apply state plus the changeset only — the merged table is
    * never built or scanned. Leaving rows (D/U/X keys, images from `cur`)
    * contribute negatively, entering rows (I/U/X images from `incoming`)
    * positively; a group-key change in an update moves mass between groups
    * because both contributions carry their own group value.
    *
    * At 100 TB this is the difference between rescanning the table per
    * dataset load and an O(|changeset|) update: the delta side is a day's
    * changes, the state side is one row per group. Decimal sums keep the
    * merge exact, so the result is bit-identical to a full recompute.
    */
  def incrementalAgg(oldState: DataFrame, cur: DataFrame, incoming: DataFrame,
                     actions: DataFrame, key: String, groupCol: String,
                     measure: String): DataFrame = {
    val outK = actions.filter(col(Action).isin("D", "U", "X")).select(key)
    val inK = actions.filter(col(Action).isin("I", "U", "X")).select(key)
    val minus = cur.join(outK, Seq(key), "left_semi")
      .select(col(groupCol), lit(-1L).as("n"),
        (-col(measure)).cast(graft.Exact.wide).as("sum_dec"))
    val plus = incoming.join(inK, Seq(key), "left_semi")
      .select(col(groupCol), lit(1L).as("n"),
        col(measure).cast(graft.Exact.wide).as("sum_dec"))
    oldState.select(col(groupCol), col("n"), col("sum_dec"))
      .unionByName(minus).unionByName(plus)
      .groupBy(col(groupCol))
      .agg(sum(col("n")).as("n"), sum(col("sum_dec")).as("sum_dec"))
      .filter(col("n") > 0)
  }

  /** Incremental JOIN maintenance (the delta rule for a fact-side change:
    * Δ(F ⋈ D) = ΔF⁻ ⋈ D removed, ΔF⁺ ⋈ D added — the dimension side is
    * untouched, so only the changeset ever joins it). The maintained
    * result is updated in O(|changeset| ⋈ D) with the dimension side
    * broadcast; the full fact table is never rescanned — the join twin of
    * [[incrementalAgg]], i.e. materialized-view maintenance for joins.
    */
  def incrementalJoin(oldResult: DataFrame, incoming: DataFrame,
                      actions: DataFrame, key: String,
                      dim: DataFrame, dimKey: String,
                      factDimCol: String): DataFrame = {
    val outK = actions.filter(col(Action).isin("D", "U", "X")).select(key)
    val inF = incoming.join(
      actions.filter(col(Action).isin("I", "U", "X")).select(key),
      Seq(key), "left_semi")
    oldResult.join(outK, Seq(key), "left_anti")
      .unionByName(
        inF.join(org.apache.spark.sql.functions.broadcast(dim),
          inF(factDimCol) === dim(dimKey))
          .select(oldResult.columns.map(col).toIndexedSeq: _*))
  }

  /** Row-count tolerance validation. `checks` carries
    * (check_name, expected_count, actual_count); emits ratio + status with
    * `error` outranking `warn` (reference: per-table `row_tol_error` /
    * `row_tol_warning` and `_bde_CheckTableCount`).
    */
  def rowCountChecks(checks: DataFrame, warnTol: Double, errTol: Double): DataFrame = {
    val ratio = col("actual_count").cast("double") / col("expected_count").cast("double")
    checks.select(
      col("check_name"),
      col("expected_count"),
      col("actual_count"),
      ratio.as("ratio"),
      when(abs(ratio - 1.0) > errTol, "error")
        .when(abs(ratio - 1.0) > warnTol, "warn")
        .otherwise("ok").as("status"))
  }
}
