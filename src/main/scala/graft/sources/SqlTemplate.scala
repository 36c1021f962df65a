package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{lit, replace}

/** Positional SQL templating — the reference's `bde_ExpandTemplate` /
  * `bde_ExecuteTemplate` (`sql/02-bde_control_functions.sql.in:2090,2114`):
  * `%1%`, `%2%`, … are substituted by sequential REPLACE in parameter
  * order, and execution returns the statement's row count (the reference's
  * `GET DIAGNOSTICS ROW_COUNT`). The sequential-replace semantics are
  * preserved exactly — a parameter value that itself contains a later
  * `%i%` marker gets re-substituted by that later iteration, as in the
  * reference — because registered hook templates (see [[Upload]]) were
  * written against that behavior.
  */
object SqlTemplate {

  /** Driver-side expansion for statement templates. */
  def expand(template: String, params: Seq[String]): String =
    params.zipWithIndex.foldLeft(template) { case (t, (p, i)) =>
      t.replace(s"%${i + 1}%", p)
    }

  /** Column-side expansion: the same sequential REPLACE chain as a codegen
    * expression, for expanding one template against a column of per-row
    * parameters (per-table statement generation stays on the executors;
    * nothing is collected).
    */
  def expandCol(template: Column, params: Seq[Column]): Column =
    params.zipWithIndex.foldLeft(template) { case (t, (p, i)) =>
      replace(t, lit(s"%${i + 1}%"), p)
    }

  /** Expand and execute against the session catalog, returning the result
    * row count. Callers register the frames the statement reads as temp
    * views first (the reference's hooks read the just-loaded tables the
    * same way); [[withViews]] scopes that.
    *
    * QUERY-ONLY contract, enforced: the returned count is the result-set
    * size of a SELECT. The reference's `GET DIAGNOSTICS ROW_COUNT` also
    * covers DML, but Spark command DataFrames carry no affected-row count,
    * so executing an INSERT/UPDATE/DELETE/DDL here would silently return a
    * meaningless value — we reject the statement at parse time instead.
    * Mutation in graft hooks goes through the typed seams
    * ([[Upload.PostApplyHook]] frames, [[ParquetSink]]), not SQL DML.
    */
  def execute(s: SparkSession, template: String,
              params: Seq[String]): Long = {
    val sql = expand(template, params)
    val plan = s.sessionState.sqlParser.parsePlan(sql)
    // scan the WHOLE parsed tree, not just the root: INSERT OVERWRITE
    // DIRECTORY parses to InsertIntoDir — a UnaryNode, not a Command — and
    // a root-only type check would let that filesystem mutation through
    val mutatingKinds = Set("InsertIntoStatement", "InsertIntoDir",
      "DeleteFromTable", "UpdateTable", "MergeIntoTable")
    val offending = plan.collectFirst {
      case c: org.apache.spark.sql.catalyst.plans.logical.Command =>
        c.getClass.getSimpleName
      case n if mutatingKinds.contains(n.getClass.getSimpleName) =>
        n.getClass.getSimpleName
    }
    val kind = offending.getOrElse("")
    require(offending.isEmpty,
      s"SqlTemplate.execute is query-only ($kind is a command/DML " +
        "statement): Spark reports no affected-row count for DML, so the " +
        "reference's ROW_COUNT contract cannot be honored — use the typed " +
        "hook seams for mutation")
    s.sql(sql).count()
  }

  /** The reference's `bde_ExecuteSqlArray`
    * (`sql/02-bde_control_functions.sql.in:2451`): hooks register ARRAYS of
    * templated statements, executed in order against the same parameters.
    * Returns the per-statement row counts; a failure in statement i aborts
    * the remainder (the reference raises through `bde_ExecuteTemplate` the
    * same way).
    */
  def executeAll(s: SparkSession, templates: Seq[String],
                 params: Seq[String]): Seq[Long] =
    templates.map(execute(s, _, params))

  /** Run `body` with `views` registered as temp views, dropping them
    * after — the execution scope a templated hook sees.
    */
  def withViews[A](s: SparkSession, views: Map[String, DataFrame])
                  (body: => A): A = {
    views.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    try body
    finally views.keys.foreach(s.catalog.dropTempView(_))
  }

  /** A post-load hook that executes a SQL template over the apply's
    * frames: `current` / `previous` / `incoming` / `actions` are in scope
    * as temp views (absent ones for a level-0 apply are skipped), and the
    * parameters derive from the event (table name, dataset, level). The
    * per-apply row count lands in `counts` keyed by (table, dataset) — the
    * reference logs the same count per hook execution.
    */
  def templateHook(spark: SparkSession, template: String,
                   counts: scala.collection.mutable.Map[(String, String), Long])
      : Upload.PostApplyHook = { ev =>
    val views = Map("current" -> Some(ev.current),
        "previous" -> ev.previous, "incoming" -> ev.incoming,
        "actions" -> ev.actions)
      .collect { case (n, Some(df)) => n -> df }
    val n = withViews(spark, views) {
      execute(spark, template,
        Seq(ev.table, ev.dataset, ev.level.toString))
    }
    counts((ev.table, ev.dataset)) = n
  }

  /** Array form of [[templateHook]] — the reference registers hook bodies
    * as statement ARRAYS (`bde_ExecuteSqlArray`); each statement's count is
    * recorded under its position, as the reference logs one count per
    * executed statement.
    */
  def templateArrayHook(spark: SparkSession, templates: Seq[String],
      counts: scala.collection.mutable.Map[(String, String, Int), Long])
      : Upload.PostApplyHook = { ev =>
    val views = Map("current" -> Some(ev.current),
        "previous" -> ev.previous, "incoming" -> ev.incoming,
        "actions" -> ev.actions)
      .collect { case (n, Some(df)) => n -> df }
    val ns = withViews(spark, views) {
      executeAll(spark, templates,
        Seq(ev.table, ev.dataset, ev.level.toString))
    }
    ns.zipWithIndex.foreach { case (n, i) =>
      counts((ev.table, ev.dataset, i)) = n
    }
  }
}
