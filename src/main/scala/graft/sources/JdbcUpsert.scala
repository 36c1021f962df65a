package graft.sources

import java.sql.DriverManager
import java.util.Properties

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
         |(SELECT $keyList FROM ${q(s"${stage}_deletes")})""".stripMargin
    val drop = s"DROP TABLE IF EXISTS ${q(stage)}"
    val dropDel = s"DROP TABLE IF EXISTS ${q(s"${stage}_deletes")}"
    (if (deleteKeys) Seq("1_delete" -> del) else Nil) ++
      Seq("2_merge" -> merge, "3_cleanup" -> drop) ++
      (if (deleteKeys) Seq("4_cleanup" -> dropDel) else Nil)
  }

  /** Stage `df` (and optionally the delete-key frame) via distributed JDBC
    * writes, then merge into `target` on `keys` with set-based server-side
    * statements.
    */
  def upsert(df: DataFrame, url: String, props: Properties,
             target: String, keys: Seq[String],
             deletes: Option[DataFrame] = None): Unit = {
    val stage = s"${target}_stage"
    df.write.mode("overwrite").jdbc(url, stage, props)
    deletes.foreach(
      _.write.mode("overwrite").jdbc(url, s"${stage}_deletes", props))
    val conn = DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      statements(target, df.columns.toSeq, keys, deleteKeys = deletes.nonEmpty)
        .foreach { case (_, sql) =>
          val st = conn.createStatement()
          try st.execute(sql) finally st.close()
        }
      conn.commit()
    } finally conn.close()
  }

  /** The exact relational semantics of [[statements]] applied to frames:
    * delete the staged delete-keys first, then upsert — staged rows replace
    * current rows on key conflict, all other current rows survive. This is
    * what the generated `DELETE` + `INSERT … ON CONFLICT DO UPDATE` pair
    * does on the server, so the gate checks the sink's semantics end-to-end
    * without a live PG (statement text stays unit-tested).
    */
  def simulateMerge(cur: DataFrame, stage: DataFrame, deletes: DataFrame,
                    key: String): DataFrame = {
    val afterDel = cur.join(deletes.select(key), Seq(key), "left_anti")
    stage.unionByName(
      afterDel.join(stage.select(key), Seq(key), "left_anti"))
  }

  /** Gate scenario over `orders` keyed on `o_orderkey`: the stage updates
    * keys ≡0 (mod 10) at price+10 and inserts re-keyed copies of keys ≡0
    * (mod 17); keys ≡0 (mod 13) are deleted. The oracle recomputes the
    * merge independently in SQL.
    */
  def jdbcUpsertMerge(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val k = col("o_orderkey")
    val stage = o.filter(k % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
      .unionByName(o.filter(k % 17 === 0)
        .withColumn("o_orderkey", k + 200000L))
    val deletes = o.filter(k % 13 === 0).select("o_orderkey")
    simulateMerge(o, stage, deletes, "o_orderkey").orderBy("o_orderkey")
  }

  val jdbcUpsertMergeSql: String = """
    WITH stage AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 10.0 AS o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 200000, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 17 = 0),
    after_del AS (
      SELECT * FROM orders
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders
                               WHERE o_orderkey % 13 = 0)),
    merged AS (
      SELECT * FROM stage
      UNION ALL
      SELECT * FROM after_del
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM stage))
    SELECT * FROM merged ORDER BY o_orderkey"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "jdbc_upsert" -> (jdbcUpsertMerge _))

  val oracles: Map[String, String] = Map(
    "jdbc_upsert" -> jdbcUpsertMergeSql)
}
