package graft.etl

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** JDBC warehouse edge (S5/S6): the reference's actual sink is a SQL
  * database via SQLAlchemy (`/root/reference/src/load.py:79-84` append,
  * `:55-58` scan, engine from `/root/reference/src/config.py:16-19`); this
  * is the same surface over `spark.read/write.jdbc`, tested against
  * embedded Derby the way the reference tests run in-memory SQLite
  * (`/root/reference/tests/conftest.py:121-137`).
  *
  * The date column crosses the edge as ISO-8601 TEXT (L2 — the reference
  * stores `_to_date_str(date)`, `src/load.py:38,117`): `date_format` on
  * the way out, `to_date` on the way in; inside the engine it is always a
  * real `DateType`.
  *
  * Scale notes: scan and append are Spark's partitioned JDBC I/O (the
  * append runs one batched INSERT stream per partition). The UPDATE leg
  * runs batched prepared statements per partition, one transaction per
  * partition — a single global transaction over distributed writers would
  * need XA; the engine's own warehouse gets atomicity from
  * [[AtomicTable]]'s version-pointer commit instead. An RDBMS edge at
  * 100 TB is for serving aggregates, not the corpus.
  */
object Jdbc {

  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"
  val FactTable = "fact_economic_observations"
  val DimTable = "dim_series"

  def props(driver: String = DerbyDriver): Properties = {
    val p = new Properties()
    p.setProperty("driver", driver)
    p
  }

  /** DDL (S7, `src/load.py:5-24`): create the two warehouse tables if
    * absent. Column names are quoted lowercase ("date" and "value" are SQL
    * reserved words; Spark's JDBC writer quotes identifiers the same way). */
  def ensureTables(url: String): Unit = {
    Class.forName(DerbyDriver)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        for (ddl <- Seq(
          s"""CREATE TABLE $FactTable (
             |  "series_id" VARCHAR(64) NOT NULL,
             |  "series_name" VARCHAR(256) NOT NULL,
             |  "date" VARCHAR(10) NOT NULL,
             |  "value" DOUBLE,
             |  "source" VARCHAR(16) NOT NULL,
             |  PRIMARY KEY ("series_id", "date"))""".stripMargin,
          s"""CREATE TABLE $DimTable (
             |  "series_id" VARCHAR(64) NOT NULL PRIMARY KEY,
             |  "series_name" VARCHAR(256) NOT NULL,
             |  "source" VARCHAR(16) NOT NULL)""".stripMargin)) {
          try st.executeUpdate(ddl)
          catch { // X0Y32: object already exists — idempotent DDL
            case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
          }
        }
      } finally st.close()
    } finally conn.close()
  }

  /** S6: scan the fact table back into engine types (text date → DateType). */
  def scanFact(spark: SparkSession, url: String): DataFrame =
    spark.read.jdbc(url, FactTable, props())
      .select(col("series_id"), col("series_name"),
        to_date(col("date")).as("date"), col("value"), col("source"))

  /** S6: scan the dim table. */
  def scanDim(spark: SparkSession, url: String): DataFrame =
    spark.read.jdbc(url, DimTable, props())
      .select(Schemas.dim.fieldNames.map(col): _*)

  /** Date → ISO text at the edge (L2), preserving column order. */
  private def atTextEdge(df: DataFrame): DataFrame =
    df.select(df.columns.map {
      case "date" => date_format(col("date"), "yyyy-MM-dd").as("date")
      case c => col(c)
    }: _*)

  /** S5: plain append (`src/load.py:79-84` `to_sql(if_exists="append")`). */
  def appendFact(df: DataFrame, url: String): Unit =
    atTextEdge(df.select(Schemas.fact.fieldNames.map(col): _*))
      .write.mode(SaveMode.Append).jdbc(url, FactTable, props())

  /** Fact upsert against the SQL warehouse, same classification as the
    * parquet path (`Merge.classify`): absent keys append via Spark's JDBC
    * writer; changed keys run as batched UPDATEs per partition
    * (`src/load.py:86-103`). Returns the reference's stats dict. */
  def mergeFact(spark: SparkSession, incoming: DataFrame, url: String): Map[String, Long] = {
    ensureTables(url)
    val existing = scanFact(spark, url)
    val keys = Seq("series_id", "date")
    val deduped = Merge.lastWinsByKey(incoming, keys, col("value").desc_nulls_last)
    val classified = Merge.classify(deduped, existing, keys, "value")
      .localCheckpoint(true) // classify once; reused by stats + both legs
    val stats = Merge.stats(classified)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    appendFact(classified.filter(col("action") === "insert").drop("action"), url)

    val updates = atTextEdge(
      classified.filter(col("action") === "update").drop("action")
        .select(Schemas.fact.fieldNames.map(col): _*))
    updates.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.hasNext) {
        Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false) // one transaction per partition
          val ps = conn.prepareStatement(
            s"""UPDATE $FactTable SET "value" = ?, "series_name" = ?, "source" = ?
               | WHERE "series_id" = ? AND "date" = ?""".stripMargin)
          try {
            rows.foreach { r =>
              val v = r.get(r.fieldIndex("value"))
              if (v == null) ps.setNull(1, java.sql.Types.DOUBLE)
              else ps.setDouble(1, v.asInstanceOf[Double])
              ps.setString(2, r.getString(r.fieldIndex("series_name")))
              ps.setString(3, r.getString(r.fieldIndex("source")))
              ps.setString(4, r.getString(r.fieldIndex("series_id")))
              ps.setString(5, r.getString(r.fieldIndex("date")))
              ps.addBatch()
            }
            ps.executeBatch()
            conn.commit()
          } finally ps.close()
        } finally conn.close()
      }
    }

    Map("inserted" -> 0L, "updated" -> 0L, "unchanged" -> 0L) ++
      stats.map { case (k, v) =>
        (k match { case "insert" => "inserted"; case "update" => "updated"; case o => o }) -> v
      }
  }

  /** Dim insert-if-absent over JDBC (`src/load.py:108-134`). */
  def mergeDim(spark: SparkSession, incoming: DataFrame, url: String): Map[String, Long] = {
    ensureTables(url)
    val newRows = Merge.insertIfAbsent(incoming, scanDim(spark, url), Seq("series_id"))
      .localCheckpoint(true)
    val inserted = newRows.count()
    if (inserted > 0)
      newRows.select(Schemas.dim.fieldNames.map(col): _*)
        .write.mode(SaveMode.Append).jdbc(url, DimTable, props())
    Map("inserted" -> inserted, "unchanged" -> (incoming.count() - inserted))
  }
}
