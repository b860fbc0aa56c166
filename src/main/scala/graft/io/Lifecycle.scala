package graft.io

import org.apache.spark.sql.SparkSession

/** Index lifecycle DDL (SURVEY.md §2.1 A6): the reference toolchain
  * creates/deletes target ES indices and swaps serving aliases before and
  * after a bulk load. Spark analog: external tables over the storage
  * directories (catalog DDL only — no data moves) and views as aliases.
  *
  * The alias swap is the zero-downtime deploy primitive: build `idx_v2`,
  * then `aliasSwap("idx", "idx_v2")` — readers of `idx` atomically see the
  * new generation, and `idx_v1` can be dropped afterwards.
  */
object Lifecycle {
  private def checkIdent(name: String): Unit =
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid table identifier: $name")

  /** Register (or re-point) a table over an existing parquet directory. */
  def createOrReplaceTable(spark: SparkSession, name: String, parquetDir: String): Unit = {
    checkIdent(name)
    require(!parquetDir.contains("'"), s"invalid location: $parquetDir")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING parquet LOCATION '$parquetDir'")
  }

  /** Drop the catalog entry; data stays (external table). */
  def dropTable(spark: SparkSession, name: String): Unit = {
    checkIdent(name)
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  /** Point the serving alias at a table generation (ES _aliases analog). */
  def aliasSwap(spark: SparkSession, alias: String, target: String): Unit = {
    checkIdent(alias); checkIdent(target)
    spark.sql(s"CREATE OR REPLACE VIEW $alias AS SELECT * FROM $target")
  }

  def dropAlias(spark: SparkSession, alias: String): Unit = {
    checkIdent(alias)
    spark.sql(s"DROP VIEW IF EXISTS $alias")
  }

  def exists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)
}
