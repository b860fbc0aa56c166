package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage facade for all engine state tables (SURVEY.md §0.3, §7.5).
  *
  * The spec (BASELINE.json:14) targets Iceberg tables; this sandbox ships no
  * Iceberg runtime (SURVEY.md §0.3), so tables are parquet directories of the
  * exact same schema. Swapping to Iceberg is `format("iceberg")` + catalog
  * config here and nowhere else — all engine code goes through this facade.
  */
object Tables {
  def tablePath(base: String, name: String): String = s"$base/$name"

  def read(spark: SparkSession, base: String, name: String): DataFrame =
    spark.read.parquet(tablePath(base, name))

  /** Idempotent full-overwrite commit of one table — the reference's bulk
    * sink + retry logic (SURVEY.md §2.1 A5) collapses to deterministic
    * overwrite semantics.
    */
  def write(df: DataFrame, base: String, name: String): Unit =
    df.write.mode("overwrite").parquet(tablePath(base, name))

  def exists(spark: SparkSession, base: String, name: String): Boolean = {
    val p = new Path(tablePath(base, name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(p, "_SUCCESS"))
  }

  def delete(spark: SparkSession, base: String, name: String): Unit = {
    val p = new Path(tablePath(base, name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Keyed upsert (MERGE): rows of `updates` replace existing rows with the
    * same key and append otherwise — the reference's enrichment write-back
    * shape (bulk partial-update of documents already in the index,
    * SURVEY.md §2.2 A14). On Iceberg this facade becomes `MERGE INTO t USING
    * u ON keys WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT` (a
    * metadata-level row-delta commit); on plain parquet it is rewrite-and-
    * swap: survivors (anti-join on the keys — one shuffle of the target) +
    * updates land in a staging dir, which replaces the table only after its
    * _SUCCESS marker, so readers of the old table are never torn.
    *
    * Scale note: the anti-join shuffles the whole target once — the honest
    * cost of upsert WITHOUT a delta-capable format; at 100 TB you partition
    * the target and upsert only the touched partitions (or use Iceberg).
    */
  def upsert(spark: SparkSession, base: String, name: String,
      updates: DataFrame, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val staging = s"${name}__staging"
    val merged =
      if (!exists(spark, base, name)) updates
      else read(spark, base, name).join(updates.select(keys.map(org.apache.spark.sql.functions.col): _*),
        keys, "left_anti").unionByName(updates)
    write(merged, base, staging)
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    delete(spark, base, name)
    require(fs.rename(new Path(tablePath(base, staging)), new Path(tablePath(base, name))),
      s"upsert swap failed for $base/$name")
  }
}
