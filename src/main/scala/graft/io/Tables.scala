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
}
