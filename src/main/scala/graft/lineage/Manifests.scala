package graft.lineage

import graft.io.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage / per-partition lineage manifests + counters (SURVEY.md §2.3
  * B12; BASELINE.json:6/14: "every stage writes per-partition lineage
  * manifests and counters so a killed job resumes from the last committed
  * checkpoint").
  *
  * Layout: `<indexDir>/lineage/<stage>/` is a parquet table committed AFTER
  * the stage's output tables. Rows with partitionId >= 0 describe one output
  * file each (row count + order-independent xxhash64 checksum); the single
  * partitionId == -1 row is the stage-level SUCCESS marker. A stage is
  * complete iff its marker row exists — so a kill between output write and
  * manifest commit safely re-runs the stage (output overwrite is idempotent).
  */
object Manifests {
  final case class ManifestRow(stage: String, partitionId: Int, file: String,
      inputRows: Long, outputRows: Long, checksum: Long, committedAtMs: Long, runId: String)

  private def manifestName(stage: String) = s"lineage/$stage"

  def isComplete(spark: SparkSession, base: String, stage: String): Boolean =
    Tables.exists(spark, base, manifestName(stage)) && {
      Tables.read(spark, base, manifestName(stage))
        .where(col("partitionId") === -1).limit(1).count() == 1
    }

  /** Commit the manifest for `stage`, fingerprinting each output table file. */
  def commit(spark: SparkSession, base: String, stage: String, runId: String,
      outputTables: Seq[String], inputRows: Long): Unit = {
    import spark.implicits._
    val now = System.currentTimeMillis()
    val perFile = outputTables.flatMap { t =>
      val df = Tables.read(spark, base, t)
      // bit_xor of row hashes: order-independent, overflow-free (ANSI mode).
      df.groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("rows"), expr("bit_xor(xxhash64(struct(*)))").as("checksum"))
        .collect()
        .sortBy(_.getString(0))
        .zipWithIndex
        .map { case (r, i) =>
          ManifestRow(stage, i, s"$t:${r.getString(0).split('/').last}",
            inputRows, r.getLong(1), r.getLong(2), now, runId)
        }
    }
    val outputRows = perFile.map(_.outputRows).sum
    val marker = ManifestRow(stage, -1, "SUCCESS", inputRows, outputRows, 0L, now, runId)
    Tables.write((perFile :+ marker).toDF(), base, manifestName(stage))
  }

  final case class StageResult(stage: String, skipped: Boolean, wallSec: Double)

  /** Run `body` unless the stage is already committed. `body` must write the
    * stage's output tables and return the stage's input row count; the
    * manifest commit is the stage's atomic completion point.
    */
  def runStage(spark: SparkSession, base: String, stage: String, runId: String,
      outputTables: Seq[String], force: Boolean = false)(body: => Long): StageResult = {
    if (!force && isComplete(spark, base, stage)) StageResult(stage, skipped = true, 0.0)
    else {
      val t0 = System.nanoTime()
      val inputRows = body
      commit(spark, base, stage, runId, outputTables, inputRows)
      StageResult(stage, skipped = false, (System.nanoTime() - t0) / 1e9)
    }
  }
}
