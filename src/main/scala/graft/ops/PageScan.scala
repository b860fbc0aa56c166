package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Page-batched scan (SURVEY.md §2.1 A2): the reference's `esfatgenerator`
  * yields whole scroll PAGES (fixed-size batches of documents) so a worker
  * pool processes a page at a time. Spark analog: a deterministic
  * group-then-page assignment — rows exchange on a caller-chosen numeric
  * group key (the scroll slice), sort within the partition, and a stateful
  * per-partition pass stamps each row with its page index inside its group.
  * Downstream per-page work then runs as ordinary aggregation or
  * mapPartitions over (group, page) batches.
  *
  * Determinism contract: `groupCol` must be a pure function of the row (the
  * caller picks it — e.g. `key % nSlices`) and `orderCols` must be a total
  * order within a group; then (group, page) is reproducible across runs and
  * engines — unlike spark_partition_id-based paging, an external oracle can
  * recompute it (row_number() OVER (PARTITION BY group ORDER BY ...)).
  */
object PageScan {
  /** Append a `page` column: the 0-based page index of the row within its
    * group under `orderCols`, pages of `pageSize` rows.
    */
  def withPages(df: DataFrame, groupCol: String, orderCols: Seq[String], pageSize: Int): DataFrame = {
    require(pageSize > 0, s"pageSize must be positive, got $pageSize")
    require(orderCols.nonEmpty, "orderCols must define a total order within a group")
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val outSchema = df.schema.add("page", LongType, nullable = false)
    val gi = df.schema.fieldIndex(groupCol)
    df.repartition(p, col(groupCol))
      .sortWithinPartitions((groupCol +: orderCols).map(col): _*)
      .mapPartitions { it =>
        var curGroup: Any = null
        var started = false
        var inGroup = 0L
        it.map { r =>
          val g = r.get(gi)
          if (!started || g != curGroup) { curGroup = g; started = true; inGroup = 0L }
          val page = inGroup / pageSize
          inGroup += 1
          Row.fromSeq(r.toSeq :+ page)
        }
      }(Encoders.row(outSchema))
  }

  /** Per-page stats over a long key column — the batched-export shape (one
    * output row per scroll page: how many docs, which key range).
    */
  def pageStats(df: DataFrame, groupCol: String, orderCols: Seq[String],
      pageSize: Int, keyCol: String): DataFrame =
    withPages(df, groupCol, orderCols, pageSize)
      .groupBy(col(groupCol), col("page"))
      .agg(count(lit(1)).as("n_rows"), min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"))
}
