package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

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
    *
    * The stamping pass runs at the InternalRow level (`queryExecution.toRdd`
    * in, graftshim.InternalDf out) — the page counter needs only the group
    * column's ordinal, so the per-row cost is one (boxed) field read and a
    * mutable JoinedRow wrap: zero external-row serde, no per-row Row/Seq
    * construction (the group value is deep-copied only when the group
    * CHANGES — the sorter reuses its row buffer, so a retained value must
    * be cloned).
    * A window `row_number()` would express the same arithmetic declaratively
    * but WindowExec buffers each partitionBy group (spilling at scale) —
    * here a scroll group is export-sized, and this pass streams in O(1).
    */
  def withPages(df: DataFrame, groupCol: String, orderCols: Seq[String], pageSize: Int): DataFrame = {
    require(pageSize > 0, s"pageSize must be positive, got $pageSize")
    require(orderCols.nonEmpty, "orderCols must define a total order within a group")
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val outSchema = df.schema.add("page", LongType, nullable = false)
    val gi = df.schema.fieldIndex(groupCol)
    val gdt = df.schema(gi).dataType
    // group-change detection below compares the incoming row's value to a
    // RETAINED previous value, which is only sound for types we know how to
    // deep-copy out of the sorter's reused buffer (UTF8String.clone, byte[]
    // copy) and compare by value. Struct/array/map group keys would alias
    // the buffer (boundaries silently missed) — reject them up front; the
    // documented contract is a scalar group key anyway.
    require(gdt match {
      case _: org.apache.spark.sql.types.StructType => false
      case _: org.apache.spark.sql.types.ArrayType => false
      case _: org.apache.spark.sql.types.MapType => false
      case _ => true
    }, s"groupCol '$groupCol' must be a scalar type, got $gdt")
    val ps = pageSize.toLong
    val sorted = df.repartition(p, col(groupCol))
      .sortWithinPartitions((groupCol +: orderCols).map(col): _*)
    val stamped = sorted.queryExecution.toRdd.mapPartitions { it =>
      new Iterator[InternalRow] {
        private var curGroup: Any = null
        private var started = false
        private var inGroup = 0L
        private val pageRow = new SpecificInternalRow(Seq(LongType))
        private val joined = new JoinedRow
        def hasNext: Boolean = it.hasNext
        private def sameGroup(a: Any, b: Any): Boolean = (a, b) match {
          case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
          case _ => java.util.Objects.equals(a, b)
        }
        def next(): InternalRow = {
          val r = it.next()
          val g = r.get(gi, gdt)
          if (!started || !sameGroup(g, curGroup)) {
            // deep-copy buffer-backed values — the sorter reuses its row
            // buffer, so a retained UTF8String/byte[] view would mutate
            curGroup = g match {
              case u: UTF8String => u.clone()
              case a: Array[Byte] => java.util.Arrays.copyOf(a, a.length)
              case x => x
            }
            started = true
            inGroup = 0L
          }
          pageRow.setLong(0, inGroup / ps)
          inGroup += 1
          joined(r, pageRow)
        }
      }
    }
    org.apache.spark.sql.graftshim.InternalDf(spark, stamped, outSchema)
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
