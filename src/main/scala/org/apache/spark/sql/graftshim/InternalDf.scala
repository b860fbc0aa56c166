package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one sanctioned drop below the public DataFrame surface on the OUTPUT
  * side: wrap an `RDD[InternalRow]` as a DataFrame without a per-row
  * external-Row round trip. `SparkSession.internalCreateDataFrame` is
  * `private[sql]`, hence this object's package. Callers (graft.ops.PageScan)
  * pair this with `queryExecution.toRdd` on the input side — the same
  * InternalRow-level treatment the postings block encoder uses — so a
  * stateful per-partition pass costs zero row serde and zero per-row
  * allocation instead of a `Row.fromSeq(r.toSeq :+ x)` per row.
  *
  * Contract inherited from Spark's internal row scans: the rows the RDD
  * yields MAY reuse buffers between `next()` calls; Catalyst's consuming
  * operators copy at pipeline breakers, exactly as they do for any
  * SparkPlan's output iterator.
  */
object InternalDf {
  def apply(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
