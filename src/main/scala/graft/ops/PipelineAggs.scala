package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ES PIPELINE aggregations — second-pass transforms over a PARENT
  * aggregation's completed bucket list (`derivative`, `cumulative_sum`,
  * `max_bucket`; ES reference: search.aggregations.pipeline.*).
  *
  * Scale note — the unpartitioned Window here is deliberate, not a scale
  * bug: pipeline aggs consume the parent agg's OUTPUT (bucket grain — a
  * date_histogram over 100 TB still yields thousands of rows, not
  * billions), exactly like ES, where every pipeline agg runs coordinator-
  * side over the reduced bucket list. The expensive part is the parent
  * aggregation, which keeps its own distributed plan; the window adds one
  * single-partition exchange over bucket rows.
  *
  * Cross-engine float protocol: an ordered-frame window accumulates in the
  * frame's sort order in both engines, so sequential folds over identical
  * input doubles produce identical doubles; inputs arrive protocol-rounded
  * from the parent agg and outputs are rounded again by the caller.
  */
object PipelineAggs {

  /** ES `derivative`: per bucket, metric − previous bucket's metric under
    * the parent agg's key order. ES emits NO derivative for the first
    * bucket (nothing to subtract) — pinned here as dropping that bucket
    * from the output frame entirely (ES keeps the bucket sans the
    * derivative field; a relational frame has no per-row missing column).
    */
  def derivative(buckets: DataFrame, keyCol: String, valCol: String,
      out: String): DataFrame = {
    val w = Window.orderBy(col(keyCol))
    buckets
      .withColumn(out, col(valCol) - lag(col(valCol), 1).over(w))
      .where(col(out).isNotNull)
  }

  /** ES `cumulative_sum`: running total of the metric in the parent agg's
    * key order (every bucket kept — the first bucket's cumsum is its own
    * value).
    */
  def cumulativeSum(buckets: DataFrame, keyCol: String, valCol: String,
      out: String): DataFrame = {
    val w = Window.orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets.withColumn(out, sum(col(valCol)).over(w))
  }

  /** ES `serial_diff`: metric minus the metric `lag` buckets earlier in key
    * order (lag 1 IS the derivative; lag 7 removes weekly seasonality — the
    * ES use case). Buckets without a lagged partner are dropped, the ES
    * omission, as in [[derivative]].
    */
  def serialDiff(buckets: DataFrame, keyCol: String, valCol: String,
      lagN: Int, out: String): DataFrame = {
    require(lagN >= 1, s"serial_diff lag must be >= 1, got $lagN")
    val w = Window.orderBy(col(keyCol))
    buckets
      .withColumn(out, col(valCol) - lag(col(valCol), lagN).over(w))
      .where(col(out).isNotNull)
  }

  /** ES `moving_fn` with `MovingFunctions.unweightedAvg` (the moving
    * average): mean of the trailing `window` buckets INCLUDING the current
    * one, in key order. ES's default window is trailing-exclusive of
    * nothing (shift 0 = the window ends at the current bucket); partial
    * leading windows average what exists, exactly like ES. Integer metrics
    * divide exactly (sum and count are exact), so no protocol rounding is
    * needed on count-shaped inputs — the caller rounds value-shaped ones.
    */
  def movingAvg(buckets: DataFrame, keyCol: String, valCol: String,
      window: Int, out: String): DataFrame = {
    require(window >= 1, s"moving window must be >= 1, got $window")
    val w = Window.orderBy(col(keyCol)).rowsBetween(-(window - 1L), Window.currentRow)
    buckets.withColumn(out, avg(col(valCol)).over(w))
  }

  /** ES `max_bucket`: the bucket(s) whose metric is the maximum — ES
    * returns the max value plus the LIST of keys achieving it; here the
    * tied maxima come back as rows (key order), the relational spelling of
    * that keys array. Plan: the 1-row global max broadcasts into an
    * equi-filtering join — no window, no second full pass.
    */
  def maxBucket(buckets: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val mx = buckets.agg(max(col(valCol)).as("__mx"))
    buckets.join(broadcast(mx), col(valCol) === col("__mx"))
      .drop("__mx")
      .orderBy(keyCol)
  }
}
