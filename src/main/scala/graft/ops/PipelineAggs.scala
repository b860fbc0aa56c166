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

  /** ES `stats_bucket` — and, as its projections, `avg_bucket` /
    * `min_bucket` / `sum_bucket`: one row of count/min/max/avg/sum of the
    * metric across ALL parent buckets. Null metrics (gap policy `skip`,
    * the ES default) fall out of every aggregate for free — `count` only
    * counts non-nulls. One partial-aggregable pass over the bucket frame.
    */
  def statsBucket(buckets: DataFrame, valCol: String): DataFrame =
    buckets.agg(
      count(col(valCol)).as("count"),
      min(col(valCol)).as("min"),
      max(col(valCol)).as("max"),
      avg(col(valCol)).as("avg"),
      sum(col(valCol)).as("sum"))

  /** ES `bucket_script`: a per-bucket computed metric over SIBLING metrics
    * of the same bucket (e.g. `errors / total`). Gap policy `skip` (the ES
    * default): a bucket where any input metric is missing emits no value —
    * spelled relationally as dropping rows whose script result is null
    * (null inputs propagate through Catalyst arithmetic). Pure row-local
    * projection: no exchange at all.
    */
  def bucketScript(buckets: DataFrame, script: Column, out: String): DataFrame =
    buckets.withColumn(out, script).where(col(out).isNotNull)

  /** ES `bucket_selector`: keep only buckets where the script predicate
    * holds. A null predicate (missing input metric) drops the bucket —
    * ES's gap policy `skip`. Row-local filter, no exchange.
    */
  def bucketSelector(buckets: DataFrame, predicate: Column): DataFrame =
    buckets.where(coalesce(predicate, lit(false)))

  /** ES `bucket_sort`: re-order the parent's bucket list by metric sort
    * keys and truncate with from/size (ES applies it coordinator-side to
    * the reduced list; `from` past the end yields no buckets, `size` < 0
    * keeps the tail unbounded). Callers pass a TIE-BROKEN sort (ES keeps
    * insertion order among ties; a relational frame has no insertion order
    * to keep, so a total order is required for determinism). The window is
    * single-partition by design — bucket grain, see the scale note above.
    */
  def bucketSort(buckets: DataFrame, sortCols: Seq[Column], from: Int = 0,
      size: Int = -1): DataFrame = {
    require(from >= 0, s"bucket_sort from must be >= 0, got $from")
    val w = Window.orderBy(sortCols: _*)
    val hi = if (size < 0) Long.MaxValue else from.toLong + size
    buckets.withColumn("__rk", row_number().over(w))
      .where(col("__rk") > from && col("__rk") <= hi)
      .orderBy("__rk")
      .drop("__rk")
  }

  /** ES `percentiles_bucket`: percentiles of the metric across the parent
    * buckets. ES computes these EXACTLY over the reduced bucket list (a
    * plain sorted-array interpolation, not the t-digest the document-grain
    * `percentiles` agg uses) — mapped to Spark's exact `percentile`
    * aggregate, whose linear interpolation is the same definition DuckDB
    * `quantile_cont` pins. Percents are whole numbers (column naming);
    * outputs rounded to 6 dp by protocol.
    */
  def percentilesBucket(buckets: DataFrame, valCol: String,
      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 0 && p <= 100),
      s"percents must be in [0,100], got $percents")
    buckets.agg(
      round(expr(s"percentile($valCol, ${percents.head / 100.0})"), 6).as(s"p${percents.head}"),
      percents.tail.map(p =>
        round(expr(s"percentile($valCol, ${p / 100.0})"), 6).as(s"p$p")): _*)
  }

  /** ES `normalize` pipeline agg: rescale the bucket metric. Methods
    * pinned: `percent_of_sum` (v / Σv) and `rescale_0_1`
    * ((v − min) / (max − min)). The 1-row global-stats frame BROADCASTS
    * into the bucket frame (maxBucket's shape — no window, no second pass);
    * a degenerate rescale range (max = min) is pinned to 0.0 for every
    * bucket (ES's normalizer would divide by zero there; the constant
    * series has no information to rescale).
    */
  def normalize(buckets: DataFrame, valCol: String, method: String,
      out: String): DataFrame = {
    val v = col(valCol).cast("double")
    val stats = buckets.agg(sum(v).as("__sum"), min(v).as("__min"), max(v).as("__max"))
    val scaled = method match {
      case "percent_of_sum" => v / col("__sum")
      case "rescale_0_1" =>
        when(col("__max") === col("__min"), lit(0.0))
          .otherwise((v - col("__min")) / (col("__max") - col("__min")))
      case other => throw new IllegalArgumentException(
        s"normalize method must be percent_of_sum or rescale_0_1, got $other")
    }
    buckets.crossJoin(broadcast(stats))
      .withColumn(out, scaled)
      .drop("__sum", "__min", "__max")
  }

  /** ES `cumulative_cardinality` over a day date_histogram: per day, the
    * running count of DISTINCT keys seen so far — EXACT, via the identity
    * |∪ buckets ≤ d| = |{keys whose FIRST day ≤ d}|: one map-side-
    * combinable min-agg per key (key grain, distributed), one count per
    * first-day (bucket grain), then the documented unpartitioned running
    * sum over bucket rows. ES computes this with merged HLL sketches and
    * is approximate; the first-day identity gives the exact answer with
    * the same distributed cost — divergence documented in its favor. Days
    * that bucket events but no first-seen keys keep their row (left join
    * against the day list, 0 new).
    */
  def cumulativeCardinality(df: DataFrame, tsCol: String,
      keyCol: String): DataFrame = {
    val days = df.select(to_date(col(tsCol)).as("day")).distinct()
    val newByDay = df.groupBy(col(keyCol))
      .agg(min(to_date(col(tsCol))).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(newByDay, Seq("day"), "left")
      .select(col("day"), coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("cum_keys", sum(col("n_new")).over(w))
      .orderBy("day")
  }
}
