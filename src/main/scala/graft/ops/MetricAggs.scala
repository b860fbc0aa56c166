package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ES METRIC aggregations beyond the count/sum/avg basics — `value_count` +
  * `missing`, `string_stats`, `median_absolute_deviation`, `boxplot`,
  * `matrix_stats`, `auto_date_histogram` (ES reference:
  * search.aggregations.metrics.*). Everything here is one or two map-side-
  * combinable aggregate passes over doc values — the shape that scales:
  * partials merge associatively across executors, no row-grain exchange
  * beyond the aggregate's own shuffle on the (low-cardinality) group key.
  *
  * Cross-engine float protocol: variance-family outputs round to 4 dp
  * (stable-vs-naive central-moment algorithms differ in the last bits),
  * means and interpolated quantiles to 6 dp, entropy to 4 dp.
  */
object MetricAggs {

  /** ES `value_count` + `missing` over a sparse field: value_count counts
    * the VALUES present in each bucket, missing counts the docs without
    * one. ES exposes them as two sibling aggs over the same field; they
    * are one combinable pass, so one frame serves both.
    */
  def valueCountMissing(df: DataFrame, valCol: String, groupCol: String): DataFrame =
    df.groupBy(groupCol).agg(
      count(col(valCol)).as("value_count"),
      count(when(col(valCol).isNull, 1)).as("missing"))
      .orderBy(groupCol)

  /** ES `string_stats` (show_distribution=false): per group — count /
    * min_length / max_length / avg_length of the values, plus the Shannon
    * entropy of the CHARACTER distribution pooled across all values.
    * Two aggregate passes at different grains (value, character) joined at
    * group grain; entropy via the fold-friendly identity
    * H = log2(T) − (Σ c·log2 c)/T so no per-char probability frame ever
    * materializes — both sums are plain combinable aggregates.
    */
  def stringStats(df: DataFrame, strCol: String, groupCol: String): DataFrame = {
    val lens = df.groupBy(groupCol).agg(
      count(col(strCol)).as("count"),
      min(length(col(strCol))).as("min_length"),
      max(length(col(strCol))).as("max_length"),
      round(avg(length(col(strCol))), 6).as("avg_length"))
    val perChar = df
      .select(col(groupCol), explode(split(col(strCol), "")).as("__ch"))
      .where(col("__ch") =!= "") // Java regex split keeps a trailing empty
      .groupBy(col(groupCol), col("__ch")).agg(count(lit(1)).as("__n"))
    val ent = perChar.groupBy(groupCol).agg(
      round(log2(sum(col("__n"))) -
        sum(col("__n") * log2(col("__n"))) / sum(col("__n")), 4).as("entropy"))
    lens.join(ent, Seq(groupCol)).orderBy(groupCol)
  }

  /** ES `median_absolute_deviation`: median(|x − median(x)|) per group —
    * EXACT two-pass here (group medians are a 1-row-per-group frame that
    * BROADCASTS back into the second pass). ES's single-pass t-digest
    * approximation is the 100 TB path, the same exact/approx split a24
    * pins for `percentiles`; `percentile(…, 0.5)` is the interpolated
    * median DuckDB `median` computes on numerics.
    */
  def medianAbsoluteDeviation(df: DataFrame, valCol: String,
      groupCol: String): DataFrame = {
    val med = df.groupBy(groupCol).agg(
      expr(s"percentile($valCol, 0.5)").as("__med"))
    df.join(broadcast(med), Seq(groupCol))
      .select(col(groupCol), abs(col(valCol) - col("__med")).as("__ad"))
      .groupBy(groupCol)
      .agg(round(expr("percentile(__ad, 0.5)"), 6).as("mad"))
      .orderBy(groupCol)
  }

  /** ES `boxplot`: min / q1 / q2 / q3 / max per group. ES runs t-digest;
    * pinned EXACT here (linear interpolation — the definition DuckDB
    * `quantile_cont` shares), the same split as a24/a41. One combinable
    * aggregate; min/max cast to double because ES reports the whole
    * boxplot in doubles.
    */
  def boxplot(df: DataFrame, valCol: String, groupCol: String): DataFrame =
    df.groupBy(groupCol).agg(
      min(col(valCol)).cast("double").as("min"),
      round(expr(s"percentile($valCol, 0.25)"), 6).as("q1"),
      round(expr(s"percentile($valCol, 0.50)"), 6).as("q2"),
      round(expr(s"percentile($valCol, 0.75)"), 6).as("q3"),
      max(col(valCol)).cast("double").as("max"))
      .orderBy(groupCol)

  /** ES `matrix_stats` over two numeric fields — pinned v1 surface: count,
    * per-field mean and population variance, covariance, Pearson
    * correlation (ES additionally reports skewness/kurtosis from the same
    * central-moment partials; out of the pinned surface, documented). ONE
    * map-side-combinable pass — Spark's covar_pop/corr/var_pop partials
    * merge associatively across executors, exactly the 100 TB shape.
    */
  def matrixStats(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("doc_count"),
      round(avg(col(xCol)), 6).as("mean_x"),
      round(avg(col(yCol)), 6).as("mean_y"),
      round(var_pop(col(xCol)), 4).as("var_x"),
      round(var_pop(col(yCol)), 4).as("var_y"),
      round(covar_pop(col(xCol), col(yCol)), 4).as("covariance"),
      round(corr(col(xCol), col(yCol)), 6).as("correlation"))

  /** The calendar ladder [[autoDateHistogram]] picks from — ES's full
    * ladder adds second/minute/year rungs; hour→day→month covers the
    * fixture's span and the pick logic is rung-count-independent.
    */
  val AutoDateLadder: Seq[String] = Seq("hour", "day", "month")

  /** ES `auto_date_histogram`: pick the FINEST calendar rounding whose
    * bucket count fits `targetBuckets` (falling back to the coarsest rung),
    * then date-histogram at that interval. The pick is ONE combinable
    * aggregate of per-rung distinct-bucket counts reduced on the driver —
    * coordinator-side in ES too, where shards report rounding info upward.
    * The chosen interval comes back AS A COLUMN so callers (and the
    * contract) pin the choice, not just the buckets.
    */
  def autoDateHistogram(df: DataFrame, tsCol: String,
      targetBuckets: Int): DataFrame = {
    require(targetBuckets >= 1, s"target buckets must be >= 1, got $targetBuckets")
    val counts = df.agg(
      countDistinct(date_trunc(AutoDateLadder.head, col(tsCol))).as("c0"),
      AutoDateLadder.tail.map(r =>
        countDistinct(date_trunc(r, col(tsCol))).as(s"c$r")): _*).head()
    val interval = AutoDateLadder.zipWithIndex
      .collectFirst { case (r, i) if counts.getLong(i) <= targetBuckets => r }
      .getOrElse(AutoDateLadder.last)
    df.groupBy(date_trunc(interval, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("interval", lit(interval))
      .orderBy("bucket")
  }

  /** ES `t_test` (type `heteroscedastic` — Welch's unpaired t, the ES
    * default): t = (m̄₁ − m̄₂) / √(s₁²/n₁ + s₂²/n₂) between the values of
    * two populations selected by a group column. ONE conditional aggregate
    * pass computes all six moments (ES runs the same two-filter shape over
    * its doc values); sample variance, like ES. Rounded 4 dp under the
    * variance-family protocol above.
    */
  def tTest(df: DataFrame, valueCol: String, groupCol: String,
      a: String, b: String): DataFrame = {
    val va = when(col(groupCol) === a, col(valueCol))
    val vb = when(col(groupCol) === b, col(valueCol))
    df.agg(avg(va).as("m1"), var_samp(va).as("v1"), count(va).as("n1"),
        avg(vb).as("m2"), var_samp(vb).as("v2"), count(vb).as("n2"))
      .select(round((col("m1") - col("m2")) /
        sqrt(col("v1") / col("n1") + col("v2") / col("n2")), 4).as("t_value"))
  }

  /** ES `date_range` aggregation: named half-open [from, to) buckets over a
    * timestamp, unbounded edges spelled `*` in the ES key style
    * ("*-2024-01-10", "2024-01-10-2024-01-20", "2024-01-20-*"). Every
    * REQUESTED range appears even when empty (count 0) — the same
    * static-key left join that keeps the geo_distance rings. One CASE
    * projection + one map-side-combined groupBy; `edges` must be sorted
    * ISO dates.
    */
  def dateRangeAgg(df: DataFrame, tsCol: String, valueCol: String,
      edges: Seq[String]): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted,
      s"date_range edges must be non-empty ascending ISO dates, got $edges")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = (("*" +: edges) :+ "*").sliding(2).map(p => (p.head, p(1))).toSeq
    val key = keys.tail.foldLeft(
        when(col(tsCol) < lit(edges.head).cast("timestamp"), s"*-${edges.head}")) {
      case (acc, (lo, "*")) => acc.otherwise(s"$lo-*")
      case (acc, (lo, hi)) =>
        acc.when(col(tsCol) < lit(hi).cast("timestamp"), s"$lo-$hi")
    }
    val counts = df.groupBy(key.as("range"))
      .agg(count(lit(1)).as("n"), round(sum(col(valueCol)), 2).as("sum_value"))
    keys.map { case (lo, hi) => s"$lo-$hi" }.toDF("range")
      .join(counts, Seq("range"), "left")
      .select(col("range"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy("range")
  }

  /** ES `rate` aggregation: per calendar bucket, the count and value sum
    * RESCALED to a smaller unit — here weekly buckets reported per day
    * (`unit: day` under a week date_histogram divides by exactly 7). The
    * division is one codegen'd projection after the ordinary histogram
    * agg; count/7 is IEEE-exact-identical in both engines, the value rate
    * rounds 4 dp over the engine-order sum.
    */
  def rateAgg(df: DataFrame, tsCol: String, valueCol: String): DataFrame =
    df.groupBy(date_trunc("week", col(tsCol)).cast("date").as("week"))
      .agg((count(lit(1)) / 7.0).as("docs_per_day"),
        round(sum(col(valueCol)) / 7.0, 4).as("value_per_day"))
      .orderBy("week")
}
