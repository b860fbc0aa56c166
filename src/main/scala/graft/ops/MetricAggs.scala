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

  /** The pinned scripted_metric script: per-group RMS (root-mean-square)
    * of the value — state (Σv², n). Each Aggregator member IS one of ES's
    * four scripts: `zero` = init_script, `reduce` = map_script, `merge` =
    * combine_script, `finish` = reduce_script — the contract maps 1:1,
    * which is why Aggregator is the Spark-native home for user-scripted
    * aggregation (it compiles to a partial-aggregate plan with map-side
    * combine; the exchange moves one tiny state row per (partition, key),
    * never the inputs).
    */
  private object RmsScript
      extends org.apache.spark.sql.expressions.Aggregator[Double, (Double, Long), Double] {
    import org.apache.spark.sql.{Encoder, Encoders}
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), v: Double): (Double, Long) = (b._1 + v * v, b._2 + 1L)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) = (a._1 + b._1, a._2 + b._2)
    def finish(r: (Double, Long)): Double =
      if (r._2 == 0L) 0.0 else math.sqrt(r._1 / r._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** ES `scripted_metric` aggregation (ES reference:
    * search.aggregations.metrics.ScriptedMetric*): user-scripted
    * init/map/combine/reduce per bucket. Pinned script = [[RmsScript]]
    * (RMS of `valCol`), 4-dp protocol rounding like the variance family
    * (the Σv² fold order differs across engines/partitionings — sub-ulp,
    * absorbed). Groups whose every value is NULL never enter the typed
    * pipeline (ES maps only docs carrying the field); NULL values are
    * filtered before the map script, matching that semantics.
    */
  def scriptedMetric(df: DataFrame, valCol: String, groupCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(valCol).isNotNull)
      .select(col(groupCol).cast("string"), col(valCol).cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(RmsScript.toColumn.name("rms_raw"))
      .toDF(groupCol, "rms_raw")
      .select(col(groupCol), round(col("rms_raw"), 4).as("rms"))
      .orderBy(groupCol)
  }

  /** ES `histogram` aggregation with `extended_bounds` + `min_doc_count: 0`
    * (ES reference: search.aggregations.bucket.histogram.*): fixed-width
    * buckets where the emitted range is FORCED to cover
    * [min(data_min, bounds.min), max(data_max, bounds.max)] and empty
    * buckets appear with n = 0 — the shape chart clients depend on.
    * Plan: the per-bucket count agg (one combinable pass) left-joined to
    * the full bucket axis, which is the 1-row min/max aggregate exploded
    * through `sequence()` — pure plan, no driver collect, and the axis
    * side is bucket-count-sized (broadcastable) regardless of data scale.
    */
  def histogramBounds(df: DataFrame, valCol: String, width: Long,
      boundMin: Long, boundMax: Long): DataFrame = {
    require(width > 0, s"histogram width must be positive, got $width")
    require(boundMin <= boundMax, s"extended_bounds min $boundMin > max $boundMax")
    val bucket = floor(col(valCol) / width).cast("long")
    val counts = df.where(col(valCol).isNotNull)
      .groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n"))
    val axis = df.where(col(valCol).isNotNull).agg(
        least(floor(min(col(valCol)) / width).cast("long"),
          lit(Math.floorDiv(boundMin, width))).as("blo"),
        greatest(floor(max(col(valCol)) / width).cast("long"),
          lit(Math.floorDiv(boundMax, width))).as("bhi"))
      .select(explode(sequence(col("blo"), col("bhi"))).as("bucket"))
    axis.join(counts, Seq("bucket"), "left_outer")
      .select((col("bucket") * width).as("bucket_lo"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("bucket_lo")
  }

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
    // LEFT join: a group whose every value is empty/NULL has length stats
    // but no characters — ES still returns the bucket (entropy 0); an inner
    // join would drop it entirely
    lens.join(ent, Seq(groupCol), "left")
      .withColumn("entropy", coalesce(col("entropy"), lit(0.0)))
      .orderBy(groupCol)
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

  /** ES `percentile_ranks`: for each requested value, the percentage of
    * observed values ≤ it — the inverse lookup of `percentiles`. ES runs
    * t-digest; pinned EXACT here (the a24 exact/approx split): rank(x) =
    * 100 · |{v : v ≤ x}| / n, 4-dp protocol rounding. ONE combinable
    * aggregate computes every requested rank (one conditional sum per x —
    * the values list is query-sized), then the 1-row result unpivots to
    * (value, pct) rows through a literal-array explode — no second pass,
    * no window, nothing driver-side.
    */
  def percentileRanks(df: DataFrame, valCol: String,
      values: Seq[Double]): DataFrame = {
    require(values.nonEmpty, "percentile_ranks needs at least one value")
    require(values.distinct.size == values.size,
      s"percentile_ranks values must be distinct, got $values")
    val aggs = count(col(valCol)).as("n") +: values.zipWithIndex.map {
      case (x, i) => sum(when(col(valCol) <= x, 1L).otherwise(0L)).as(s"c$i")
    }
    val rows = values.zipWithIndex.map { case (x, i) =>
      struct(lit(x).as("value"),
        round(lit(100.0) * col(s"c$i") / col("n"), 4).as("pct"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.value").as("value"), col("r.pct").as("pct"))
      .orderBy("value")
  }

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
    // a NULL timestamp makes every `< hi` predicate NULL and would fall
    // through to the unbounded-top otherwise — ES drops docs missing the
    // field from EVERY range bucket (histogramBounds applies the same cut)
    val counts = df.where(col(tsCol).isNotNull).groupBy(key.as("range"))
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

  /** ES `frequent_item_sets` aggregation (8.4+ market-basket mining),
    * pinned v1 = size-2 itemsets: support(a, b) = |keys containing both a
    * and b| / |keys|, pairs kept at support ≥ `minSupport`, ordered
    * (support desc, a, b). ES mines general itemsets with Eclat over its
    * top doc buckets (approximate at scale); pairs are its overwhelmingly
    * common use and stay EXACT here. Plan shape — the part that matters at
    * 100 TB: candidates come from a per-key self-join of the DEDUPED
    * (key, item) frame, bounded by the per-key distinct-item count (the
    * item vocabulary, e.g. event types — small by construction), so
    * candidate rows grow LINEARLY in keys, never keys²; then one
    * map-side-combined count per pair and a broadcast 1-row total. The
    * support predicate applies to the 4-dp ROUNDED ratio (float protocol —
    * the boundary cannot flip on sub-ulp division noise).
    */
  def frequentPairs(df: DataFrame, keyCol: String, itemCol: String,
      minSupport: Double): DataFrame = {
    require(minSupport > 0.0 && minSupport <= 1.0,
      s"minSupport must be in (0, 1], got $minSupport")
    val ki = df.select(col(keyCol).as("k"), col(itemCol).as("item")).distinct()
    val total = ki.select(countDistinct("k").as("n_keys"))
    ki.as("x").join(ki.as("y"),
        col("x.k") === col("y.k") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("a"), col("y.item").as("b"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total)) // 1-row side — a scalar, not a cartesian
      .withColumn("support", round(col("n").cast("double") / col("n_keys"), 4))
      .where(col("support") >= minSupport)
      .select("a", "b", "n", "support")
      .orderBy(desc("support"), col("a"), col("b"))
  }
}
