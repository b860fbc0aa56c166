package graft

import graft.ops.MetricAggs
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Brute-force gates for the ES metric-agg family (value_count/missing,
  * string_stats, median_absolute_deviation, boxplot, matrix_stats,
  * auto_date_histogram) on hand-computable fixtures.
  */
class MetricAggsSpec extends SparkSpec {
  import spark.implicits._

  test("value_count + missing partition the bucket exactly; absent field counts fully missing") {
    val df = Seq(("g1", Some(1.0)), ("g1", None), ("g1", Some(2.0)),
      ("g2", None), ("g2", None)).toDF("g", "v")
    val got = MetricAggs.valueCountMissing(df, "v", "g")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("g1", 2L, 1L), ("g2", 0L, 2L)), s"value_count: $got")
    // invariant: value_count + missing == bucket doc count, always
    val sums = got.map(t => t._2 + t._3)
    assert(sums == Seq(3L, 2L))
  }

  test("string_stats: hand-computed entropy + length stats; uniform two-char pool gives H = 1") {
    // pooled chars: a,a,b + b = {a:2, b:2} → H = 1.0 exactly
    val df = Seq(("g", "aab"), ("g", "b")).toDF("lang", "s")
    val got = MetricAggs.stringStats(df, "s", "lang")
      .as[(String, Long, Int, Int, Double, Double)].head()
    assert(got == (("g", 2L, 1, 3, 2.0, 1.0)), s"string_stats: $got")
    // 4-symbol uniform → H = 2; skewed {a:3, b:1} → H = 2 - 0.75·log2(3)
    val uni = Seq(("u", "abcd")).toDF("lang", "s")
    assert(MetricAggs.stringStats(uni, "s", "lang")
      .select("entropy").as[Double].head() == 2.0)
    val skew = Seq(("k", "aaab")).toDF("lang", "s")
    val h = MetricAggs.stringStats(skew, "s", "lang")
      .select("entropy").as[Double].head()
    val want = BigDecimal(2.0 - 0.75 * (math.log(3.0) / math.log(2.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(h == want, s"skewed entropy: $h vs $want")
  }

  test("median_absolute_deviation == median of |x - median|, interpolated; broadcast plan") {
    // vals 1,2,4,100: median 3.0; |d| = 2,1,1,97 → sorted 1,1,2,97 → mad 1.5
    val df = Seq(1, 2, 4, 100).map(("g", _)).toDF("g", "x")
    val m = MetricAggs.medianAbsoluteDeviation(df, "x", "g")
    assert(m.as[(String, Double)].head() == (("g", 1.5)))
    assert(m.queryExecution.executedPlan.toString.contains("Broadcast"),
      "group medians must broadcast back into the deviation pass")
    // constant series → mad 0
    val const = Seq(5, 5, 5).map(("g", _)).toDF("g", "x")
    assert(MetricAggs.medianAbsoluteDeviation(const, "x", "g")
      .as[(String, Double)].head()._2 == 0.0)
  }

  test("boxplot == exact quartiles over [1,3,5,7,9]; doubles throughout") {
    val df = Seq(1, 3, 5, 7, 9).map(("g", _)).toDF("g", "x")
    val b = MetricAggs.boxplot(df, "x", "g")
      .as[(String, Double, Double, Double, Double, Double)].head()
    assert(b == (("g", 1.0, 3.0, 5.0, 7.0, 9.0)), s"boxplot: $b")
    assert(MetricAggs.boxplot(df, "x", "g").schema.fields
      .drop(1).forall(_.dataType.typeName == "double"))
  }

  test("matrix_stats: perfectly linear pair pins corr 1, covar/var by hand") {
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y")
    val m = MetricAggs.matrixStats(df, "x", "y")
      .as[(Long, Double, Double, Double, Double, Double, Double)].head()
    assert(m == ((3L, 2.0, 4.0, 0.6667, 2.6667, 1.3333, 1.0)), s"matrix_stats: $m")
    // anti-correlated pair
    val anti = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("x", "y")
    assert(MetricAggs.matrixStats(anti, "x", "y")
      .select("correlation").as[Double].head() == -1.0)
  }

  test("auto_date_histogram picks the finest fitting rung; coarsest as fallback; interval pinned as a column") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      ts("2024-01-01 01:10:00"), ts("2024-01-01 01:40:00"),
      ts("2024-01-01 05:00:00"), ts("2024-01-02 09:30:00"))
      .map(Tuple1(_)).toDF("ts")
    // 3 distinct hours ≤ 10 → hour
    val hr = MetricAggs.autoDateHistogram(df, "ts", 10)
      .as[(Timestamp, Long, String)].collect().toSeq
    assert(hr.forall(_._3 == "hour") && hr.map(_._2) == Seq(2L, 1L, 1L), s"hour: $hr")
    // 3 hours > 2, 2 days ≤ 2 → day
    val day = MetricAggs.autoDateHistogram(df, "ts", 2)
      .as[(Timestamp, Long, String)].collect().toSeq
    assert(day.forall(_._3 == "day") && day.map(_._2) == Seq(3L, 1L), s"day: $day")
    // nothing fits → coarsest rung (month), never an error
    val mo = MetricAggs.autoDateHistogram(df, "ts", 1)
      .as[(Timestamp, Long, String)].collect().toSeq
    assert(mo == Seq((ts("2024-01-01 00:00:00"), 4L, "month")), s"month: $mo")
    intercept[IllegalArgumentException](MetricAggs.autoDateHistogram(df, "ts", 0))
  }

  test("scripted_metric: Aggregator map/combine/reduce == brute RMS; nulls never reach the map script") {
    val df = Seq(
      ("a", Option(3.0)), ("a", Option(4.0)),
      ("b", Option(5.0)), ("b", Option.empty[Double]), ("b", Option(12.0)))
      .toDF("g", "v")
    val got = MetricAggs.scriptedMetric(df, "v", "g").as[(String, Double)].collect().toSeq
    // a: sqrt((9+16)/2) = 3.5355; b: sqrt((25+144)/2) = 9.1924 — the null drops
    assert(got == Seq(("a", 3.5355), ("b", 9.1924)), s"scripted_metric: $got")
    // 16 input partitions: combine_script (merge) must fold partials associatively
    val big = spark.range(0, 1000, 1, 16)
      .select(lit("k").as("g"), col("id").cast("double").as("v"))
    val rms = MetricAggs.scriptedMetric(big, "v", "g").as[(String, Double)].head()._2
    val brute = math.sqrt((0 until 1000).map(i => i.toDouble * i).sum / 1000)
    assert(math.abs(rms - brute) < 5e-5, s"partitioned RMS $rms vs brute $brute")
  }

  test("histogram extended_bounds + min_doc_count=0: axis covers data ∪ bounds, zero-filled") {
    val df = Seq(5.0, 7.0, 31.0, 99.0).toDF("v")
    // bounds INSIDE the data span: the axis is data-driven, interior gaps zero-fill
    val tight = MetricAggs.histogramBounds(df, "v", 10L, 20L, 40L)
      .as[(Long, Long)].collect().toSeq
    val wantTight = (0L to 9L).map(b => (b * 10, b match {
      case 0 => 2L; case 3 => 1L; case 9 => 1L; case _ => 0L
    }))
    assert(tight == wantTight, s"tight: $tight")
    // bounds BEYOND the data on both sides, negative floor included
    val wide = MetricAggs.histogramBounds(df, "v", 10L, -25L, 120L)
      .as[(Long, Long)].collect().toSeq
    assert(wide.size == 16 && wide.head == ((-30L, 0L)) && wide.last == ((120L, 0L)),
      s"wide axis: $wide")
    assert(wide.toMap.apply(0L) == 2L && wide.toMap.apply(30L) == 1L)
    intercept[IllegalArgumentException](MetricAggs.histogramBounds(df, "v", 0L, 0L, 1L))
    intercept[IllegalArgumentException](MetricAggs.histogramBounds(df, "v", 10L, 5L, -5L))
  }
}
