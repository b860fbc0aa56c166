package graft

import graft.driver.DocumentsIndex
import graft.ops.{GeoOps, JoinFieldOps, MetricAggs, PipelineAggs}
import graft.query.Bm25
import graft.tokenize.CodeTokenizer
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Gates for the round-6 API-surface ring: terms_set, match_bool_prefix,
  * _count, _termvectors, diversified_sampler (driver corpus — brute
  * recomputation from raw tokenization), and the agg family additions
  * (children, geo_bounds/centroid, date_range, cumulative_cardinality,
  * t_test, rate) on hand-computable fixtures.
  */
class ApiSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/documents.parquet").exists()

  // brute corpus model straight from the raw text — never another engine path
  private lazy val toksById: Map[Long, Array[String]] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) => id -> CodeTokenizer.tokenize(t) }.toMap
  private lazy val nDocs = toksById.size.toLong
  private lazy val avgDl = toksById.valuesIterator.map(_.length.toLong).sum.toDouble / nDocs
  private def dfOf(t: String): Long = toksById.valuesIterator.count(_.contains(t)).toLong
  private def bm25Of(id: Long, t: String): Double = {
    val ts = toksById(id)
    val tf = ts.count(_ == t).toLong
    if (tf == 0) 0.0
    else Bm25.idf(nDocs, dfOf(t)) * Bm25.tfNorm(tf, ts.length.toLong, avgDl, Bm25.Default)
  }
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("terms_set: >= m distinct present terms gate; score == brute sum of PRESENT clauses") {
    assume(haveData, s"$sfDir not mounted")
    val terms = Seq("merge", "vector", "window")
    val got = DocumentsIndex.termsSetQuery(spark, sfDir, terms, 2)
      .as[(Long, Double)].collect().toMap
    val want = toksById.keysIterator
      .filter(id => terms.count(toksById(id).contains) >= 2)
      .map(id => id -> round6(terms.sorted.foldLeft(0.0)((a, t) => a + bm25Of(id, t))))
      .toMap
    assert(got == want, s"terms_set mismatch: ${(got.toSet -- want.toSet).take(3)}")
    // floor above the set size matches nothing
    assert(DocumentsIndex.termsSetQuery(spark, sfDir, terms, 4).count() == 0)
  }

  test("match_bool_prefix: BM25(init) + constant-1 prefix clause, either side alone matches") {
    assume(haveData, s"$sfDir not mounted")
    val got = DocumentsIndex.matchBoolPrefix(spark, sfDir, "hash jo")
      .as[(Long, Double)].collect().toMap
    val want = toksById.keysIterator.flatMap { id =>
      val h = bm25Of(id, "hash")
      val p = if (toksById(id).exists(_.startsWith("jo"))) 1.0 else 0.0
      if (h == 0.0 && p == 0.0) None else Some(id -> round6(h + p))
    }.toMap
    assert(got == want, s"bool_prefix mismatch (sizes ${got.size}/${want.size})")
    // prefix-only docs (no 'hash') must sit at exactly the constant score
    val prefixOnly = want.filter { case (id, _) => !toksById(id).contains("hash") }
    assert(prefixOnly.nonEmpty && prefixOnly.values.forall(_ == 1.0),
      "prefix-only docs must score exactly 1.0")
  }

  test("_count == brute distinct matching-doc count; zero for absent terms") {
    assume(haveData, s"$sfDir not mounted")
    val got = DocumentsIndex.countMatches(spark, sfDir, "spark stream")
      .as[Long].head()
    val want = toksById.valuesIterator
      .count(ts => ts.contains("spark") || ts.contains("stream")).toLong
    assert(got == want)
    assert(DocumentsIndex.countMatches(spark, sfDir, "qqqzzznotfound").as[Long].head() == 0L)
  }

  test("_termvectors doc 42 == brute (tf, corpus df, sorted positions)") {
    assume(haveData, s"$sfDir not mounted")
    val got = DocumentsIndex.termVectors(spark, sfDir, 42L)
      .as[(String, Long, Long, String)].collect().toSeq
    val toks = toksById(42L)
    val want = toks.zipWithIndex.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (t, ps) => (t, ps.length.toLong, dfOf(t), ps.map(_._2).sorted.mkString(","))
    }
    assert(got == want, s"termvectors mismatch: ${got.take(2)} vs ${want.take(2)}")
    // tf sum over the vector == dl — nothing dropped
    assert(got.map(_._2).sum == toks.length.toLong)
  }

  test("diversified_sampler: top-shardSize protocol sample, <= maxPerValue per lang, best kept") {
    assume(haveData, s"$sfDir not mounted")
    val got = DocumentsIndex.diversifiedSample(spark, sfDir, "query sort", 30, 2)
      .as[(Long, String, Double)].collect().toSeq
    val langs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect().toMap
    val ranked = toksById.keysIterator
      .map(id => (id, round6(Seq("query", "sort").foldLeft(0.0)((a, t) => a + bm25Of(id, t)))))
      .filter(_._2 > 0.0).toSeq
      .sortBy { case (id, s) => (-s, id) }.take(30)
    val want = ranked.groupBy(p => langs(p._1)).toSeq.flatMap { case (lg, rows) =>
      rows.sortBy { case (id, s) => (-s, id) }.take(2).map { case (id, s) => (id, lg, s) }
    }.sortBy { case (id, _, s) => (-s, id) }
    assert(got == want, s"diversified sample mismatch: ${got.take(3)} vs ${want.take(3)}")
    assert(got.groupBy(_._2).values.forall(_.size <= 2))
  }

  test("children agg: per parent bucket child count/avg; orphan children drop (inner join)") {
    val parents = Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
    val children = Seq((1L, 10.0), (1L, 20.0), (2L, 30.0), (99L, 5.0))
      .toDF("user_id", "value")
    val got = JoinFieldOps.childrenAgg(parents, "doc_id", "lang", children, "user_id", "value")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("de", 1L, 30.0), ("en", 2L, 15.0)), s"children agg: $got")
  }

  test("geo_bounds + geo_centroid: hand points") {
    val pts = Seq((10.0, -20.0), (30.0, 40.0), (-5.0, 170.0)).toDF("lat", "lon")
    val b = GeoOps.geoBounds(pts, "lat", "lon")
      .as[(Double, Double, Double, Double)].head()
    assert(b == ((30.0, -20.0, -5.0, 170.0)), s"bounds: $b")
    val c = GeoOps.geoCentroid(pts, "lat", "lon").as[(Double, Double, Long)].head()
    assert(c == ((11.6667, 63.3333, 3L)), s"centroid: $c")
  }

  test("date_range: half-open [from, to) edges, every requested range kept even when empty") {
    def ev(d: String, v: Double) = (Timestamp.valueOf(s"$d 00:00:00"), v)
    val edges = Seq("2024-01-10", "2024-01-20")
    // boundary event at exactly 01-10 belongs to the MIDDLE bucket (>= from)
    val df = Seq(ev("2024-01-05", 1.0), ev("2024-01-10", 2.0), ev("2024-01-25", 4.0))
      .toDF("ts", "value")
    val got = MetricAggs.dateRangeAgg(df, "ts", "value", edges)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("*-2024-01-10", 1L, 1.0),
      ("2024-01-10-2024-01-20", 1L, 2.0), ("2024-01-20-*", 1L, 4.0)), s"date_range: $got")
    // empty middle range stays present at 0
    val sparse = Seq(ev("2024-01-05", 1.0), ev("2024-01-25", 4.0)).toDF("ts", "value")
    val got2 = MetricAggs.dateRangeAgg(sparse, "ts", "value", edges)
      .as[(String, Long, Double)].collect().toSeq
    assert(got2(1) == (("2024-01-10-2024-01-20", 0L, 0.0)), s"empty range: ${got2(1)}")
  }

  test("cumulative_cardinality: exact running distinct via first-seen; no-new days keep rows") {
    def ev(d: String, u: Long) = (Timestamp.valueOf(s"$d 12:00:00"), u)
    val df = Seq(ev("2024-01-01", 1L), ev("2024-01-01", 2L),
      ev("2024-01-02", 1L), // day 2: events but NO new users
      ev("2024-01-03", 3L), ev("2024-01-03", 1L)).toDF("ts", "user_id")
    val got = PipelineAggs.cumulativeCardinality(df, "ts", "user_id")
      .select(col("day").cast("string"), col("n_new"), col("cum_keys"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("2024-01-01", 2L, 2L), ("2024-01-02", 0L, 2L),
      ("2024-01-03", 1L, 3L)), s"cum cardinality: $got")
  }

  test("t_test == hand-computed Welch t over two fixed samples") {
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++ Seq(2.0, 4.0, 6.0, 8.0).map(("b", _)))
      .toDF("g", "v")
    val t = MetricAggs.tTest(df, "v", "g", "a", "b").as[Double].head()
    // m1=2 v1=1 n1=3; m2=5 v2=20/3 n2=4 → t = -3/sqrt(1/3 + 5/3) = -3/sqrt(2)
    val want = BigDecimal(-3.0 / math.sqrt(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(t == want, s"t: $t vs $want")
  }

  test("rate: weekly buckets rescaled to per-day by exactly 7") {
    def ev(d: String, v: Double) = (Timestamp.valueOf(s"$d 00:00:00"), v)
    // 2024-01-01 is a Monday: first ISO week = Jan 1-7, second = Jan 8-14
    val df = Seq(ev("2024-01-02", 7.0), ev("2024-01-03", 7.0), ev("2024-01-06", 7.0),
      ev("2024-01-09", 14.0)).toDF("ts", "value")
    val got = MetricAggs.rateAgg(df, "ts", "value")
      .select(col("week").cast("string"), col("docs_per_day"), col("value_per_day"))
      .as[(String, Double, Double)].collect().toSeq
    assert(got == Seq(("2024-01-01", 3.0 / 7.0, 3.0), ("2024-01-08", 1.0 / 7.0, 2.0)),
      s"rate: $got")
  }
}
