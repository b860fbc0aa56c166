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

  test("intervals any_of == brute sum of per-rule ordered-window start counts; dup leads rejected") {
    assume(haveData, s"$sfDir not mounted")
    val rules = Seq(("hash join", 1), ("sort merge", 0))
    val got = DocumentsIndex.intervalsAnyOf(spark, sfDir, rules)
      .as[(Long, Long)].collect().toMap
    def starts(ts: Array[String], t0: String, t1: String, gaps: Int): Long =
      ts.indices.count(i => ts(i) == t0 &&
        (i + 1 to math.min(ts.length - 1, i + 1 + gaps)).exists(j => ts(j) == t1)).toLong
    val want = toksById.flatMap { case (id, ts) =>
      val n = starts(ts, "hash", "join", 1) + starts(ts, "sort", "merge", 0)
      if (n > 0) Some(id -> n) else None
    }
    assert(got == want, s"intervals mismatch (sizes ${got.size}/${want.size})")
    intercept[IllegalArgumentException] {
      DocumentsIndex.intervalsAnyOf(spark, sfDir, Seq(("hash join", 0), ("hash sort", 1)))
    }
  }

  test("rank_eval == brute precision/MRR/DCG over the protocol top-10 vs the gold conjunction") {
    assume(haveData, s"$sfDir not mounted")
    val got = DocumentsIndex.rankEval(spark, sfDir, Seq("merge sort", "query window"), 10,
      Seq("dup")).as[(String, Double, Double, Double)].collect().toSeq
    val want = Seq("merge sort", "query window").map { q =>
      val qt = CodeTokenizer.tokenize(q).toSeq
      val top = toksById.keysIterator
        .map(id => (id, round6(qt.sorted.distinct.foldLeft(0.0)((a, t) => a + bm25Of(id, t)))))
        .filter(_._2 > 0.0).toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
      val gold = toksById.keysIterator
        .filter(id => (qt :+ "dup").forall(toksById(id).contains)).toSet
      val ranks = top.zipWithIndex.collect { case ((id, _), i) if gold(id) => i + 1 }
      // ES precision divides by RETRIEVED, not k (here both queries fill
      // their page, so retrieved == top.size)
      (q, round6(ranks.size.toDouble / top.size),
        round6(ranks.headOption.map(1.0 / _).getOrElse(0.0)),
        round6(ranks.map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0))).sum))
    }
    assert(got == want, s"rank_eval: $got vs $want")
    // the gold rule must actually discriminate at this corpus
    assert(got.exists(_._2 < 1.0), "precision@10 saturated — gold rule not discriminative")
  }

  test("runtime field == n_chars / dl over the top-10 page; min_score cuts the rounded frame") {
    assume(haveData, s"$sfDir not mounted")
    val chars = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].collect().toMap
    val got = DocumentsIndex.runtimeFieldSearch(spark, sfDir, "spark join", 10)
      .as[(Long, Double, Double)].collect().toSeq
    assert(got.size == 10)
    got.foreach { case (id, _, cpt) =>
      val want = BigDecimal(chars(id).toDouble / toksById(id).length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(cpt == want, s"chars_per_token doc $id: $cpt vs $want")
    }
    val ms = DocumentsIndex.minScoreSearch(spark, sfDir, "spark join", 0.2)
      .as[(Long, Double)].collect().toSeq
    val wantMs = toksById.keysIterator
      .map(id => (id, round6(Seq("join", "spark").foldLeft(0.0)((a, t) => a + bm25Of(id, t)))))
      .filter(_._2 >= 0.2).toSeq.sortBy { case (id, s) => (-s, id) }
    assert(ms == wantMs, s"min_score sizes ${ms.size}/${wantMs.size}")
    assert(ms.nonEmpty, "min_score row matches nothing — raise/lower the floor")
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

  test("multi_index: per-index corpus stats, global (score, idx, doc_id) order, k cut") {
    assume(haveData, s"$sfDir not mounted")
    // brute tags-index model straight from the raw columns (field = 'lang source')
    val tagsById: Map[Long, Array[String]] =
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), concat_ws(" ", col("lang"), col("source")).as("t"))
        .as[(Long, String)].collect()
        .map { case (id, t) => id -> CodeTokenizer.tokenize(t) }.toMap
    val tN = tagsById.size.toLong
    val tAvg = tagsById.valuesIterator.map(_.length.toLong).sum.toDouble / tN
    def tagsDf(t: String): Long = tagsById.valuesIterator.count(_.contains(t)).toLong
    def tagsBm25(id: Long, t: String): Double = {
      val ts = tagsById(id)
      val tf = ts.count(_ == t).toLong
      if (tf == 0) 0.0
      else Bm25.idf(tN, tagsDf(t)) * Bm25.tfNorm(tf, ts.length.toLong, tAvg, Bm25.Default)
    }
    val terms = Seq("en", "spark") // sorted — the engine's pinned fold order
    val textHits = toksById.keysIterator
      .filter(id => terms.exists(toksById(id).contains))
      .map(id => ("documents", id,
        round6(terms.foldLeft(0.0)((a, t) => a + bm25Of(id, t))))).toSeq
    val tagHits = tagsById.keysIterator
      .filter(id => terms.exists(tagsById(id).contains))
      .map(id => ("documents_tags", id,
        round6(terms.foldLeft(0.0)((a, t) => a + tagsBm25(id, t))))).toSeq
    assert(textHits.nonEmpty && tagHits.nonEmpty, "query must hit BOTH indexes")
    val want = (textHits ++ tagHits).sortBy { case (ix, id, s) => (-s, ix, id) }.take(10)
    val got = DocumentsIndex.multiIndexSearch(spark, sfDir, "en spark", 10)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == want, s"multi_index top-10: $got vs $want")
    // k <= 0 is the full union — one row per (index, hit)
    assert(DocumentsIndex.multiIndexSearch(spark, sfDir, "en spark", -1).count() ==
      (textHits.size + tagHits.size).toLong)
  }

  test("simple_query_string driver row: optional phrase+prefix, required term, prohibited term == brute") {
    assume(haveData, s"$sfDir not mounted")
    val idfSum = Bm25.idf(nDocs, dfOf("hash")) + Bm25.idf(nDocs, dfOf("join"))
    val got = DocumentsIndex.simpleQueryString(spark, sfDir,
      "\"hash join\" | quer* -merge +spark").as[(Long, Double)].collect().toMap
    val want = toksById.iterator.flatMap { case (id, ts) =>
      if (!ts.contains("spark") || ts.contains("merge")) None
      else {
        val ptf = (0 to ts.length - 2).count(i => ts(i) == "hash" && ts(i + 1) == "join")
        val ph = if (ptf == 0) 0.0
          else idfSum * Bm25.tfNorm(ptf.toLong, ts.length.toLong, avgDl, Bm25.Default)
        val pfx = if (ts.exists(_.startsWith("quer"))) 1.0 else 0.0
        Some(id -> round6(ph + pfx + bm25Of(id, "spark")))
      }
    }.toMap
    assert(got == want, s"simple_qs: ${(got.toSet -- want.toSet).take(3)} vs ${(want.toSet -- got.toSet).take(3)}")
    // the fixture must exercise the prefix and the exclusion non-trivially
    assert(want.valuesIterator.exists(_ >= 1.0), "prefix clause never fired")
    assert(toksById.valuesIterator.exists(ts => ts.contains("spark") && ts.contains("merge")),
      "exclusion clause never fired")
  }

  test("rrf: fused reciprocals over per-retriever windows == brute fusion; both retrievers contribute") {
    assume(haveData, s"$sfDir not mounted")
    val (window, rc, k) = (100, 60, 10)
    // text ranks brute from raw tokenization under the protocol order
    val terms = Seq("join", "spark")
    val textRank: Map[Long, Int] = toksById.keysIterator
      .filter(id => terms.exists(toksById(id).contains))
      .map(id => id -> round6(terms.foldLeft(0.0)((a, t) => a + bm25Of(id, t))))
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(window)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    // vector ranks from the cosine kernel (itself brute-gated in OpsSpec) —
    // this gate verifies the FUSION and windowing, not the cosine
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vecRank: Map[Long, Int] = graft.ops.VectorOps.cosineTopK(emb, 0L, window)
      .as[(Long, Double)].collect().toSeq
      .sortBy { case (id, c) => (-c, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val want = (textRank.keySet ++ vecRank.keySet).iterator.map { id =>
      val f = textRank.get(id).map(r => 1.0 / (rc + r)).getOrElse(0.0) +
        vecRank.get(id).map(r => 1.0 / (rc + r)).getOrElse(0.0)
      (id, round6(f))
    }.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
    val got = DocumentsIndex.rrfSearch(spark, sfDir, "spark join", 0L, window, rc, k)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"rrf top-$k: $got vs $want")
    // a hit fused from BOTH retrievers must exist in the window union
    assert((textRank.keySet & vecRank.keySet).nonEmpty, "no doc in both windows — fixture too sparse")
    intercept[IllegalArgumentException](DocumentsIndex.rrfSearch(spark, sfDir, "spark", 0L, 0))
  }

  test("collapse inner_hits: per-group protocol ranks, cut at 3, every matching group present") {
    assume(haveData, s"$sfDir not mounted")
    val terms = Seq("hash", "table")
    val langById = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect().toMap
    val scored = toksById.keysIterator
      .filter(id => terms.exists(toksById(id).contains))
      .map(id => (langById(id), id,
        round6(terms.foldLeft(0.0)((a, t) => a + bm25Of(id, t))))).toSeq
    val want = scored.groupBy(_._1).iterator.flatMap { case (lang, hits) =>
      hits.sortBy { case (_, id, s) => (-s, id) }.take(3).zipWithIndex
        .map { case ((_, id, s), i) => (lang, i + 1, id, s) }
    }.toSeq.sortBy { case (lang, r, _, _) => (lang, r) }
    val got = DocumentsIndex.collapseInnerHits(spark, sfDir, "hash table", 3)
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(got == want, s"collapse inner_hits: ${got.take(4)} vs ${want.take(4)}")
    assert(want.map(_._1).distinct.size > 1, "single group — fixture too sparse")
  }

  test("linear retriever: min-max window normalization + weighted fusion == brute") {
    assume(haveData, s"$sfDir not mounted")
    val (window, k, wT, wV) = (100, 10, 0.75, 0.25)
    def normalize(ranked: Seq[(Long, Double)]): Map[Long, Double] = {
      if (ranked.isEmpty) return Map.empty
      val (mn, mx) = (ranked.map(_._2).min, ranked.map(_._2).max)
      ranked.map { case (id, s) =>
        id -> (if (mx == mn) 0.0 else (s - mn) / (mx - mn))
      }.toMap
    }
    val terms = Seq("join", "spark")
    val textWin = toksById.keysIterator
      .filter(id => terms.exists(toksById(id).contains))
      .map(id => id -> round6(terms.foldLeft(0.0)((a, t) => a + bm25Of(id, t))))
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(window)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vecWin = graft.ops.VectorOps.cosineTopK(emb, 0L, window)
      .as[(Long, Double)].collect().toSeq
    val (tn, vn) = (normalize(textWin), normalize(vecWin))
    val want = (tn.keySet ++ vn.keySet).iterator
      .map(id => (id, round6(wT * tn.getOrElse(id, 0.0) + wV * vn.getOrElse(id, 0.0))))
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
    val got = DocumentsIndex.linearSearch(spark, sfDir, "spark join", 0L, wT, wV, window, k)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"linear top-$k: $got vs $want")
    intercept[IllegalArgumentException](
      DocumentsIndex.linearSearch(spark, sfDir, "spark", 0L, 0.0, 0.0))
  }

  test("suggest_mode: popular keeps strictly-more-frequent corrections; missing gates on input presence") {
    assume(haveData, s"$sfDir not mounted")
    val vocab = toksById.valuesIterator.flatten.toSeq.distinct
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def cands(q: String) = vocab.map(t => (t, lev(t, q).toLong, dfOf(t)))
      .filter { case (_, dist, _) => dist >= 1 && dist <= 2 }
    def top5(xs: Seq[(String, Long, Long)]) =
      xs.sortBy { case (t, dist, df) => (dist, -df, t) }.take(5)
    val always = DocumentsIndex.suggest(spark, sfDir, "part", 2, 5)
      .as[(String, Long, Long)].collect().toSeq
    assert(always == top5(cands("part")), s"always: $always")
    val popular = DocumentsIndex.suggest(spark, sfDir, "part", 2, 5, mode = "popular")
      .as[(String, Long, Long)].collect().toSeq
    assert(popular == top5(cands("part").filter(_._3 > dfOf("part"))), s"popular: $popular")
    assert(popular.size < always.size, "popular never filtered — fixture too sparse")
    // missing: input present in the index => no suggestions at all
    assert(DocumentsIndex.suggest(spark, sfDir, "part", 2, 5, mode = "missing").isEmpty)
    // missing with an ABSENT input behaves like always (df 0 gates nothing)
    val missAbsent = DocumentsIndex.suggest(spark, sfDir, "vectr", 2, 5, mode = "missing")
      .as[(String, Long, Long)].collect().toSeq
    assert(missAbsent == top5(cands("vectr")) && missAbsent.nonEmpty, s"missing-absent: $missAbsent")
    intercept[IllegalArgumentException](DocumentsIndex.suggest(spark, sfDir, "part", 2, 5, mode = "bogus"))
  }

  test("minimum_should_match spec: percentage floors, integers pass through, bad specs loud; engine == integer twin") {
    import graft.query.BoolMatcher.resolveMinShould
    assert(resolveMinShould("75%", 4) == 3)
    assert(resolveMinShould("50%", 3) == 1)
    assert(resolveMinShould("100%", 4) == 4)
    assert(resolveMinShould("0%", 4) == 0)
    assert(resolveMinShould("2", 5) == 2)
    for (bad <- Seq("-25%", "3<90%", "abc", "150%", "", "2 3"))
      intercept[IllegalArgumentException](resolveMinShould(bad, 4))
    assume(haveData, s"$sfDir not mounted")
    val should = Seq("join", "vector", "window", "stream")
    val got = DocumentsIndex.bm25BoolMsmSpec(spark, sfDir, Nil, should, "75%")
      .as[(Long, Double)].collect().toSeq
    val want = DocumentsIndex.bm25Bool(spark, sfDir, Nil, should, Nil, minShould = 3)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, "percentage spec must ride the identical integer-floor path")
    assert(got.nonEmpty)
  }
}
