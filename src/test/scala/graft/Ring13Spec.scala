package graft

import graft.driver.DocumentsIndex
import graft.ops.MetricAggs
import graft.tokenize.CodeTokenizer
import org.apache.spark.sql.functions._

/** Gates for the ring-13 additions: terms_set (per-doc dynamic
  * minimum_should_match — brute recount, floor really discriminates),
  * span_multi-in-span_near (brute union-cover recount at slop ∈ {0, 2, 5},
  * overlap/bad-shape rejection), and percentile_ranks (brute exact
  * fractions, monotonicity, duplicate rejection).
  */
class Ring13Spec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/documents.parquet").exists()

  private lazy val toksById: Map[Long, Array[String]] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) => id -> CodeTokenizer.tokenize(t) }.toMap

  test("terms_set: brute recount against the per-doc floor; the floor discriminates") {
    assume(haveData, s"$sfDir not mounted")
    val terms = Set("hash", "join", "vector", "stream")
    val got = DocumentsIndex.termsSetMatch(spark, sfDir, terms.toSeq).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = toksById.toSeq.flatMap { case (id, ts) =>
      val n = terms.count(ts.contains).toLong
      val req = 1L + id % 3
      if (n >= req) Some((id, n, req)) else None
    }.sortBy(_._1)
    assert(got.toSeq == brute)
    // discrimination: some doc passes at floor 1 that a doc with the SAME
    // match count fails at floor 3 — the dynamic floor actually bites
    val byCount = toksById.map { case (id, ts) => id -> terms.count(ts.contains).toLong }
    val kept = got.map(_._1).toSet
    assert(byCount.exists { case (id, n) => n >= 1 && n < 1 + id % 3 && !kept.contains(id) },
      "no doc was cut by its per-doc floor — fixture lost discrimination")
    intercept[IllegalArgumentException] { DocumentsIndex.termsSetMatch(spark, sfDir, Nil) }
  }

  test("span_multi near: brute union-cover recount at slop 0/2/5; shapes rejected") {
    assume(haveData, s"$sfDir not mounted")
    for (slop <- Seq(0, 2, 5)) {
      val got = DocumentsIndex.spanMultiNear(spark, sfDir, "s", "join", slop)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val brute = toksById.flatMap { case (id, ts) =>
        val exp = ts.zipWithIndex.collect { case (t, p) if t.startsWith("s") => p }
        val oth = ts.zipWithIndex.collect { case (t, p) if t == "join" => p }
        if (exp.isEmpty || oth.isEmpty) None
        else {
          val gap = (for (a <- exp; b <- oth) yield math.abs(a - b) - 1).min.toLong
          if (gap <= slop) Some(id -> gap) else None
        }
      }
      assert(got == brute, s"slop=$slop: ${got.size} vs ${brute.size}")
    }
    // other ∈ expansion → overlapping spans, rejected loudly
    intercept[IllegalArgumentException] {
      DocumentsIndex.spanMultiNear(spark, sfDir, "jo", "join", 2)
    }
    intercept[IllegalArgumentException] {
      DocumentsIndex.spanMultiNear(spark, sfDir, "s", "join", -1)
    }
    // an expansion with no dictionary hits matches nothing
    assert(DocumentsIndex.spanMultiNear(spark, sfDir, "zzz", "join", 2).count() == 0L)
  }

  test("percentile_ranks: brute exact fractions, monotone in value, bad args loud") {
    assume(haveData, s"$sfDir not mounted")
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val vals = df.select(col("l_quantity").cast("double")).as[Double].collect()
    val ask = Seq(1.0, 10.0, 25.0, 49.0, 100.0)
    val got = MetricAggs.percentileRanks(df, "l_quantity", ask).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1))
    assert(got.map(_._1).toSeq == ask, "output ordered by value")
    got.foreach { case (x, pct) =>
      val want = math.rint(100.0 * vals.count(_ <= x) / vals.length * 1e4) / 1e4
      assert(math.abs(pct - want) <= 1e-9, s"rank($x)")
    }
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq, "monotone")
    assert(got.last._2 == 100.0, "a value above max ranks at 100")
    intercept[IllegalArgumentException] { MetricAggs.percentileRanks(df, "l_quantity", Nil) }
    intercept[IllegalArgumentException] {
      MetricAggs.percentileRanks(df, "l_quantity", Seq(1.0, 1.0)) }
  }

  test("significant_text: brute re-analysis JLH recount; dedup knob is a no-op here") {
    assume(haveData, s"$sfDir not mounted")
    val (q, sample, size) = ("vector stream", 30, 8)
    val got = DocumentsIndex.significantText(spark, sfDir, q, sample, size)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // brute: protocol top-sample via the engine search, texts from source,
    // exact-dup dedup (vacuous here — asserted), re-tokenize, JLH
    val top = DocumentsIndex.bm25(spark, sfDir, q, sample).collect().map(_.getLong(0))
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val fgTexts = top.map(texts)
    assert(fgTexts.distinct.length == fgTexts.length,
      "corpus grew duplicate texts — the no-op assertion below no longer holds")
    val n = fgTexts.length.toDouble
    val nd = texts.size.toDouble
    val df = toksById.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size.toLong)
    val want = fgTexts.flatMap(t => CodeTokenizer.tokenize(t).distinct)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .removedAll(Seq("vector", "stream"))
      .map { case (t, fg) =>
        val (fp, bp) = (fg / n, df(t) / nd)
        val s = math.BigDecimal((fp - bp) * (fp / bp))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (t, fg, df(t), s)
      }.toSeq.sortBy { case (t, _, _, s) => (-s, t) }.take(size)
    assert(got.toSeq == want, s"sig_text:\n got $got\n want $want")
    // no duplicate texts in this corpus => the knob cannot change anything
    val raw = DocumentsIndex.significantText(spark, sfDir, q, sample, size,
      filterDuplicateText = false).collect().map(_.toSeq)
    assert(raw.toSeq == got.map(r => Seq(r._1, r._2, r._3, r._4)).toSeq)
    intercept[IllegalArgumentException] {
      DocumentsIndex.significantText(spark, sfDir, q, 0, size) }
  }

  test("review pins: pentagram ring rejected; geohash skips NULL coords; profile normalizes") {
    // a star-ordered pentagon turns left at EVERY vertex (winding 720°) —
    // the all-left-turns check alone would accept it
    val penta = (0 until 5).map { i =>
      val a = math.Pi / 2 + 2 * math.Pi * i / 5
      (math.sin(a) * 10, math.cos(a) * 10)
    }
    val star = Seq(0, 2, 4, 1, 3).map(penta)
    intercept[IllegalArgumentException] {
      graft.ops.GeoOps.withinConvexPolygon(
        Seq((0.0, 0.0)).toDF("lat", "lon"), "lat", "lon", star)
    }
    // the simple convex ring still passes
    assert(graft.ops.GeoOps.withinConvexPolygon(
      Seq((0.0, 0.0), (89.0, 0.0)).toDF("lat", "lon"), "lat", "lon", penta)
      .count() == 1L)
    // NULL coordinates are skipped, never a NULL-keyed bucket
    val g = graft.ops.GeoOps.geohashGrid(
      Seq((Some(0.0), Some(0.0)), (None, Some(1.0)), (Some(1.0), None))
        .toDF("lat", "lon").select(col("lat").cast("double"), col("lon").cast("double")),
      "lat", "lon", 2, 10).collect()
    assert(g.map(r => r.getString(0) -> r.getLong(1)).toSeq == Seq("s0" -> 1L))
    // profile leaf lookup analyzes its input like the bool executor
    assume(haveData, s"$sfDir not mounted")
    val a = DocumentsIndex.profileBool(spark, sfDir, Seq("HASH"), Seq(" join "), Nil).collect()
    val b = DocumentsIndex.profileBool(spark, sfDir, Seq("hash"), Seq("join"), Nil).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.exists(r => r.getString(0) == "must:hash" && r.getLong(1) > 0L))
  }
}
