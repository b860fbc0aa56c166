package graft

import graft.ops.{GeoOps, JoinFieldOps, PipelineAggs}
import org.apache.spark.sql.functions._

/** Gates for the ES pipeline aggregations (derivative / cumulative_sum /
  * max_bucket), the parent/child join-field queries (has_child /
  * has_parent), and the geotile_grid aggregation.
  */
class PipelineJoinSpec extends SparkSpec {
  import spark.implicits._

  test("derivative == lag diff with the first bucket dropped; cumulative_sum == running fold") {
    val buckets = Seq(("d1", 5L), ("d2", 8L), ("d3", 2L), ("d4", 2L)).toDF("day", "n")
    val d = PipelineAggs.derivative(buckets, "day", "n", "deriv")
      .orderBy("day").as[(String, Long, Long)].collect().toSeq
    assert(d == Seq(("d2", 8L, 3L), ("d3", 2L, -6L), ("d4", 2L, 0L)),
      s"derivative: $d")
    val c = PipelineAggs.cumulativeSum(buckets, "day", "n", "cum")
      .orderBy("day").as[(String, Long, Long)].collect().toSeq
    assert(c == Seq(("d1", 5L, 5L), ("d2", 8L, 13L), ("d3", 2L, 15L), ("d4", 2L, 17L)),
      s"cumulative_sum: $c")
    // single bucket: no derivative at all (ES returns the bucket sans value)
    val one = Seq(("d1", 5L)).toDF("day", "n")
    assert(PipelineAggs.derivative(one, "day", "n", "deriv").isEmpty)
    assert(PipelineAggs.cumulativeSum(one, "day", "n", "cum")
      .as[(String, Long, Long)].collect().toSeq == Seq(("d1", 5L, 5L)))
  }

  test("serial_diff == lag-n difference with unmatched buckets dropped; moving average == trailing-window mean") {
    val vals = (1 to 10).map(i => (i.toLong * i)) // quadratic: every diff distinct
    val buckets = vals.zipWithIndex.map { case (v, i) => (f"d${i + 1}%02d", v) }.toDF("day", "n")
    val sd = PipelineAggs.serialDiff(buckets, "day", "n", 3, "sdiff")
      .orderBy("day").as[(String, Long, Long)].collect().toSeq
    val wantSd = (4 to 10).map(i => (f"d$i%02d", vals(i - 1), vals(i - 1) - vals(i - 4)))
    assert(sd == wantSd, s"serial_diff: $sd")
    // lag 1 IS the derivative
    assert(PipelineAggs.serialDiff(buckets, "day", "n", 1, "x").orderBy("day")
      .as[(String, Long, Long)].collect().toSeq ==
      PipelineAggs.derivative(buckets, "day", "n", "x").orderBy("day")
        .as[(String, Long, Long)].collect().toSeq)
    val ma = PipelineAggs.movingAvg(buckets, "day", "n", 4, "mavg")
      .orderBy("day").as[(String, Long, Double)].collect().toSeq
    val wantMa = (1 to 10).map { i =>
      val w = vals.slice(math.max(0, i - 4), i)
      (f"d$i%02d", vals(i - 1), w.sum.toDouble / w.size)
    }
    assert(ma == wantMa, s"moving_avg: $ma")
    intercept[IllegalArgumentException](PipelineAggs.serialDiff(buckets, "day", "n", 0, "x"))
    intercept[IllegalArgumentException](PipelineAggs.movingAvg(buckets, "day", "n", 0, "x"))
  }

  test("max_bucket returns ALL tied maxima as key-ordered rows, via a broadcast, not a window") {
    val buckets = Seq(("b", 7L), ("a", 7L), ("c", 3L)).toDF("day", "n")
    val mb = PipelineAggs.maxBucket(buckets, "day", "n")
    val got = mb.as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 7L), ("b", 7L)), s"max_bucket ties: $got")
    val plan = mb.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"max_bucket must not plan a Window:\n$plan")
    assert(plan.contains("Broadcast"), s"1-row max frame must broadcast:\n$plan")
  }

  test("stats_bucket / bucket_script / bucket_selector / bucket_sort == brute; null gap policy skips") {
    val buckets = Seq(("d1", 5L, 1L), ("d2", 8L, 4L), ("d3", 2L, 1L), ("d4", 4L, 0L))
      .toDF("day", "n", "err")
    val sb = PipelineAggs.statsBucket(buckets, "n")
      .as[(Long, Long, Long, Double, Long)].head()
    assert(sb == ((4L, 2L, 8L, 4.75, 19L)), s"stats_bucket: $sb")
    // gap policy: a null metric falls out of count/avg/sum
    val withNull = buckets.withColumn("n",
      when(col("day") === "d3", lit(null)).otherwise(col("n")))
    val sbN = PipelineAggs.statsBucket(withNull, "n")
      .as[(Long, Long, Long, Double, Long)].head()
    assert(sbN._1 == 3L && sbN._5 == 17L, s"stats_bucket null skip: $sbN")

    val ratio = round(col("err").cast("double") / col("n"), 6)
    val bs = PipelineAggs.bucketScript(buckets, ratio, "r")
      .orderBy("day").as[(String, Long, Long, Double)].collect().toSeq
    assert(bs.map(_._4) == Seq(0.2, 0.5, 0.5, 0.0), s"bucket_script: $bs")
    // a bucket whose script input is null emits NO value (dropped)
    val bsN = PipelineAggs.bucketScript(withNull, ratio, "r")
      .select("day").as[String].collect().toSeq.sorted
    assert(bsN == Seq("d1", "d2", "d4"), s"bucket_script gap: $bsN")

    val sel = PipelineAggs.bucketSelector(buckets, col("err") >= 1L)
      .select("day").as[String].collect().toSeq.sorted
    assert(sel == Seq("d1", "d2", "d3"), s"bucket_selector: $sel")
    // null predicate drops the bucket, never keeps it
    val selN = PipelineAggs.bucketSelector(withNull, col("n") > 0L)
      .select("day").as[String].collect().toSeq.sorted
    assert(selN == Seq("d1", "d2", "d4"), s"bucket_selector null: $selN")

    val srt = PipelineAggs.bucketSort(buckets,
        Seq(col("n").desc, col("day").asc), from = 1, size = 2)
      .select("day").as[String].collect().toSeq
    assert(srt == Seq("d1", "d4"), s"bucket_sort slice: $srt")
    // from past the end → empty; size unbounded keeps the tail
    assert(PipelineAggs.bucketSort(buckets, Seq(col("n").desc), from = 9).isEmpty)
    assert(PipelineAggs.bucketSort(buckets,
      Seq(col("n").desc, col("day").asc), from = 1).count() == 3L)
    intercept[IllegalArgumentException](
      PipelineAggs.bucketSort(buckets, Seq(col("n")), from = -1))
  }

  test("percentiles_bucket == sorted interpolation; normalize == brute, broadcasts, degenerate range pinned") {
    val vals = Seq(3L, 9L, 1L, 7L, 5L) // sorted: 1 3 5 7 9
    val buckets = vals.zipWithIndex.map { case (v, i) => (s"d$i", v) }.toDF("day", "n")
    val pb = PipelineAggs.percentilesBucket(buckets, "n", Seq(25, 50, 75))
      .as[(Double, Double, Double)].head()
    assert(pb == ((3.0, 5.0, 7.0)), s"percentiles_bucket: $pb") // exact ranks
    val pb2 = PipelineAggs.percentilesBucket(buckets, "n", Seq(90))
      .as[Double].head()
    assert(pb2 == 8.2, s"interpolated p90 over [1,3,5,7,9]: $pb2") // 7 + 0.6*(9-7)
    intercept[IllegalArgumentException](
      PipelineAggs.percentilesBucket(buckets, "n", Seq(101)))
    intercept[IllegalArgumentException](
      PipelineAggs.percentilesBucket(buckets, "n", Nil))

    val pos = PipelineAggs.normalize(buckets, "n", "percent_of_sum", "v")
      .orderBy("day").select("v").as[Double].collect().toSeq
    assert(pos == vals.map(_.toDouble / vals.sum), s"percent_of_sum: $pos")
    val r01 = PipelineAggs.normalize(buckets, "n", "rescale_0_1", "v")
      .orderBy("day").select("v").as[Double].collect().toSeq
    assert(r01 == vals.map(v => (v - 1.0) / 8.0), s"rescale_0_1: $r01")
    // degenerate range: constant series pins to 0.0, not NaN
    val const = Seq(("a", 4L), ("b", 4L)).toDF("day", "n")
    assert(PipelineAggs.normalize(const, "n", "rescale_0_1", "v")
      .select("v").as[Double].collect().toSeq == Seq(0.0, 0.0))
    intercept[IllegalArgumentException](
      PipelineAggs.normalize(buckets, "n", "zscore", "v"))
    val plan = PipelineAggs.normalize(buckets, "n", "percent_of_sum", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"normalize must not plan a Window:\n$plan")
    assert(plan.contains("Broadcast"), s"1-row stats frame must broadcast:\n$plan")
  }

  test("has_child == brute counts in [min, max]; orphan children excluded; bad bounds rejected") {
    val parents = Seq(1L, 2L, 3L, 4L).toDF("pid")
    val children = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (5L, "x"), (5L, "x"))
      .toDF("cid", "t")
    val filt = children.where(col("t") === "x") // the child query
    val got = JoinFieldOps.hasChild(parents, "pid", filt, "cid")
      .orderBy("pid").as[(Long, Long)].collect().toSeq
    // parent 5 does not exist (orphan children); 3 and 4 have no children
    assert(got == Seq((1L, 2L), (2L, 1L)), s"has_child: $got")
    val atLeast2 = JoinFieldOps.hasChild(parents, "pid", filt, "cid", minChildren = 2L)
      .as[(Long, Long)].collect().toSeq
    assert(atLeast2 == Seq((1L, 2L)), s"min_children: $atLeast2")
    val atMost1 = JoinFieldOps.hasChild(parents, "pid", filt, "cid", 1L, 1L)
      .as[(Long, Long)].collect().toSeq
    assert(atMost1 == Seq((2L, 1L)), s"max_children: $atMost1")
    intercept[IllegalArgumentException](
      JoinFieldOps.hasChild(parents, "pid", filt, "cid", minChildren = 0L))
    intercept[IllegalArgumentException](
      JoinFieldOps.hasChild(parents, "pid", filt, "cid", 3L, 2L))
  }

  test("has_parent == semi join on the parent key set; duplicate parent rows never duplicate children") {
    val children = Seq((10L, 1L), (11L, 2L), (12L, 5L), (13L, 1L)).toDF("eid", "cid")
    val parentsMatch = Seq(1L, 1L, 2L).toDF("pid") // deliberate duplicate key
    val hp = JoinFieldOps.hasParent(children, "cid", parentsMatch, "pid")
    val got = hp.orderBy("eid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 1L), (11L, 2L), (13L, 1L)), s"has_parent: $got")
    assert(hp.queryExecution.executedPlan.toString.contains("LeftSemi"),
      "has_parent must plan a semi join")
  }

  test("has_child inner_hits: per-parent (sort desc, tie asc) ranks cut at perParent; only qualifying parents' children") {
    val parents = Seq(1L, 2L, 3L).toDF("pid")
    // parent 1: three children (one value tie broken by eid); parent 2: one
    // child (below min_children=2); parent 5: orphan (no parent row)
    val children = Seq(
      (10L, 1L, 5.0), (11L, 1L, 9.0), (12L, 1L, 5.0),
      (20L, 2L, 7.0), (50L, 5L, 8.0), (51L, 5L, 8.5))
      .toDF("eid", "cid", "v")
    val got = JoinFieldOps.hasChildInnerHits(parents, "pid", children, "cid",
        "v", "eid", 2, minChildren = 2L)
      .select("cid", "hit_rank", "eid", "v")
      .orderBy("cid", "hit_rank").as[(Long, Int, Long, Double)].collect().toSeq
    // parent 1 qualifies; rank = (9.0, eid 11), then the tie (5.0) broken by
    // eid 10 < 12; perParent=2 cuts eid 12. Parent 2 under-count, 5 orphan.
    assert(got == Seq((1L, 1, 11L, 9.0), (1L, 2, 10L, 5.0)), s"inner_hits: $got")
    // perParent=1 keeps only the best child per parent
    val top1 = JoinFieldOps.hasChildInnerHits(parents, "pid", children, "cid",
        "v", "eid", 1).select("cid", "eid").orderBy("cid")
      .as[(Long, Long)].collect().toSeq
    assert(top1 == Seq((1L, 11L), (2L, 20L)), s"top1: $top1")
    intercept[IllegalArgumentException](JoinFieldOps.hasChildInnerHits(
      parents, "pid", children, "cid", "v", "eid", 0))
  }

  /** The engine's tile formula re-spelled driver-side (same JVM libm, same
    * 6-dp mercator rounding) — the brute oracle for the grid gate.
    */
  private def tileKey(lat: Double, lon: Double, z: Int): String = {
    val n = math.pow(2.0, z)
    val x = math.floor(n * (lon + 180.0) / 360.0)
    val r = math.toRadians(lat)
    val mercRaw = (1.0 - math.log(math.tan(r) + 1.0 / math.cos(r)) / math.Pi) / 2.0
    val merc = BigDecimal(mercRaw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val y = math.floor(n * merc)
    def cl(v: Double): Long = math.max(0.0, math.min(v, n - 1.0)).toLong
    s"$z/${cl(x)}/${cl(y)}"
  }

  test("geotile keys hit known anchors and clamp at the edges; grid == brute; band + bounds enforced") {
    val anchors = Seq(
      (0.0, 0.0, 1, "1/1/1"),                 // equator/meridian center tile
      (0.0, -180.0, 1, "1/0/1"),              // west edge
      (0.0, 180.0, 1, "1/1/1"),               // lon = +180 clamps to the last x
      (-85.05112878, 0.0, 1, "1/1/1"),        // mercator cut clamps y to n-1
      (85.05112878, 0.0, 1, "1/1/0"),         // top of the band
      (37.77, -122.41, 0, "0/0/0"))           // z = 0 is one world tile
    val df = anchors.map(a => (a._1, a._2)).toDF("lat", "lon")
    for (((la, lo, z, want), i) <- anchors.zipWithIndex) {
      val got = df.where(col("lat") === la && col("lon") === lo)
        .select(GeoOps.geotileKey(col("lat"), col("lon"), z).as("k"))
        .as[String].head()
      assert(got == want, s"anchor $i ($la, $lo, z=$z): got $got")
      assert(tileKey(la, lo, z) == want, s"brute anchor $i disagrees")
    }
    // full grid == brute over the derived coords, z coarse and fine
    val keys = spark.range(0, 2000).toDF("k")
    val (lat, lon) = GeoOps.derivedCoords(col("k"))
    val pts = keys.select(col("k"), lat.as("lat"), lon.as("lon"))
    val rows = pts.as[(Long, Double, Double)].collect()
    for (z <- Seq(3, 6)) {
      val want = rows.filter { case (_, la, _) => math.abs(la) <= GeoOps.MercatorMaxLat }
        .groupBy { case (_, la, lo) => tileKey(la, lo, z) }
        .map { case (t, xs) => (t, xs.length.toLong) }.toSeq
        .sortBy { case (t, c) => (-c, t) }
      val got = GeoOps.geotileGrid(pts, "lat", "lon", z, want.size + 10)
        .as[(String, Long)].collect().toSeq
      assert(got == want, s"geotile grid z=$z")
      assert(want.size > 1, s"degenerate grid fixture at z=$z")
    }
    // out-of-band points are excluded, not clamped into the grid
    val polar = Seq((89.0, 10.0), (-89.9, 10.0), (10.0, 10.0)).toDF("lat", "lon")
    assert(GeoOps.geotileGrid(polar, "lat", "lon", 2, 10)
      .agg(sum("doc_count")).as[Long].head() == 1L)
    intercept[IllegalArgumentException](GeoOps.geotileKey(col("lat"), col("lon"), -1))
    intercept[IllegalArgumentException](GeoOps.geotileKey(col("lat"), col("lon"), 30))
    intercept[IllegalArgumentException](GeoOps.geotileGrid(polar, "lat", "lon", 2, 0))
  }
}
