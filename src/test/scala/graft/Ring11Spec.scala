package graft

import graft.driver.DocumentsIndex
import graft.ops.GeoOps
import graft.tokenize.CodeTokenizer
import org.apache.spark.sql.functions._

/** Gates for the ring-11 additions: sparse_vector dot product (brute tf
  * recount from raw text, absent-term no-op, bad weights loud), span_or
  * union counts (brute occurrence count, duplicate/arity rejection),
  * _mtermvectors (row-identical to per-doc termVectors, missing id silent),
  * and geohash_grid (known world anchors s0/u0/zz/00, odd precision, clamp,
  * brute grid recount on the derived coords).
  */
class Ring11Spec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/documents.parquet").exists()

  private lazy val toksById: Map[Long, Array[String]] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) => id -> CodeTokenizer.tokenize(t) }.toMap

  test("sparse_vector: brute dot product; absent term no-op; bad weights loud") {
    assume(haveData, s"$sfDir not mounted")
    val w = Map("hash" -> 2.0, "join" -> 1.0, "vector" -> 0.5, "zzmissing" -> 4.0)
    val got = DocumentsIndex.sparseVector(spark, sfDir, w).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val brute = toksById.view.mapValues { ts =>
      w.collect { case (t, wt) if t != "zzmissing" => wt * ts.count(_ == t) }.sum
    }.filter(_._2 > 0.0).toMap
    assert(got == brute, s"sizes ${got.size} vs ${brute.size}")
    // dropping the absent term changes nothing
    val got2 = DocumentsIndex.sparseVector(spark, sfDir, w - "zzmissing").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got2 == got)
    val r = DocumentsIndex // loud on non-positive weight / empty map
    intercept[IllegalArgumentException] { r.sparseVector(spark, sfDir, Map("hash" -> 0.0)) }
    intercept[IllegalArgumentException] { r.sparseVector(spark, sfDir, Map.empty) }
  }

  test("span_or: union count == brute occurrences; duplicate and arity rejected") {
    assume(haveData, s"$sfDir not mounted")
    val got = DocumentsIndex.spanOrMatch(spark, sfDir, Seq("hash", "vector", "stream"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = toksById.view.mapValues(
      ts => ts.count(t => t == "hash" || t == "vector" || t == "stream").toLong)
      .filter(_._2 > 0L).toMap
    assert(got == brute)
    intercept[IllegalArgumentException] {
      DocumentsIndex.spanOrMatch(spark, sfDir, Seq("hash", "hash"))
    }
    intercept[IllegalArgumentException] {
      DocumentsIndex.spanOrMatch(spark, sfDir, Seq("hash"))
    }
  }

  test("_mtermvectors: rows == per-doc termVectors; missing id emits nothing") {
    assume(haveData, s"$sfDir not mounted")
    val multi = DocumentsIndex.termVectorsMulti(spark, sfDir, Seq(7L, 42L, 999999L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(!multi.exists(_._1 == 999999L))
    for (id <- Seq(7L, 42L)) {
      val single = DocumentsIndex.termVectors(spark, sfDir, id).collect()
        .map(r => (id, r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      assert(multi.filter(_._1 == id).toSeq == single.toSeq, s"doc $id")
    }
    intercept[IllegalArgumentException] {
      DocumentsIndex.termVectorsMulti(spark, sfDir, Seq(7L, 7L))
    }
  }

  test("geohash_grid: world anchors at p=2/p=3, clamped edges, brute grid recount") {
    val pts = Seq(
      (0.0, 0.0),        // "s0" / "s00"
      (48.8583, 2.2945), // Paris -> "u0"
      (90.0, 180.0),     // clamp into the last cell -> "zz"
      (-90.0, -180.0)    // first cell -> "00"
    ).toDF("lat", "lon")
    val g2 = GeoOps.geohashGrid(pts, "lat", "lon", 2, 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(g2 == Map("s0" -> 1L, "u0" -> 1L, "zz" -> 1L, "00" -> 1L), s"got $g2")
    val g3 = GeoOps.geohashGrid(Seq((0.0, 0.0)).toDF("lat", "lon"), "lat", "lon", 3, 10)
      .collect().map(_.getString(0))
    assert(g3.toSeq == Seq("s00"))
    intercept[IllegalArgumentException] { GeoOps.geohashGrid(pts, "lat", "lon", 0, 10) }
    intercept[IllegalArgumentException] { GeoOps.geohashGrid(pts, "lat", "lon", 2, 0) }
    // brute recount on the derived coords: group sizes from a scala re-encode
    assume(haveData, s"$sfDir not mounted")
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long].collect()
    def enc(lat: Double, lon: Double): String = {
      val gx = math.max(math.min(math.floor((lon + 180.0) / 360.0 * 32.0), 31.0), 0.0).toLong
      val gy = math.max(math.min(math.floor((lat + 90.0) / 180.0 * 32.0), 31.0), 0.0).toLong
      val bits = (0 until 10).map(j => if (j % 2 == 0) (gx >> (4 - j / 2)) & 1L else (gy >> (4 - (j - 1) / 2)) & 1L)
      (0 until 2).map { c =>
        val v = (0 until 5).map(m => bits(5 * c + m) << (4 - m)).sum
        GeoOps.GeohashAlphabet.charAt(v.toInt)
      }.mkString
    }
    val brute = ids.map { id =>
      enc((id * 37 % 18000) / 100.0 - 90.0, (id * 73 % 36000) / 100.0 - 180.0)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = brute.toSeq.sortBy { case (k, n) => (-n, k) }.take(15)
    val got = SparkEntry.queries("a69_geohash_grid")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == want, s"top-15 mismatch")
  }
}
