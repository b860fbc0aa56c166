package graft

import graft.driver.DocumentsIndex
import graft.ops.{DedupOps, GeoOps}
import graft.tokenize.CodeTokenizer
import org.apache.spark.sql.functions._

/** Gates for the ring-8 additions: near-dup connected-component clustering
  * (constructed graphs with known components, incl. a chain that forces
  * multi-round propagation), convex geo_polygon containment (known
  * inside/boundary/outside points + loud rejection of CW/concave rings),
  * _profile structural counts (brute df recomputation from raw text), and
  * the stratified-sample residue rule (brute LCG recompute).
  */
class Ring8Spec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/documents.parquet").exists()

  test("nearDupClusters: known components, min-id labels, canonical flags") {
    val pairs = Seq((0L, 1L, 0), (1L, 2L, 1), (5L, 6L, 2)).toDF("a", "b", "dist")
    val got = DedupOps.nearDupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSet == Set(
      (0L, 0L, true), (1L, 0L, false), (2L, 0L, false),
      (5L, 5L, true), (6L, 5L, false)))
  }

  test("nearDupClusters: chain graph needs multi-round propagation; still one component") {
    // path 10-11-12-...-17: diameter 7, label 10 must walk the whole chain
    val pairs = (10L until 17L).map(i => (i, i + 1, 1)).toDF("a", "b", "dist")
    val got = DedupOps.nearDupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.forall(_._2 == 10L), s"one component expected: ${got.mkString(",")}")
    assert(got.count(_._3) == 1 && got.find(_._3).get._1 == 10L)
    assert(got.length == 8)
  }

  test("nearDupClusters: distributed path == driver union-find path on every fixture") {
    // chain (multi-round propagation), two components, and a triangle+tail
    val fixtures = Seq(
      (10L until 17L).map(i => (i, i + 1, 1)),
      Seq((0L, 1L, 0), (1L, 2L, 1), (5L, 6L, 2)),
      Seq((30L, 31L, 0), (31L, 32L, 0), (30L, 32L, 0), (32L, 33L, 0), (40L, 41L, 0)))
    for (fx <- fixtures) {
      val pairs = fx.toDF("a", "b", "dist")
      val viaDriver = DedupOps.nearDupClusters(pairs).collect().map(_.toSeq).toSeq
      val viaDist = DedupOps.nearDupClusters(pairs, driverMaxEndpoints = 0)
        .collect().map(_.toSeq).toSeq
      assert(viaDriver == viaDist, s"paths disagree on $fx")
    }
  }

  test("nearDupClusters: loud non-convergence when maxRounds too small (distributed path)") {
    val pairs = (20L until 26L).map(i => (i, i + 1, 1)).toDF("a", "b", "dist")
    intercept[IllegalArgumentException] {
      DedupOps.nearDupClusters(pairs, maxRounds = 1, driverMaxEndpoints = 0)
    }
  }

  test("geo_polygon: inside/boundary/outside on a CCW triangle; CW and concave rejected") {
    val ring = Seq((0.0, 0.0), (0.0, 10.0), (10.0, 0.0)) // CCW in (lat, lon)
    val pts = Seq(
      (1L, 2.0, 2.0),   // inside
      (2L, 0.0, 5.0),   // on the bottom edge -> inclusive
      (3L, 0.0, 0.0),   // vertex -> inclusive
      (4L, 6.0, 6.0),   // outside the hypotenuse (6+6 > 10)
      (5L, -1.0, 5.0),  // below
      (6L, 5.0, 5.0)    // exactly ON the hypotenuse -> inclusive
    ).toDF("id", "lat", "lon")
    val got = GeoOps.withinConvexPolygon(pts, "lat", "lon", ring)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 6L), s"got $got")
    intercept[IllegalArgumentException] {
      GeoOps.withinConvexPolygon(pts, "lat", "lon", ring.reverse) // CW
    }
    intercept[IllegalArgumentException] {
      GeoOps.withinConvexPolygon(pts, "lat", "lon", // concave dent at (2,2)
        Seq((0.0, 0.0), (2.0, 2.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)))
    }
  }

  // brute corpus model straight from the raw text — never another engine path
  private lazy val toksById: Map[Long, Array[String]] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) => id -> CodeTokenizer.tokenize(t) }.toMap

  test("_profile: leaf docs == brute df (absent leaf 0); total == brute bool count") {
    assume(haveData, s"$sfDir not mounted")
    val got = DocumentsIndex.profileBool(spark, sfDir,
        Seq("hash"), Seq("join", "zzmissing"), Seq("merge"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def dfOf(t: String) = toksById.valuesIterator.count(_.contains(t)).toLong
    assert(got("must:hash") == dfOf("hash") && dfOf("hash") > 0)
    assert(got("should:join") == dfOf("join"))
    assert(got("should:zzmissing") == 0L)
    assert(got("must_not:merge") == dfOf("merge"))
    val brute = toksById.valuesIterator
      .count(ts => ts.contains("hash") && !ts.contains("merge")).toLong
    assert(got("total:bool") == brute)
    assert(got.size == 5)
  }

  test("stratified sample: membership == brute LCG residue rule at per-lang rates") {
    assume(haveData, s"$sfDir not mounted")
    val kept = SparkEntry.queries("td_stratified_sample")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect()
    all.foreach { case (id, lang) =>
      val h = ((id * 1103515245L + 12345L) % 100L + 100L) % 100L
      val want = if (lang == "en") h < 50 else h < 20
      assert(kept.contains(id) == want, s"doc $id lang=$lang h=$h")
    }
    assert(kept.nonEmpty && kept.size < all.length)
  }
}
