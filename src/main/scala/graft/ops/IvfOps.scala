package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to the sign-LSH in [[VectorOps]] (a 100 TB ANN deployment typically
  * prefers IVF: recall is tunable per query via nprobe, and cells shard
  * cleanly). Structure:
  *
  *   quantizer  k centroids (spherical k-means, deterministic)
  *   assign     every vector -> its most-cosine-similar centroid (one narrow
  *              broadcast pass — the "inverted file" is just a cell column,
  *              i.e. a partition key at scale)
  *   search     probe -> nprobe nearest cells -> exact cosine ONLY within
  *              those cells -> top-k
  *
  * Determinism contract (cross-engine oracle protocol): centroid
  * similarities are rounded to 6 dp and ties broken by ascending centroid id
  * before every argmax, so an external SQL engine reproduces the exact cell
  * assignment. With `iters = 0` the quantizer is the k lowest-id vectors and
  * the WHOLE operator is a pure relational expression (the driver-contract
  * entry uses that); `iters > 0` runs Lloyd rounds for a real quantizer
  * (sbt-gated: recall vs brute force on constructed clusters).
  */
object IvfOps {
  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0) 0.0 else dot / d
  }

  /** Spherical k-means: init = the k lowest-id vectors (fully
    * deterministic); each Lloyd round assigns by (rounded cosine desc, cid
    * asc) and re-centers on the per-cell mean. Centroids are tiny (k x dim)
    * — they live on the driver and broadcast into the assignment pass, the
    * corpus is never shuffled.
    *
    * Determinism caveat (standard for distributed k-means): the per-cell
    * vector SUM reduces across partitions in no fixed order, so trained
    * centroids are deterministic only up to floating-point summation order
    * — low-bit drift that can flip a near-tie assignment between runs. The
    * exactly-reproducible path (and the one the driver oracle checks) is
    * the iters = 0 quantizer, where no reduction exists.
    */
  def centroids(emb: DataFrame, k: Int, iters: Int,
      id: String = "vec_id", vec: String = "embedding"): Array[(Int, Array[Double])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val typed = emb.select(col(id).cast("long"), expr(s"transform($vec, x -> cast(x as double))"))
      .as[(Long, Array[Double])]
    var cents: Array[Array[Double]] = typed.orderBy(col(id)).limit(k).collect().map(_._2)
    for (_ <- 0 until iters) {
      val cB = spark.sparkContext.broadcast(cents)
      val sums = typed.map { case (_, v) =>
        (assignCell(v, cB.value), (v, 1L))
      }.groupByKey(_._1).mapValues(_._2).reduceGroups { (a, b) =>
        val s = a._1.clone()
        var i = 0
        while (i < s.length) { s(i) += b._1(i); i += 1 }
        (s, a._2 + b._2)
      }.collect()
      val next = cents.clone()
      sums.foreach { case (cid, (sum, n)) => next(cid) = sum.map(_ / n) }
      cents = next
    }
    cents.zipWithIndex.map { case (c, i) => (i, c) }
  }

  /** round(x, 6) with SQL ROUND semantics (HALF_UP, away from zero) — the
    * same rule Spark's `round` and the DuckDB twin apply, so the Scala
    * (Lloyd) and relational assignment paths agree even exactly on a
    * rounding boundary.
    */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Cell of vector v: argmax over centroids of round(cosine, 6), ties to
    * the smaller centroid id — the same rule the SQL twin expresses.
    */
  def assignCell(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestSim = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      val s = round6(cosine(v, cents(i)))
      if (s > bestSim) { bestSim = s; best = i }
      i += 1
    }
    best
  }

  /** IVF search (works for any quantizer passed in as a (cid, centroid)
    * DataFrame — e.g. `iters = 0` init or [[centroids]] output via
    * `centroidsDf`). The quantizer is TINY (k x dim) — it is collected once
    * and broadcast, so cell assignment is one NARROW argmax pass over the
    * corpus (reusing [[assignCell]], the Lloyd kernel): no exchange at all,
    * let alone the k-fold row amplification a relational
    * crossJoin + window-argmax plan would shuffle. (That relational form
    * survives only as the DuckDB oracle twin, where it belongs.) Probe cells
    * are picked on the driver from the same broadcast centroids; candidates
    * = the narrow filter "assigned cell ∈ probed cells"; exact cosine only
    * inside them, ending in one TakeOrderedAndProject. At scale the
    * assignment is the table's partition key, so probing reads only nprobe
    * partitions instead of filtering the full scan.
    */
  def annTopK(emb: DataFrame, cents: DataFrame, probeId: Long, k: Int, nprobe: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cArr: Array[Array[Double]] = cents
      .select(col("cid").cast("int"), expr("transform(cvec, x -> cast(x as double))"))
      .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
    val typed = emb.select(col(id).cast("long"),
      expr(s"transform($vec, x -> cast(x as double))")).as[(Long, Array[Double])]
    // driver-side probe-cell pick: nprobe most-similar centroids, the same
    // (round6 desc, cid asc) rule as assignment
    val probeVec = typed.where(col(id) === probeId).collect()
      .headOption.map(_._2).getOrElse(sys.error(s"probe id $probeId not found"))
    val probeCells: Set[Int] = cArr.indices
      .sortBy(ci => (-round6(cosine(probeVec, cArr(ci))), ci)).take(nprobe).toSet
    val cB = spark.sparkContext.broadcast(cArr)
    val probeB = spark.sparkContext.broadcast(probeVec)
    // one narrow pass: assign + probe-cell filter + exact cosine (the same
    // sequential left-fold summation order as VectorOps.cosExpr)
    typed
      .filter(r => r._1 != probeId && probeCells(assignCell(r._2, cB.value)))
      .map { case (vid, v) =>
        val c = cosine(v, probeB.value)
        (vid, java.math.BigDecimal.valueOf(c).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
      }
      .toDF(id, "cosine")
      .orderBy(desc("cosine"), col(id).asc)
      .limit(k)
  }

  /** [[centroids]] output as the (cid, cvec) DataFrame [[annTopK]] takes. */
  def centroidsDf(spark: SparkSession, cents: Array[(Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    cents.toSeq.toDF("cid", "cvec")
  }

  /** The iters = 0 quantizer as a relation: the k lowest-id vectors. */
  def initQuantizer(emb: DataFrame, k: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame =
    emb.orderBy(col(id)).limit(k).select(col(id).cast("int").as("cid"), col(vec).as("cvec"))
}
