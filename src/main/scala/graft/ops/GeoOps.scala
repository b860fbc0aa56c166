package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geo predicates (SURVEY.md §1.1: the reference's ES mappings carry
  * `geo_point` fields — `upstream:` esmarc maps MARC 034 coordinates —
  * and the LOD API serves geo_distance filters over them).
  *
  * Re-expressed Spark-first as a relational two-phase plan: a CHEAP
  * bounding-box prefilter (pure column comparisons — pushes to the parquet
  * scan as min/max-prunable predicates, the analog of ES's geohash grid
  * cut) followed by the EXACT haversine predicate on the survivors. The
  * bbox is provably a superset of the disk (margins use 110.0 km/deg, below
  * the true minimum meridian arc of ~110.57, and the longitude margin is
  * scaled by the smallest cos|lat| in the band), so the prefilter never
  * changes results — only the scanned row count. At 100 TB the same shape
  * holds: the bbox predicate prunes row groups / partitions at the source,
  * and the trig runs codegen'd on the survivors only.
  *
  * Cross-engine float protocol: the distance is rounded to 4 dp and the
  * radius predicate applies to the ROUNDED value in both engines, so a
  * sub-ulp libm divergence cannot flip a boundary row (a value would have
  * to land within ~1e-12 of a 1e-4 rounding edge).
  */
object GeoOps {
  val EarthRadiusKm = 6371.0

  /** Deterministic synthesized coordinates for a keyed table (the driver
    * testdata carries no geo columns — `upstream:` MARC 034 is the real
    * source; this derivation stands in for it reproducibly in BOTH engines):
    * lat = (key·37 mod 18000)/100 − 90, lon = (key·73 mod 36000)/100 − 180.
    * Integer arithmetic first, one exact-decimal division after — both
    * engines produce bit-identical doubles.
    */
  def derivedCoords(keyCol: Column): (Column, Column) = (
    (keyCol * 37 % 18000) / 100.0 - 90.0,
    (keyCol * 73 % 36000) / 100.0 - 180.0)

  /** Haversine distance (km) between (latCol, lonCol) and the fixed point
    * (lat0, lon0) — builtin trig only, whole-stage-codegen friendly. The
    * expression tree mirrors the DuckDB twin term-for-term so both engines
    * evaluate the same float association.
    */
  def haversineKm(latCol: Column, lonCol: Column, lat0: Double, lon0: Double): Column =
    lit(2 * EarthRadiusKm) * asin(sqrt(
      pow(sin(radians(latCol - lat0) / 2), 2) +
        cos(lit(math.toRadians(lat0))) * cos(radians(latCol)) *
          pow(sin(radians(lonCol - lon0) / 2), 2)))

  /** ES `geo_bounding_box` query: lat ∈ [bottom, top], lon ∈ [left, right]
    * — with the ES antimeridian convention that `left > right` means the
    * box WRAPS the date line (lon ≥ left OR lon ≤ right). Pure column
    * comparisons end to end, so the whole predicate lands in the parquet
    * scan's PushedFilters (row-group pruning at the source — at 100 TB a
    * bbox over partition-clustered coordinates is a partition-pruning
    * predicate, the cheapest geo query there is). Bounds are INCLUSIVE on
    * all four edges, matching ES.
    */
  def withinBox(df: DataFrame, latCol: String, lonCol: String,
      top: Double, left: Double, bottom: Double, right: Double): DataFrame = {
    require(top >= bottom, s"top ($top) must be >= bottom ($bottom)")
    require(top <= 90 && bottom >= -90, "latitudes must be within [-90, 90]")
    require(left >= -180 && left <= 180 && right >= -180 && right <= 180,
      "longitudes must be within [-180, 180]")
    val latPred = col(latCol).between(bottom, top)
    val lonPred =
      if (left <= right) col(lonCol).between(left, right)
      else col(lonCol) >= left || col(lonCol) <= right // antimeridian wrap
    df.where(latPred && lonPred)
  }

  /** ES `geo_polygon` query, pinned v1 = CONVEX polygons on the planar
    * (lon, lat) chart: a point is inside iff it sits on the non-negative
    * side of every edge of the counter-clockwise ring — one cross-product
    * sign check per edge, multiply/subtract ONLY (no libm), so both
    * engines evaluate bit-identical doubles and the whole predicate is a
    * codegen'd conjunction that lands next to the scan. Boundary points
    * count as inside (cross = 0), matching ES's inclusive edges.
    * DIVERGENCES (documented): ES evaluates great-circle edges and accepts
    * concave rings (it triangulates); the planar-convex pin keeps the
    * predicate exact-arithmetic and twin-expressible — a concave ring
    * decomposes into convex pieces OR'd together by the caller. The ring
    * must be CCW and genuinely convex — both validated driver-side (pure
    * arithmetic over the vertex list), rejecting silently-wrong input
    * loudly. Antimeridian-crossing rings are out of the v1 (reject by
    * construction: vertices are plain [-180, 180] lon values).
    */
  def withinConvexPolygon(df: DataFrame, latCol: String, lonCol: String,
      ring: Seq[(Double, Double)] /* (lat, lon) vertices, CCW */): DataFrame = {
    require(ring.size >= 3, s"polygon needs >= 3 vertices, got ${ring.size}")
    ring.foreach { case (la, lo) =>
      require(la >= -90 && la <= 90 && lo >= -180 && lo <= 180,
        s"vertex ($la, $lo) outside the lat/lon domain")
    }
    // driver-side convex/CCW validation: every consecutive edge-pair turn
    // must be non-negative (left turns only), with at least one strict
    val n = ring.size
    val turns = (0 until n).map { i =>
      val (ay, ax) = ring(i); val (by, bx) = ring((i + 1) % n); val (cy, cx) = ring((i + 2) % n)
      (bx - ax) * (cy - by) - (by - ay) * (cx - bx)
    }
    require(turns.forall(_ >= 0.0) && turns.exists(_ > 0.0),
      "ring must be counter-clockwise and convex (left turns only)")
    // all-left-turns alone accepts MULTI-WINDING rings (a pentagram
    // traversal turns left at every vertex, total winding 720°) whose
    // half-plane conjunction silently shrinks to the central core — so
    // additionally every vertex must lie inside every edge's half-plane
    // (true iff the ring is simple convex; pentagram vertices fail it).
    // O(n²) driver-side over a query-sized vertex list.
    require((0 until n).forall { i =>
      val (ay, ax) = ring(i); val (by, bx) = ring((i + 1) % n)
      ring.forall { case (py, px) =>
        (bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0.0
      }
    }, "ring must be simple (non-self-intersecting) convex")
    val inside = (0 until n).map { i =>
      val (ay, ax) = ring(i); val (by, bx) = ring((i + 1) % n)
      (lit(bx - ax) * (col(latCol) - lit(ay)) -
        lit(by - ay) * (col(lonCol) - lit(ax))) >= 0.0
    }.reduce(_ && _)
    df.where(inside)
  }

  /** All rows of `df` within `radiusKm` of (lat0, lon0), with `dist_km`
    * (rounded 4 dp — the predicate applies to the rounded value; see the
    * protocol note above). `prefilter = false` disables the bbox phase —
    * the identity `withinRadius(..., prefilter = true) == (..., false)` is
    * the superset proof's test hook.
    */
  def withinRadius(df: DataFrame, latCol: String, lonCol: String,
      lat0: Double, lon0: Double, radiusKm: Double,
      prefilter: Boolean = true): DataFrame = {
    require(radiusKm > 0, "radiusKm must be positive")
    val latMargin = radiusKm / 110.0
    val boxed = if (!prefilter) df else {
      val latBand = col(latCol).between(lat0 - latMargin, lat0 + latMargin)
      val maxAbsLat = math.abs(lat0) + latMargin
      // longitude degrees shrink toward the poles; skip the lon cut when
      // the band nears a pole or the margin wraps the antimeridian — the
      // bbox is an optimization, never a correctness dependency
      if (maxAbsLat >= 89.0) df.where(latBand)
      else {
        val lonMargin = radiusKm / (110.0 * math.cos(math.toRadians(maxAbsLat)))
        if (lonMargin >= 180.0 || lon0 - lonMargin < -180.0 || lon0 + lonMargin > 180.0)
          df.where(latBand)
        else df.where(latBand && col(lonCol).between(lon0 - lonMargin, lon0 + lonMargin))
      }
    }
    boxed
      .withColumn("dist_km", round(haversineKm(col(latCol), col(lonCol), lat0, lon0), 4))
      .where(col("dist_km") <= radiusKm)
  }

  /** Web-Mercator latitude cut — tiles exist only inside ±85.0511…°
    * (ES geotile_grid's own bound: GeoTileUtils.LATITUDE_MASK).
    */
  val MercatorMaxLat = 85.05112878

  /** Slippy-map tile key "z/x/y" for a point (ES `geotile_grid` bucket
    * keys, GeoTileUtils.longEncode semantics): with n = 2^z,
    * x = ⌊n·(lon+180)/360⌋ and y = ⌊n·(1 − ln(tan φ + sec φ)/π)/2⌋.
    *
    * Cross-engine float protocol: the x arithmetic is +,−,×,÷ only —
    * IEEE-deterministic, bit-identical in any engine that spells the same
    * expression. The y side passes through libm (tan/cos/ln), so the
    * mercator fraction is ROUNDED to 6 dp (the repo's score protocol)
    * BEFORE the ⌊n·frac⌋ cut — a sub-ulp libm divergence would need to
    * land within ~1e-12 of a 1e-6 rounding edge to flip a tile. Both
    * indices are clamped to [0, n−1] (lon = +180 / φ = the mercator cut
    * map to the last tile, as in ES).
    */
  def geotileKey(latCol: Column, lonCol: Column, z: Int): Column = {
    require(z >= 0 && z <= 29, s"geotile precision must be in [0, 29], got $z")
    val n = math.pow(2.0, z) // exact in binary for z <= 29
    val x = floor(lit(n) * (lonCol + lit(180.0)) / lit(360.0))
    val latRad = radians(latCol)
    val mercFrac = round(
      (lit(1.0) - log(tan(latRad) + lit(1.0) / cos(latRad)) / lit(math.Pi)) / lit(2.0), 6)
    val y = floor(lit(n) * mercFrac)
    val clamp = (c: Column) => greatest(lit(0.0), least(c, lit(n - 1.0)))
    concat_ws("/", lit(z.toString),
      clamp(x).cast("long"), clamp(y).cast("long"))
  }

  /** ES `geo_bounds` aggregation: the tightest box around every point —
    * (top, left, bottom, right), one map-side-combinable min/max pass.
    * Pinned `wrap_longitude = false` (documented divergence: ES's default
    * true may report a narrower box crossing the antimeridian by picking
    * the largest longitude gap; the non-wrapping box is the same four
    * aggregates both engines compute bit-identically over the synthesized
    * exact-2-dp coordinates, and is itself a valid ES mode). At 100 TB this
    * is four partial aggs — one row crosses the exchange per partition.
    */
  def geoBounds(df: DataFrame, latCol: String, lonCol: String): DataFrame =
    df.agg(max(col(latCol)).as("top"), min(col(lonCol)).as("left"),
      min(col(latCol)).as("bottom"), max(col(lonCol)).as("right"))

  /** ES `geo_centroid` aggregation: arithmetic mean of lat and lon plus the
    * point count (ES's exact semantics for the planar mean it computes).
    * Rounded 4 dp — avg is a sum whose fold order differs per engine, and
    * the oracle compare is tolerance-based under the rounding. One
    * map-side-combinable pass, same exchange shape as [[geoBounds]].
    */
  def geoCentroid(df: DataFrame, latCol: String, lonCol: String): DataFrame =
    df.agg(round(avg(col(latCol)), 4).as("lat"),
      round(avg(col(lonCol)), 4).as("lon"), count(lit(1)).as("n"))

  /** ES `geotile_grid` aggregation: per-tile doc counts at precision `z`,
    * top `size` buckets by (count desc, key asc — the pinned tie-break).
    * Points outside the Web-Mercator band are EXCLUDED, exactly as ES
    * drops them from the grid. Plan: the mercator-band filter + tile-key
    * projection run codegen'd in the scan stage; the agg is one map-side-
    * combined groupBy whose exchange moves (tile, partial-count) rows —
    * at 100 TB the grid is a cheap full-scan agg, ES's own cost model.
    */
  def geotileGrid(df: DataFrame, latCol: String, lonCol: String, z: Int,
      size: Int): DataFrame = {
    require(size > 0, "size must be positive")
    df.where(abs(col(latCol)) <= MercatorMaxLat)
      .groupBy(geotileKey(col(latCol), col(lonCol), z).as("tile"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(desc("doc_count"), asc("tile"))
      .limit(size)
  }

  /** The geohash base32 alphabet (no a/i/l/o) — Niemeyer's encoding, the
    * one ES/Lucene GeoHashUtils pin.
    */
  val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** ES `geohash_grid` aggregation: per-cell doc counts under the standard
    * geohash encoding — precision `p` cells are 5p bits, lon takes
    * ceil(5p/2) (geohash interleaves LON-first), lat the rest. Cross-engine
    * exactness: each axis does ONE identically-spelled IEEE divide+multiply
    * — floor((lon + 180) / 360 · 2^lonBits) — then everything downstream is
    * integer shifts and masks (no libm anywhere, unlike geotile's mercator,
    * so no rounding protocol is needed); the +180 / +90 edges clamp into
    * the last cell (ES's behavior), the interleave walks MSB-first and each
    * 5-bit group maps through [[GeohashAlphabet]]. Unlike geotile there is
    * NO latitude exclusion band — geohash covers the poles. Output: top
    * `size` cells as a PLAN (TakeOrderedAndProject) by (count desc, key
    * asc); the groupBy is map-side combined, cells ≤ 32^p.
    */
  def geohashGrid(df: DataFrame, latCol: String, lonCol: String,
      precision: Int, size: Int): DataFrame = {
    require(precision >= 1 && precision <= 6,
      s"precision must be in [1, 6], got $precision") // 6 = 30 bits, cm-scale cells
    require(size > 0, "size must be positive")
    val bits = 5 * precision
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    def axis(c: Column, shift: Double, span: Double, nBits: Int): Column =
      greatest(least(floor((c + shift) / span * (1L << nBits).toDouble),
        lit((1L << nBits) - 1)), lit(0L))
    // rows missing the geo field are SKIPPED like ES (a NULL coordinate
    // would otherwise propagate into a NULL-keyed bucket competing in the
    // top-size cut)
    val withXY = df.where(col(latCol).isNotNull && col(lonCol).isNotNull)
      .select(
        axis(col(lonCol), 180.0, 360.0, lonBits).as("gx"),
        axis(col(latCol), 90.0, 180.0, latBits).as("gy"))
    val chars = (0 until precision).map { c =>
      val v = (0 until 5).map { m =>
        val j = 5 * c + m
        val bit =
          if (j % 2 == 0) shiftright(col("gx"), lonBits - 1 - j / 2).bitwiseAND(lit(1L))
          else shiftright(col("gy"), latBits - 1 - (j - 1) / 2).bitwiseAND(lit(1L))
        bit * lit(1L << (4 - m))
      }.reduce(_ + _)
      substr(lit(GeohashAlphabet), (v + 1).cast("int"), lit(1))
    }
    withXY.select(concat(chars: _*).as("geohash"))
      .groupBy("geohash").agg(count(lit(1)).as("doc_count"))
      .orderBy(desc("doc_count"), asc("geohash"))
      .limit(size)
  }
}
