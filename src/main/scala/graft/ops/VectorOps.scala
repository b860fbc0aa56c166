package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
  * variant (sign-pattern random-hyperplane sketch — here the first 8 axes as
  * fixed deterministic "hyperplanes" so the SQL oracle can reproduce it) is
  * the scale path: candidates come only from the probe's bucket, so the
  * pairwise work is |bucket|, not |corpus|. All math in double, summed in
  * element order (graft.functions.ArrayDot — a native codegen'd sequential
  * left fold, deterministic).
  */
object VectorOps {
  // r07: the cosine kernel moved from interpreted higher-order folds
  // (aggregate/zip_with/transform are CodegenFallback — every element paid
  // an interpreted lambda call) to the native codegen'd ArrayDot expression.
  // Same left-fold element order, bit-identical doubles (OpsSpec gate); the
  // previous spelling is kept in the ArrayDot scaladoc as the semantics pin.
  private def cosineCol: org.apache.spark.sql.Column = {
    val (ea, eb) = (col("ea"), col("eb"))
    graft.functions.ArrayDot(ea, eb) /
      (sqrt(graft.functions.ArrayDot(ea, ea)) * sqrt(graft.functions.ArrayDot(eb, eb)))
  }

  private def withDouble(df: DataFrame, out: String, emb: String): DataFrame =
    df.withColumn(out, expr(s"transform($emb, x -> cast(x as double))"))

  /** Exact cosine top-k for one probe vector against the whole table.
    * Single narrow pass + TakeOrderedAndProject: the probe row is broadcast
    * (cross join with a 1-row side), never a shuffle of the corpus.
    */
  def cosineTopK(emb: DataFrame, probeId: Long, k: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame =
    cosineTopKAmong(emb, emb, probeId, k, id, vec)

  /** Exact cosine top-k of the probe (looked up in `probeSrc`) against the
    * rows of `cand` — the verify kernel shared by the brute-force baseline
    * (cand = the whole table) and the ANN paths (cand = one bucket / the
    * probed IVF cells).
    */
  def cosineTopKAmong(cand: DataFrame, probeSrc: DataFrame, probeId: Long, k: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val probe = withDouble(probeSrc.where(col(id) === probeId), "eb", vec).select(col("eb"))
    val all = withDouble(cand.where(col(id) =!= probeId), "ea", vec)
    all.crossJoin(broadcast(probe))
      .withColumn("cosine", round(cosineCol, 4))
      .select(col(id), col("cosine"))
      .orderBy(desc("cosine"), col(id).asc)
      .limit(k)
  }

  /** Sign-pattern bucket of the first `bits` dimensions. */
  def lshBucket(emb: DataFrame, bits: Int = 8,
      id: String = "vec_id", vec: String = "embedding"): DataFrame =
    emb.withColumn("bucket",
      expr(s"concat_ws('', transform(slice($vec, 1, $bits), x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END))"))

  /** Approximate NN: exact cosine, but only within the probe's LSH bucket. */
  def lshAnnTopK(emb: DataFrame, probeId: Long, k: Int, bits: Int = 8,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val bucketed = lshBucket(emb, bits, id, vec)
    val probe = withDouble(bucketed.where(col(id) === probeId), "eb", vec)
      .select(col("eb"), col("bucket"))
    withDouble(bucketed.where(col(id) =!= probeId), "ea", vec)
      .join(broadcast(probe), Seq("bucket"))
      .withColumn("cosine", round(cosineCol, 4))
      .select(col(id), col("cosine"))
      .orderBy(desc("cosine"), col(id).asc)
      .limit(k)
  }

  /** All-pairs near-duplicate by embedding cosine >= minCos, blocked by
    * BANDED multi-table sign-pattern LSH (the embedding-space analog of
    * DedupOps.nearDupPairs): `bands` independent sketches, band q taking the
    * sign bits of dims [q*bits+1, q*bits+bits]; a pair is a candidate iff it
    * agrees on ALL bits of ANY band (AND within a band for precision, OR
    * across bands for recall — the classic LSH amplification), then verified
    * with exact cosine.
    *
    * Scale shape: per-band work is Σ_bucket |bucket|², so the bucket count
    * 2^bits must GROW with the corpus — a fixed `bits` is quadratic at 100 TB
    * (the round-1 single-table 2^6 design's flaw). `bitsPerBand = 0` (the
    * default) sizes bits so the expected bucket holds ~targetBucketDocs
    * vectors, making expected candidates O(bands · N · targetBucketDocs) —
    * linear in N (sub-quadratic growth is gate-tested on a 10x corpus in
    * OpsSpec). Pass explicit bits when an external oracle must reproduce the
    * bucketing. Requires bands * bits <= vector dim.
    */
  /** Bucket-count sizing for the banded LSH: bits such that the expected
    * band bucket holds ~targetBucketDocs vectors — per-band verify work is
    * then O(N · targetBucketDocs), linear in the corpus.
    */
  def adaptiveBits(n: Long, targetBucketDocs: Long = 64): Int = {
    val need = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucketDocs)) / math.log(2.0)).toInt
    math.min(16, math.max(4, need))
  }

  /** Candidate pairs (a < b) agreeing on all `bits` sign bits of any of the
    * `bands` dim-slices. The self-join carries only (id, band, piece) —
    * vectors join in AFTER the distinct, so the bucket blow-up never
    * replicates embeddings.
    */
  def bandCandidates(emb: DataFrame, bits: Int, bands: Int,
      id: String = "vec_id", vec: String = "embedding", dimHint: Int = -1): DataFrame = {
    // enforce bands * bits <= dim: a band sliced past the end yields an
    // EMPTY piece for every vector — one global bucket, silently quadratic.
    // dimHint lets a caller that already probed the dim skip this action.
    val dims: Iterable[Int] =
      if (dimHint >= 0) Some(dimHint)
      else emb.select(size(col(vec)).as("d")).limit(1).collect().map(_.getInt(0))
    dims.foreach { d =>
      require(bands * bits <= d,
        s"bands*bits = ${bands * bits} exceeds embedding dim $d — empty band pieces would degrade the blocking to all-pairs")
    }
    val pieceExpr = expr(
      s"""transform(sequence(0, ${bands - 1}), q -> struct(q AS q,
         |  concat_ws('', transform(slice($vec, q * $bits + 1, $bits),
         |    x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END)) AS piece))""".stripMargin)
    val slim = emb.select(col(id), explode(pieceExpr).as("bp"))
      .select(col(id), col("bp.q").as("q"), col("bp.piece").as("piece"))
    slim.as("x").join(slim.as("y"),
        col("x.q") === col("y.q") && col("x.piece") === col("y.piece") &&
          col(s"x.$id") < col(s"y.$id"))
      .select(col(s"x.$id").as("a"), col(s"y.$id").as("b")).distinct()
  }

  def cosineNearDupPairs(emb: DataFrame, minCos: Double, bitsPerBand: Int = 0,
      bands: Int = 4, targetBucketDocs: Long = 64,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    // ONE probe action per call: corpus size (for adaptive bits) and vector
    // dim (for the bands*bits<=dim clamp) come from a single tiny aggregate.
    val probe = emb.agg(count(lit(1)).as("n"), first(size(col(vec))).as("d")).collect()(0)
    val n = probe.getLong(0)
    val dim = if (probe.isNullAt(1)) 0 else probe.getInt(1)
    // empty corpus: no pairs by definition — the dim clamp below would
    // otherwise reject bands*bits <= 0 for what is a perfectly valid input
    if (n == 0)
      return emb.sparkSession.createDataFrame(
        emb.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cosine", org.apache.spark.sql.types.DoubleType))))
    val bits =
      if (bitsPerBand > 0) bitsPerBand
      else
        // adaptive bits are additionally clamped to what the vector dim can
        // supply (bandCandidates rejects an overrun outright)
        math.max(1, math.min(adaptiveBits(n, targetBucketDocs), dim / math.max(1, bands)))
    val cand = bandCandidates(emb, bits, bands, id, vec, dimHint = dim)
    val ev = withDouble(emb, "ev", vec).select(col(id), col("ev"))
    cand
      .join(ev.select(col(id).as("a"), col("ev").as("ea")), Seq("a"))
      .join(ev.select(col(id).as("b"), col("ev").as("eb")), Seq("b"))
      .withColumn("cosine", round(cosineCol, 4))
      .where(col("cosine") >= minCos)
      .select("a", "b", "cosine")
  }
}
