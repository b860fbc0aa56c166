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
  * element order (aggregate/zip_with are sequential left folds — codegen'd,
  * deterministic).
  */
object VectorOps {
  private val cosExpr =
    """aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
      | / (sqrt(aggregate(transform(ea, x -> x * x), 0D, (acc, v) -> acc + v))
      |    * sqrt(aggregate(transform(eb, x -> x * x), 0D, (acc, v) -> acc + v)))""".stripMargin

  private def withDouble(df: DataFrame, out: String, emb: String): DataFrame =
    df.withColumn(out, expr(s"transform($emb, x -> cast(x as double))"))

  /** Exact cosine top-k for one probe vector against the whole table.
    * Single narrow pass + TakeOrderedAndProject: the probe row is broadcast
    * (cross join with a 1-row side), never a shuffle of the corpus.
    */
  def cosineTopK(emb: DataFrame, probeId: Long, k: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val probe = withDouble(emb.where(col(id) === probeId), "eb", vec).select(col("eb"))
    val all = withDouble(emb.where(col(id) =!= probeId), "ea", vec)
    all.crossJoin(broadcast(probe))
      .withColumn("cosine", round(expr(cosExpr), 4))
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
      .withColumn("cosine", round(expr(cosExpr), 4))
      .select(col(id), col("cosine"))
      .orderBy(desc("cosine"), col(id).asc)
      .limit(k)
  }

  /** All-pairs near-duplicate by embedding cosine >= minCos, LSH-blocked:
    * pairs must share a sign-pattern bucket (the embedding-space analog of
    * DedupOps.nearDupPairs).
    */
  def cosineNearDupPairs(emb: DataFrame, minCos: Double, bits: Int = 6,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val b = withDouble(lshBucket(emb, bits, id, vec), "ev", vec)
      .select(col(id), col("bucket"), col("ev"))
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col(s"x.$id") < col(s"y.$id"))
      .select(col(s"x.$id").as("a"), col(s"y.$id").as("b"),
        col("x.ev").as("ea"), col("y.ev").as("eb"))
      .withColumn("cosine", round(expr(cosExpr), 4))
      .where(col("cosine") >= minCos)
      .select("a", "b", "cosine")
  }
}
