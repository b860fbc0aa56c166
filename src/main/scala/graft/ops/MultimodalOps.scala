package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media ride through the pipeline as opaque
  * `binary` columns with typed metadata; decode / feature-extract runs as a
  * typed partition-local map over the bytes (the Scala analog of a
  * `mapInPandas` batch UDF).
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs, so
  * [[StubCodec.decode]] produces a deterministic fake (byte length, sha256,
  * a fake frame count). The Spark-side plumbing is real and tested: schema
  * (binary payload + struct metadata), partition-local batch iteration, no
  * shuffle, column pruning keeps the bytes out of metadata-only scans.
  */
object MultimodalOps {

  /** Deterministic stand-in for an image/audio decoder. A production build
    * replaces ONLY this object (e.g. JNI codec) — the Spark plumbing around
    * it is unchanged.
    */
  object StubCodec extends Serializable {
    final case class Decoded(nBytes: Int, sha256: String, fakeFrames: Int)
    def decode(payload: Array[Byte]): Decoded = {
      val d = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
      Decoded(payload.length, d.map("%02x".format(_)).mkString, payload.length % 16 + 1)
    }
  }

  /** Wrap a text table as a media table: (id, media binary, media_type). In
    * production this column comes straight from parquet binary.
    */
  def asMediaTable(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    df.select(col(id), encode(col(text), "UTF-8").as("media"), lit("utf8-stub").as("media_type"))

  /** Feature extraction over the binary column: typed, partition-local,
    * batch-shaped (iterator in -> iterator out, like mapInPandas).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, id: String = "doc_id"): DataFrame = {
    import spark.implicits._
    media.select(col(id).cast("long"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (docId, bytes) =>
        val d = StubCodec.decode(bytes)
        (docId, d.nBytes, d.sha256, d.fakeFrames)
      })
      .toDF(id, "n_bytes", "content_sha256", "fake_frames")
  }
}
