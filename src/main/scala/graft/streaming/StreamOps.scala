package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators.
  *
  * The reference toolchain has NO true streaming (scroll cursors are snapshot
  * batch iteration; enrichment bots are pollers — SURVEY.md §2.4), so
  * streaming is an explicit non-goal for parity. These operators exist for
  * the training-data-pipeline side of the engine: continuous corpus ingest
  * and monitoring over an event stream, expressed as standard watermarked
  * windowed aggregations (readStream -> transforms -> writeStream).
  */
object StreamOps {

  /** Watermarked tumbling-window counts per event type over a stream shaped
    * like the `events` table (ts, event_type, value). Late data beyond the
    * watermark is dropped — incremental state stays bounded regardless of
    * stream length.
    */
  def eventWindowCounts(events: DataFrame, windowLen: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming corpus ingest: tokenize incoming documents incrementally into
    * per-(window, doc, term) tf deltas — exactly the staging rows the batch
    * SPIMI build compacts (new docs accumulate in a staging table; the batch
    * build runs over committed staging snapshots). Single stateful
    * aggregation => append-mode streaming-safe; df/cf roll up at compaction
    * time in batch, where exact distinct counts are cheap.
    */
  def docTermIngest(docs: DataFrame, windowLen: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      // exact twin of the pinned batch analyzer (CodeTokenizer): lowercase,
      // split on [^a-z0-9_]+, drop empties, truncate to MaxTermLen — so
      // streaming-staged tf rows compact into the same postings the batch
      // SPIMI build would produce. (explode must be top-level in a select;
      // the truncation is a second projection.)
      .select(col("ts"), col("doc_id"),
        explode(split(lower(col("text")), "[^a-z0-9_]+")).as("rawTerm"))
      .select(col("ts"), col("doc_id"),
        substring(col("rawTerm"), 1, graft.tokenize.CodeTokenizer.MaxTermLen).as("term"))
      .where(col("term") =!= "")
      .groupBy(window(col("ts"), windowLen), col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .select(col("window.start").as("window_start"), col("doc_id"), col("term"), col("tf"))
}
