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

  /** Streaming LIVE-INDEX ingest: a `foreachBatch` sink committing each
    * micro-batch of documents as ONE delta segment of an existing index
    * (graft.index.DeltaIndex.addDocuments — the engine's refresh). This IS
    * ES's ingest model re-expressed: bulk batches land, a refresh makes
    * them searchable, segment count grows until a merge; here every
    * micro-batch is a refresh. Compaction stays OUT-OF-BAND, exactly like
    * Lucene's background merges: the index operator runs
    * `DeltaIndex.maybeCompact` (it needs the accumulated corpus union, not
    * a micro-batch) on its own cadence — the DeltaIndexSpec refresh-loop
    * gate already proves that policy bounds segment count under exactly
    * this commit pattern. Readers opened BEFORE a commit never see it
    * (segment immutability — the PIT contract), readers opened after see
    * base ∪ deltas; the sbt gate drives a MemoryStream through two batches
    * and checks both sides.
    *
    * Scale shape: each micro-batch runs the ordinary distributed delta
    * build (SPIMI over the batch, salted exchange); empty batches commit
    * nothing. Exactly-once: addDocuments rejects duplicate keys, so a
    * replayed batch fails loudly rather than double-indexing — the caller
    * keyspace (streaming source offsets → doc keys) must be idempotent,
    * documented here rather than hidden.
    *
    * Returns the DataStreamWriter; the caller starts/stops it (tests use
    * `.trigger(AvailableNow)` + `awaitTermination`).
    */
  def indexSink(docs: org.apache.spark.sql.Dataset[graft.fixtures.CodeFile],
      indexDir: String, cfg: graft.index.IndexConfig)
      : org.apache.spark.sql.streaming.DataStreamWriter[graft.fixtures.CodeFile] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[graft.fixtures.CodeFile], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.index.DeltaIndex.addDocuments(batch.sparkSession, indexDir, batch,
            cfg, runId = s"stream-$batchId")
          ()
        }
    }
}
