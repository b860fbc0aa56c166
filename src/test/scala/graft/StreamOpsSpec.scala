package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("watermarked window counts: aggregates per window, drops late data") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val out = StreamOps.eventWindowCounts(
      mem.toDF.toDF("ts", "event_type", "value"), "1 minute", "2 minutes")
    val q = out.writeStream.format("memory").queryName("evt").outputMode(OutputMode.Append).start()
    try {
      mem.addData((ts(0, 10), "click", 1.0), (ts(0, 20), "click", 2.0), (ts(0, 30), "buy", 5.0))
      q.processAllAvailable()
      // advance event time far enough that window [10:00,10:01) closes
      mem.addData((ts(10, 0), "click", 1.0))
      q.processAllAvailable()
      // late datum for the closed window: must be DROPPED
      mem.addData((ts(0, 40), "click", 99.0))
      q.processAllAvailable()
      mem.addData((ts(20, 0), "click", 1.0)) // close the 10:10 window too
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, sum_value FROM evt WHERE window_start = timestamp'2024-01-01 10:00:00' ORDER BY event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq(("buy", 1L, 5.0), ("click", 2L, 3.0)), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("streaming doc-term ingest produces per-doc tf deltas per window") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.docTermIngest(mem.toDF.toDF("ts", "doc_id", "text"), "1 minute", "2 minutes")
    val q = out.writeStream.format("memory").queryName("ingest").outputMode(OutputMode.Append).start()
    try {
      mem.addData((ts(0, 5), 1L, "spark join spark"), (ts(0, 6), 2L, "spark filter"),
        (ts(0, 7), 5L, "y" * 70)) // >MaxTermLen token: must truncate like the batch analyzer
      q.processAllAvailable()
      mem.addData((ts(10, 0), 3L, "flush"))
      q.processAllAvailable()
      mem.addData((ts(20, 0), 4L, "flush2"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, term, tf FROM ingest WHERE window_start = timestamp'2024-01-01 10:00:00' ORDER BY doc_id, term")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(rows.toSeq == Seq((1L, "join", 1L), (1L, "spark", 2L), (2L, "filter", 1L), (2L, "spark", 1L),
        (5L, "y" * graft.tokenize.CodeTokenizer.MaxTermLen, 1L)),
        s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("indexSink: each micro-batch commits one delta segment — searchable after, PIT-stable before") {
    implicit val sql = spark.sqlContext
    import graft.fixtures.CorpusGen
    import graft.index.{DeltaIndex, IndexConfig, InvertedIndex}
    import graft.io.Tables
    import graft.query.IndexReader
    val dir = "/tmp/graft_stream_index"
    Tables.delete(spark, "/tmp", "graft_stream_index")
    Tables.delete(spark, "/tmp", "graft_stream_index_ckpt")
    val cfg = IndexConfig(partitions = 4, heavyDfThreshold = 100L, saltRunDocs = 100L)
    InvertedIndex.build(spark, spark.range(0L, 200L, 1L, 4).as[Long].map(CorpusGen.row),
      dir, cfg, "sbase")
    val pit = DeltaIndex.segmentDirs(spark, dir)
    val baseCount = new IndexReader(spark, dir).scoreAllDf("def").count()
    assert(baseCount > 0L)
    val mem = MemoryStream[Long]
    val q = StreamOps.indexSink(mem.toDS().map(CorpusGen.row), dir, cfg)
      .option("checkpointLocation", "/tmp/graft_stream_index_ckpt").start()
    try {
      mem.addData(200L to 260L: _*)
      q.processAllAvailable()
      mem.addData(261L to 300L: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(DeltaIndex.deltaDirs(spark, dir).size == 2,
      "two micro-batches must commit two delta segments")
    val after = new IndexReader(spark, dir).scoreAllDf("def").count()
    assert(after > baseCount, "streamed docs must be searchable through a fresh reader")
    // a PIT opened before the stream still serves exactly the base state
    assert(new IndexReader(spark, dir, pinnedSegments = Some(pit))
      .scoreAllDf("def").count() == baseCount)
  }
}
