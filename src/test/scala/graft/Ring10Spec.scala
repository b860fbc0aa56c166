package graft

import graft.driver.DocumentsIndex
import graft.ops.{JoinFieldOps, MetricAggs}
import graft.tokenize.CodeTokenizer
import org.apache.spark.sql.functions._

/** Gates for the ring-10 additions: _analyze (token stream == brute
  * CodeTokenizer with 0-based positions), _field_caps (pinned type map over
  * two real schemas + loud unmapped type), parent aggregation (parents weigh
  * once per bucket regardless of child multiplicity), and frequent_item_sets
  * pairs (brute support recount, boundary inclusion, bad-arg rejection).
  */
class Ring10Spec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/documents.parquet").exists()

  test("_analyze: stream == CodeTokenizer, 0-based positions, empty input -> no rows") {
    val s = "Hash-Join builds a HASH table; probe_side streams 42 rows & exits."
    val got = DocumentsIndex.analyzeDf(spark, s).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = CodeTokenizer.tokenize(s).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    assert(got.toSeq == want.toSeq)
    assert(got.head == ((0L, "hash")) && got.map(_._2).contains("probe_side"))
    assert(DocumentsIndex.analyzeDf(spark, "  ;;  ").count() == 0L)
  }

  test("_field_caps: documents + events schemas under the pinned map; unmapped type loud") {
    assume(haveData, s"$sfDir not mounted")
    val docs = DocumentsIndex.fieldCaps(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(docs == Map(
      "doc_id" -> (("long", true, true)),
      "lang" -> (("keyword", true, true)),
      "n_chars" -> (("long", true, true)),
      "source" -> (("keyword", true, true)),
      "text" -> (("text", true, false))))
    val ev = DocumentsIndex.fieldCaps(spark, sfDir, "events", analyzed = Set.empty)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ev == Map("event_id" -> "long", "ts" -> "date", "user_id" -> "long",
      "event_type" -> "keyword", "value" -> "double", "props" -> "keyword"))
    // embeddings carries an array column -> dense_vector or loud, never silent
    val dir = java.nio.file.Files.createTempDirectory("graft_fc").toString
    Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "emb").write.parquet(s"$dir/t.parquet")
    val t = DocumentsIndex.fieldCaps(spark, dir, "t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(t("emb") == "dense_vector")
    Seq((1L, Map("a" -> 1L))).toDF("id", "m").write.parquet(s"$dir/m.parquet")
    intercept[IllegalArgumentException] { DocumentsIndex.fieldCaps(spark, dir, "m") }
  }

  test("parent agg: parents weigh once per bucket; child multiplicity ignored") {
    val parents = Seq((10L, 100.0), (11L, 200.0), (12L, 400.0)).toDF("pk", "v")
    val children = Seq(
      ("a", 10L), ("a", 10L), ("a", 10L), // dup children of one parent
      ("a", 11L),
      ("b", 11L), ("b", 12L),
      ("c", 99L) // orphan child: no parent row -> bucket drops entirely
    ).toDF("bucket", "ck")
    val got = JoinFieldOps.parentAgg(children, "ck", "bucket", parents, "pk", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("a", 2L, 150.0), ("b", 2L, 300.0)))
  }

  test("frequent pairs: brute support, rounded boundary inclusive, bad minSupport loud") {
    // 5 transactions: {x,y} x3, {x,z} x1, {y,z} x1 -> support xy=0.6 xz=0.2 yz=0.2
    val txns = Seq(
      ("t1", "x"), ("t1", "y"), ("t1", "y"), // dup item in a txn counts once
      ("t2", "x"), ("t2", "y"),
      ("t3", "x"), ("t3", "y"),
      ("t4", "x"), ("t4", "z"),
      ("t5", "y"), ("t5", "z")
    ).toDF("txn", "item")
    val got = MetricAggs.frequentPairs(txns, "txn", "item", 0.2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("x", "y", 3L, 0.6), ("x", "z", 1L, 0.2), ("y", "z", 1L, 0.2)))
    // raising the floor past the boundary drops the 0.2 pairs
    val top = MetricAggs.frequentPairs(txns, "txn", "item", 0.21).collect()
    assert(top.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("x", "y")))
    intercept[IllegalArgumentException] { MetricAggs.frequentPairs(txns, "txn", "item", 0.0) }
    intercept[IllegalArgumentException] { MetricAggs.frequentPairs(txns, "txn", "item", 1.5) }
  }
}
