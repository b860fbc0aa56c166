package graft

import graft.driver.DocumentsIndex
import graft.tokenize.CodeTokenizer
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** `search_after` serving gate (SURVEY.md §2.3 B10): the bounded cursor
  * page must be INDISTINGUISHABLE from the offset slice of the exact
  * rank-all total order — at every page depth, including ones deep enough
  * that the first over-fetch attempt alone can't prove stability. Runs
  * against the driver's sf0.001 documents table (the same corpus the
  * oracle rows check), skipped when the testdata mount is absent.
  */
class DriverPagingSpec extends SparkSpec with BeforeAndAfterAll {
  private val sfDir = "/root/testdata/sf0.001"
  import spark.implicits._

  private def haveData = new java.io.File(s"$sfDir/documents.parquet").exists()

  test("search_after cursor pages == offset slices of the rank-all order at depths 1, 2, 5") {
    assume(haveData, s"$sfDir not mounted")
    val k = 10
    for (query <- Seq("spark join", "the")) {
      // the exact total order under the output protocol (rounded desc, doc_id asc)
      val total = DocumentsIndex.bm25(spark, sfDir, query, -1)
        .as[(Long, Double)].collect().toSeq
      assert(total.size > 5 * k, s"'$query' matches too few docs for a depth-5 gate")
      // walk pages 2..6 via the cursor form a real client uses (page 1 is
      // the plain top-k — already oracle-gated)
      var cursor = total(k - 1) // (doc_id, rounded score) at page-1 tail
      for (depth <- Seq(1, 2, 5)) {
        // advance the cursor to the tail of page `depth`
        cursor = total(depth * k - 1)
        val want = total.slice(depth * k, depth * k + k)
        val got = DocumentsIndex.bm25SearchAfter(spark, sfDir, query,
          cursor._2, cursor._1, k).as[(Long, Double)].collect().toSeq
        assert(got == want, s"cursor page after depth $depth for '$query': $got vs $want")
      }
    }
  }

  test("sort-by-field cursor pages == offset slices; keyset predicate pushed to the scan") {
    assume(haveData, s"$sfDir not mounted")
    val k = 10
    for (query <- Seq("hash", "the")) {
      // brute total order from the raw table: docs containing the term,
      // (n_chars desc, doc_id asc) — scoring must play no part
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text", "n_chars").as[(Long, String, Long)].collect()
      val total = docs.collect {
        case (id, t, nc) if CodeTokenizer.tokenize(t).contains(query) => (id, nc)
      }.sortBy { case (id, nc) => (-nc, id) }.toSeq
      assert(total.size > 3 * k, s"'$query' matches too few docs for the gate")
      // page 1 (no cursor), then cursor pages at depths 1..3
      val p1 = DocumentsIndex.sortByField(spark, sfDir, query, k)
        .as[(Long, Long)].collect().toSeq
      assert(p1 == total.take(k), s"page 1 for '$query'")
      for (depth <- 1 to 3) {
        val cursor = total(depth * k - 1)
        val want = total.slice(depth * k, depth * k + k)
        val got = DocumentsIndex.sortByField(spark, sfDir, query,
          cursor._2, cursor._1, k).as[(Long, Long)].collect().toSeq
        assert(got == want, s"sort cursor page after depth $depth for '$query'")
      }
    }
    // ties on the sort key must exist somewhere, or the doc_id tie-break
    // (and its keyset equality arm) was never exercised
    val ncs = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("n_chars").count().where(col("count") > 1).count()
    assert(ncs > 0, "no n_chars ties in the corpus — keyset equality arm unexercised")
    // plan shape: the keyset predicate reaches the parquet scan, the match
    // ids arrive as a semi join, and the sort is TakeOrderedAndProject
    val page2 = DocumentsIndex.sortByField(spark, sfDir, "hash", 120L, 5L, k)
    val plan = page2.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_chars"),
      s"keyset predicate not pushed:\n$plan")
    assert(plan.contains("LeftSemi"), s"match ids must semi-join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"sort must be top-k:\n$plan")
    assert(!plan.toLowerCase.contains("tfnorm") && !plan.contains("ObjectHashAggregate"),
      s"field-sorted serving must not score:\n$plan")
  }

  test("cursor page is served bounded (no corpus-sized exchange) at shallow depth") {
    assume(haveData, s"$sfDir not mounted")
    // page 2 of a 2-term query: the bounded route must prove stability on
    // the first over-fetch and never touch scoreAllDf — assert by job
    // accounting: the served plan's row count is <= k and its physical
    // plan contains no groupBy aggregate over contributions (the rank-all
    // signature), i.e. the frame is built from a broadcast local relation.
    val total = DocumentsIndex.bm25(spark, sfDir, "spark join", -1)
      .as[(Long, Double)].collect().toSeq
    val cursor = total(9)
    val page = DocumentsIndex.bm25SearchAfter(spark, sfDir, "spark join",
      cursor._2, cursor._1, 10)
    val plan = page.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") || plan.contains("Broadcast"),
      s"expected a bounded broadcast/local page plan, got:\n$plan")
    assert(!plan.contains("ObjectHashAggregate") && !plan.contains("SortAggregate"),
      s"bounded page plan must not embed the rank-all contribution aggregate:\n$plan")
    assert(page.count() == 10)
  }
}
