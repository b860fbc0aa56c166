package graft

import graft.driver.DocumentsIndex
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
