package graft

import graft.fixtures.{CorpusGen, QuerySet}
import graft.index.{IndexConfig, InvertedIndex}
import graft.io.Tables
import graft.lineage.Manifests
import graft.query.IndexReader
import org.apache.spark.sql.functions._

/** Per-slice resume of the postings stage (BASELINE.json:6 "per-partition
  * lineage manifests ... resumable from last committed checkpoint"): a kill
  * mid-postings must lose at most one slice's work, and the sliced build
  * must answer queries identically to the single-shot build.
  */
class SlicedBuildSpec extends SparkSpec {
  val N = 1200L
  lazy val corpus = CorpusGen.dataset(spark, N, 4)
  val cfgRef: IndexConfig = IndexConfig(partitions = 8, heavyDfThreshold = 300L, saltRunDocs = 300L)
  val cfgSliced: IndexConfig = cfgRef.copy(resumeSlices = 4)
  val dirRef = "/tmp/graft_sliced_ref"
  val dirSliced = "/tmp/graft_sliced_b"
  val dirKill = "/tmp/graft_sliced_kill"
  val probes = Seq("def val return", "z100_id def", "the import")

  private def fingerprint(base: String, name: String): Seq[(Long, Long)] =
    Tables.read(spark, base, name)
      .select(expr("xxhash64(struct(*))").as("h"))
      .groupBy(lit(1)).agg(expr("bit_xor(h)").as("x"), count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq

  test("sliced build == single-shot build: same registry/dictionary, identical top-k") {
    Tables.delete(spark, "/tmp", "graft_sliced_ref")
    Tables.delete(spark, "/tmp", "graft_sliced_b")
    InvertedIndex.build(spark, corpus, dirRef, cfgRef, "ref")
    InvertedIndex.build(spark, corpus, dirSliced, cfgSliced, "sliced")
    // content-derived tables are layout-independent — byte-identical
    for (t <- Seq(InvertedIndex.DocsTable, InvertedIndex.DictTable))
      assert(fingerprint(dirRef, t) == fingerprint(dirSliced, t), s"table $t differs sliced vs single-shot")
    // block boundaries differ at slice cuts, but every query answer must not
    val ra = new IndexReader(spark, dirRef)
    val rb = new IndexReader(spark, dirSliced)
    for (q <- probes)
      assert(ra.searchBmw(q, QuerySet.K).toSeq == rb.searchBmw(q, QuerySet.K).toSeq, s"top-k differs for '$q'")
    // slice scratch cleaned after the merged commit
    assert(!Tables.exists(spark, dirSliced, "postings_slices/p8n4/s0"))
  }

  test("kill mid-postings: committed slices are not recomputed on resume") {
    Tables.delete(spark, "/tmp", "graft_sliced_kill")
    val boom = intercept[RuntimeException] {
      InvertedIndex.build(spark, corpus, dirKill, cfgSliced.copy(chaosFailAfterSlice = 1), "kill")
    }
    assert(boom.getMessage.contains("chaos"))
    // mid-kill state: registry/stats + slices 0,1 committed; 2,3 and the
    // merged postings absent
    assert(Manifests.isComplete(spark, dirKill, "postings_slice_p8n4_0"))
    assert(Manifests.isComplete(spark, dirKill, "postings_slice_p8n4_1"))
    assert(!Manifests.isComplete(spark, dirKill, "postings_slice_p8n4_2"))
    assert(!Manifests.isComplete(spark, dirKill, "postings"))
    val committedAt01 = (0 to 1).map { i =>
      Tables.read(spark, dirKill, s"lineage/postings_slice_p8n4_$i")
        .where(col("partitionId") === -1).collect()(0).getAs[Long]("committedAtMs")
    }

    val report = InvertedIndex.build(spark, corpus, dirKill, cfgSliced, "resume")
    val byStage = report.results.map(r => r.stage -> r.skipped).toMap
    assert(byStage("registry") && byStage("stats"), s"pre-kill stages must be skipped: $byStage")
    assert(byStage("postings_slice_p8n4_0") && byStage("postings_slice_p8n4_1"),
      s"committed slices must be skipped on resume: $byStage")
    assert(!byStage("postings_slice_p8n4_2") && !byStage("postings_slice_p8n4_3"),
      s"uncommitted slices must run: $byStage")
    assert(!byStage("postings") && !byStage("dictionary"))

    // the resumed index answers identically to the clean sliced build
    val rk = new IndexReader(spark, dirKill)
    val rb = new IndexReader(spark, dirSliced)
    for (q <- probes)
      assert(rk.searchBmw(q, QuerySet.K).toSeq == rb.searchBmw(q, QuerySet.K).toSeq, s"resumed top-k differs for '$q'")
    assert(fingerprint(dirKill, InvertedIndex.PostingsTable) ==
      fingerprint(dirSliced, InvertedIndex.PostingsTable), "resumed postings differ from clean sliced build")
    // counter evidence of zero recompute: the skipped flags above, plus the
    // slice manifests' commit timestamps were captured pre-resume — a
    // recommit would have rewritten them before the cleanup erased the
    // scratch manifests entirely (they are gone after the merged commit)
    assert(committedAt01.forall(_ > 0))
    assert(!Tables.exists(spark, dirKill, "lineage/postings_slice_p8n4_0"))
  }

  test("resume with a DIFFERENT slice geometry ignores old-geometry scratch") {
    // kill a 4-slice build mid-way, then resume with 8 slices: the committed
    // p8n4 slices cover pid ranges that mean something else under p8n8 —
    // geometry-qualified names/paths must keep them out of the merge, and
    // the result must still equal the clean build.
    val dir = "/tmp/graft_sliced_regeom"
    Tables.delete(spark, "/tmp", "graft_sliced_regeom")
    intercept[RuntimeException] {
      InvertedIndex.build(spark, corpus, dir, cfgSliced.copy(chaosFailAfterSlice = 1), "kill")
    }
    assert(Manifests.isComplete(spark, dir, "postings_slice_p8n4_1"))
    val report = InvertedIndex.build(spark, corpus, dir, cfgSliced.copy(resumeSlices = 8), "regeom")
    val byStage = report.results.map(r => r.stage -> r.skipped).toMap
    assert(!byStage("postings_slice_p8n8_0"), "new-geometry slices must all run")
    // block boundaries legitimately differ between geometries; what must
    // hold is exact df/cf (a mixed merge would double-count pids) and
    // identical query answers
    assert(fingerprint(dir, InvertedIndex.DictTable) ==
      fingerprint(dirSliced, InvertedIndex.DictTable),
      "re-geometried resume must not mix old-geometry slices into the merge")
    val rg = new IndexReader(spark, dir)
    val rb = new IndexReader(spark, dirSliced)
    for (q <- probes)
      assert(rg.searchBmw(q, QuerySet.K).toSeq == rb.searchBmw(q, QuerySet.K).toSeq, s"top-k differs for '$q'")
  }
}
