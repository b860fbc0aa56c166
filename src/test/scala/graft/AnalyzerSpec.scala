package graft

import graft.fixtures.{CodeFile, CorpusGen}
import graft.index.{DeltaIndex, IndexConfig, InvertedIndex}
import graft.io.Tables
import graft.oracle.ExhaustiveScorer
import graft.query.IndexReader
import graft.tokenize.{Analyzer, CodeTokenizer}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** Analyzer-configurability gates (SURVEY.md §7.8 — B1): a stopword-analyzed
  * index must score EXACTLY like the default engine over the pre-stripped
  * corpus (tf/dl/df see only kept tokens), preserve position GAPS (Lucene
  * StopFilter semantics), analyze query text with the index's own sidecar
  * analyzer, and refuse mixed-analyzer segment unions.
  */
class AnalyzerSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  val N = 400L
  val stop = Analyzer(Set("def", "val"))
  val dir = "/tmp/graft_test_analyzer"
  val cfg: IndexConfig = IndexConfig(partitions = 8, heavyDfThreshold = 200L,
    saltRunDocs = 200L, analyzer = stop)

  lazy val corpus = CorpusGen.dataset(spark, N, 8)
  lazy val reader = new IndexReader(spark, dir)

  /** Oracle: the DEFAULT scorer over the pre-stripped corpus — tokens are
    * [a-z0-9_] so a space re-join re-tokenizes identically, and tf/dl/df of
    * the stripped text equal the stop filter's emitted stream.
    */
  lazy val oracle: ExhaustiveScorer.Prepared = {
    val st = stop // local copy — the closure must not capture the spec
    val stripped = corpus.map(f => f.copy(content =
      CodeTokenizer.tokenize(f.content, st).mkString(" ")))
    val docs = stripped.toDF()
      .join(Tables.read(spark, dir, InvertedIndex.DocsTable)
        .select("docId", "repo", "path", "commit"), Seq("repo", "path", "commit"))
      .select(col("docId"), col("content")).as[ExhaustiveScorer.OracleDoc]
    val p = ExhaustiveScorer.prepare(spark, docs)
    p.rows.persist()
    p
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    Tables.delete(spark, "/tmp", "graft_test_analyzer")
    InvertedIndex.build(spark, corpus, dir, cfg, runId = "analyzer")
    ()
  }

  test("tokenizer: stopword dl excludes, positions gap (unit semantics)") {
    val a = Analyzer(Set("the"))
    assert(CodeTokenizer.tokenize("x the y", a).toSeq == Seq("x", "y"))
    assert(CodeTokenizer.countTokens("x the y the", a) == 2)
    val m = CodeTokenizer.tfPos("x the y", a)
    assert(m.dl == 2)
    val posOf = m.iterator.map { case (t, tf, enc) =>
      t -> graft.codec.PostingsCodec.decodePositions(Array(tf), enc).head.toSeq
    }.toMap
    assert(posOf("x") == Seq(0) && posOf("y") == Seq(2), s"positions must gap: $posOf")
    val c = CodeTokenizer.tfCount("x the y the x", a)
    assert(c.dl == 3 && c.iterator.toMap == Map("x" -> 2, "y" -> 1))
    intercept[IllegalArgumentException](Analyzer(Set("The")))
    intercept[IllegalArgumentException](Analyzer(Set("")))
  }

  test("stop index == default engine over the pre-stripped corpus (match + bool)") {
    assert(InvertedIndex.readAnalyzer(spark, dir) == stop)
    assert(reader.analyzer == stop)
    var nonEmpty = 0
    for (q <- Seq("class", "import return", "buf_buf z100_id")) {
      val got = reader.searchBmw(q, 10).map(h => (h.docId, h.score)).toSeq
      val want = oracle.topK(q, 10).map(h => (h.docId, h.score)).toSeq
      assert(got.map(_._1) == want.map(_._1), s"stop-index ranks for '$q'")
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g._2 - w._2) <= 1e-9 * math.max(1.0, math.abs(w._2)),
          s"stop-index score drift for '$q'")
      }
      if (want.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 2, "stop-index gate near-vacuous")
    val gotBool = reader.searchBool(Seq("class"), Seq("import"), Seq("return"), 10)
      .map(h => (h.docId, h.score)).toSeq
    val wantBool = oracle.topKBool(Seq("class"), Seq("import"), Seq("return"), 10)
      .map(h => (h.docId, h.score)).toSeq
    assert(gotBool.map(_._1) == wantBool.map(_._1), "stop-index bool ranks")
  }

  test("query text is analyzed by the index's own analyzer") {
    // "def" is a stopword OF THIS INDEX: dropped from the query stream
    assert(reader.analyze("def class").toSeq == Seq("class"))
    // an all-stopword query matches nothing (ES: analyzed to zero terms)
    assert(reader.searchBmw("def val", 10).isEmpty)
    assert(reader.searchBool(Seq("def"), Nil, Nil, 10).isEmpty)
    assert(reader.analyze("class def").toSeq == Seq("class"))
  }

  test("phrase gaps: stopword hole breaks slop-0 adjacency, slop 1 bridges it") {
    val pdir = "/tmp/graft_test_analyzer_phrase"
    Tables.delete(spark, "/tmp", "graft_test_analyzer_phrase")
    val a = Analyzer(Set("the"))
    val docs = spark.createDataset(Seq(
      CodeFile("r", "p0", "c", "s", "alpha the beta gamma"), // gap between alpha/beta
      CodeFile("r", "p1", "c", "s", "alpha beta gamma"),     // adjacent
      CodeFile("r", "p2", "c", "s", "beta the alpha")))
    InvertedIndex.build(spark, docs, pdir, cfg.copy(analyzer = a), runId = "an-phrase")
    val r = new IndexReader(spark, pdir)
    val slop0 = r.matchPhraseDf("alpha beta").select("docId").as[Long].collect().toSet
    val slop1 = r.matchPhraseDf("alpha beta", slop = 1).select("docId").as[Long].collect().toSet
    assert(slop0.size == 1, s"slop 0 must match ONLY the adjacent doc, got $slop0")
    assert(slop1.size == 2, s"slop 1 must bridge the stopword gap, got $slop1")
    // a stopword INSIDE a positional query is refused loudly (pinned)
    intercept[IllegalArgumentException](r.matchPhraseDf("alpha the beta"))
    intercept[IllegalArgumentException](r.matchSpanNearDf("alpha the", 2))
    // registry dl counts kept tokens only
    val dls = Tables.read(spark, pdir, InvertedIndex.DocsTable)
      .select("path", "dl").as[(String, Int)].collect().toMap
    assert(dls == Map("p0" -> 3, "p1" -> 3, "p2" -> 2), s"stop dl: $dls")
  }

  test("analyzer immutability: delta refuses a mismatched analyzer; sidecar round-trips") {
    val extra = spark.createDataset(Seq(CodeFile("r", "pX", "c", "s", "class import")))
    intercept[IllegalArgumentException](
      DeltaIndex.addDocuments(spark, dir, extra, cfg.copy(analyzer = Analyzer.default),
        runId = "an-delta"))
    // matching analyzer is accepted (and the union still answers)
    DeltaIndex.addDocuments(spark, dir, extra, cfg, runId = "an-delta-ok")
    val r2 = new IndexReader(spark, dir)
    assert(r2.analyzer == stop)
    assert(r2.searchBmw("class", N.toInt + 2).nonEmpty)
    // pre-analyzer-era index (no sidecar) reads as the default analyzer
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val legacy = "/tmp/graft_test_analyzer_legacy"
    Tables.delete(spark, "/tmp", "graft_test_analyzer_legacy")
    InvertedIndex.build(spark, corpus.limit(50), legacy,
      cfg.copy(analyzer = Analyzer.default), runId = "an-legacy")
    fs.delete(new org.apache.hadoop.fs.Path(s"$legacy/ANALYZER"), false)
    assert(InvertedIndex.readAnalyzer(spark, legacy) == Analyzer.default)
  }
}
