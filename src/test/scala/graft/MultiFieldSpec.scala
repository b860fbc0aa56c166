package graft

import graft.fixtures.CorpusGen
import graft.index.{IndexConfig, InvertedIndex, MultiFieldIndex}
import graft.io.Tables
import graft.oracle.ExhaustiveScorer
import org.apache.spark.sql.functions._

/** Multi-field gate (VERDICT r2 item 6): per-field sub-indexes carry each
  * field's OWN df/avgdl; fielded match and the cross-field OR must be
  * rank-identical to per-field exhaustive scoring (summed for the OR).
  */
class MultiFieldSpec extends SparkSpec {
  import spark.implicits._

  val N = 600L
  val dir = "/tmp/graft_mf_test"
  val cfg: IndexConfig = IndexConfig(partitions = 8, heavyDfThreshold = 200L, saltRunDocs = 200L)

  // two analyzed fields: the code content, and a short metadata field
  // (lang + repo) — the shape of the reference's schema.org entities
  lazy val src = CorpusGen.dataset(spark, N, 4).toDF()
    .withColumn("meta", concat_ws(" ", col("lang"), col("repo")))
    .select("repo", "path", "commit", "lang", "content", "meta")

  lazy val built: Unit = {
    Tables.delete(spark, "/tmp", "graft_mf_test")
    MultiFieldIndex.build(spark, src, Seq("content", "meta"), dir, cfg, "mf")
  }

  private def fieldOracle(field: String): ExhaustiveScorer.Prepared = {
    val reg = Tables.read(spark, MultiFieldIndex.fieldDir(dir, field), InvertedIndex.DocsTable)
      .select("docId", "repo", "path", "commit")
    val docs = src.join(reg, Seq("repo", "path", "commit"))
      .select(col("docId"), col(field).as("content")).as[ExhaustiveScorer.OracleDoc]
    ExhaustiveScorer.prepare(spark, docs)
  }

  test("docIds aligned across field sub-indexes (same key -> same id)") {
    built
    def ids(f: String) = Tables.read(spark, MultiFieldIndex.fieldDir(dir, f), InvertedIndex.DocsTable)
      .select(concat_ws("|", col("repo"), col("path"), col("commit")).as("k"), col("docId"))
    val mism = ids("content").as("a").join(ids("meta").as("b"), Seq("k"))
      .where(col("a.docId") =!= col("b.docId")).count()
    assert(mism == 0, "a document got different docIds in two field sub-indexes")
  }

  test("per-field stats are the field's own (meta avgdl << content avgdl)") {
    built
    val stC = InvertedIndex.readStats(spark, MultiFieldIndex.fieldDir(dir, "content"))
    val stM = InvertedIndex.readStats(spark, MultiFieldIndex.fieldDir(dir, "meta"))
    assert(stC.numDocs == N && stM.numDocs == N)
    assert(stM.avgDl < stC.avgDl / 4, s"meta avgdl ${stM.avgDl} should be far below content's ${stC.avgDl}")
  }

  test("fielded match == exhaustive scorer on that field") {
    built
    val oracleM = fieldOracle("meta")
    for (q <- Seq("scala repo0001", "rust", "java repo0002 repo0003")) {
      val got = MultiFieldIndex.matchField(spark, dir, "meta", q, 10)
      val want = oracleM.topK(q, 10)
      assert(got.map(_.docId).toSeq == want.map(_.docId).toSeq, s"fielded ranks for '$q'")
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g.score - w.score) <= 1e-9 * math.max(1.0, math.abs(w.score)))
      }
    }
  }

  test("multi_match OR == sum of per-field exhaustive scores") {
    built
    val oracleC = fieldOracle("content")
    val oracleM = fieldOracle("meta")
    for (q <- Seq("def scala", "rust z100_id", "val repo0001")) {
      val sc = oracleC.topK(q, Int.MaxValue).map(s => s.docId -> s.score).toMap
      val sm = oracleM.topK(q, Int.MaxValue).map(s => s.docId -> s.score).toMap
      val want = (sc.keySet ++ sm.keySet).map(d => d -> (sc.getOrElse(d, 0.0) + sm.getOrElse(d, 0.0))).toMap
      val got = MultiFieldIndex.multiMatchScoreAll(spark, dir, Seq("content", "meta"), q)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == want.keySet, s"multi_match doc set for '$q'")
      got.foreach { case (d, s) =>
        assert(math.abs(s - want(d)) <= 1e-9 * math.max(1.0, math.abs(want(d))), s"score for doc $d, '$q'")
      }
    }
  }

  test("per-field DELTA segments stay docId-aligned across fields (B13 × B14)") {
    import graft.index.DeltaIndex
    import graft.fixtures.CodeFile
    built
    val dir2 = "/tmp/graft_mf_delta"
    Tables.delete(spark, "/tmp", "graft_mf_delta")
    val isExtra = abs(hash(col("path")) % 5) === 0
    MultiFieldIndex.build(spark, src.where(!isExtra), Seq("content", "meta"), dir2, cfg, "mfd")
    for (f <- Seq("content", "meta")) {
      val cf = src.where(isExtra)
        .select(col("repo"), col("path"), col("commit"), col("lang"),
          coalesce(col(f).cast("string"), lit("")).as("content")).as[CodeFile]
      DeltaIndex.addDocuments(spark, MultiFieldIndex.fieldDir(dir2, f), cf, cfg, s"mfd-$f")
      ()
    }
    // both fields' delta builds saw the same key set, cfg, and docIdBase,
    // so composite docIds stay ALIGNED across fields — multi_match over the
    // delta-maintained pair must equal the suite's full build, compared by
    // the stable document key
    def keyed(d: String): Map[String, Double] = {
      val r = MultiFieldIndex.multiMatchScoreAll(spark, d, Seq("content", "meta"), "def scala")
      val regs = DeltaIndex.segmentDirs(spark, MultiFieldIndex.fieldDir(d, "content"))
        .map(s => Tables.read(spark, s, InvertedIndex.DocsTable)
          .select(col("docId"), concat_ws("|", col("repo"), col("path"), col("commit")).as("k")))
        .reduce(_ unionByName _)
      r.join(regs, Seq("docId")).select("k", "score")
        .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    }
    val got = keyed(dir2)
    val want = keyed(dir)
    assert(got.keySet == want.keySet, "delta-maintained multi-field doc set diverges from full build")
    got.foreach { case (key, s) =>
      assert(math.abs(s - want(key)) <= 1e-9 * math.max(1.0, math.abs(want(key))),
        s"score for $key")
    }
  }

  test("field boosts: parse specs; boosted WAND == boosted rank-all bit-exact; linear scaling") {
    built
    assert(MultiFieldIndex.parseFieldBoost("content^2") == ("content", 2.0))
    assert(MultiFieldIndex.parseFieldBoost("meta") == ("meta", 1.0))
    assert(MultiFieldIndex.parseFieldBoost("meta^1.5") == ("meta", 1.5))
    intercept[IllegalArgumentException](MultiFieldIndex.parseFieldBoost("f^0"))
    intercept[IllegalArgumentException](MultiFieldIndex.parseFieldBoost("f^-1"))
    intercept[IllegalArgumentException](MultiFieldIndex.parseFieldBoost("f^2^3"))
    // boosted WAND == boosted rank-all + limit, bit-exact — boosts scale at
    // the term-meta level on BOTH paths, so the b14 exactness protocol
    // carries over unchanged for ANY boost (not just powers of two)
    for (q <- Seq("def scala", "rust z100_id", "val repo0001");
        fields <- Seq(Seq("content^2", "meta"), Seq("content", "meta^4"),
          Seq("content^1.5", "meta^0.5"))) {
      for (k <- Seq(5, 25)) {
        val want = MultiFieldIndex.multiMatchScoreAll(spark, dir, fields, q)
          .orderBy(desc("score"), asc("docId")).limit(k)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val got = MultiFieldIndex.multiMatchTopK(spark, dir, fields, q, k)
          .map(h => (h.docId, h.score)).toSeq
        assert(got == want, s"boosted multiMatchTopK differs for '$q' $fields k=$k")
      }
    }
    // linearity vs the exhaustive oracle: content^2 == 2·content + meta
    val oracleC = fieldOracle("content")
    val oracleM = fieldOracle("meta")
    val q = "def scala"
    val sc = oracleC.topK(q, Int.MaxValue).map(s => s.docId -> s.score).toMap
    val sm = oracleM.topK(q, Int.MaxValue).map(s => s.docId -> s.score).toMap
    val want = (sc.keySet ++ sm.keySet)
      .map(d => d -> (2 * sc.getOrElse(d, 0.0) + sm.getOrElse(d, 0.0))).toMap
    val got = MultiFieldIndex.multiMatchScoreAll(spark, dir, Seq("content^2", "meta"), q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet, "boosted multi_match doc set")
    got.foreach { case (d, s) =>
      assert(math.abs(s - want(d)) <= 1e-9 * math.max(1.0, math.abs(want(d))),
        s"boosted score for doc $d")
    }
  }

  test("best_fields / tie_breaker: bounded == rank-all bit-exact; combine == per-field oracle max") {
    built
    // bounded ≡ rank-all at tie_breaker 0 (ES default best_fields), 0.3,
    // and 1.0 (sum — must stay bit-identical to the ungrouped fold)
    for (q <- Seq("def scala", "rust z100_id", "val repo0001"); tb <- Seq(0.0, 0.3, 1.0);
        k <- Seq(5, 25)) {
      val want = MultiFieldIndex.multiMatchScoreAll(spark, dir, Seq("content", "meta"), q, tb)
        .orderBy(desc("score"), asc("docId")).limit(k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = MultiFieldIndex.multiMatchTopK(spark, dir, Seq("content", "meta"), q, k, tb)
        .map(h => (h.docId, h.score)).toSeq
      assert(got == want, s"best_fields topk differs for '$q' tb=$tb k=$k")
    }
    // semantic check vs the exhaustive per-field oracles: tb=0 == max,
    // tb=0.3 == max + 0.3·(sum − max)
    val oracleC = fieldOracle("content")
    val oracleM = fieldOracle("meta")
    val q = "def scala"
    val sc = oracleC.topK(q, Int.MaxValue).map(s => s.docId -> s.score).toMap
    val sm = oracleM.topK(q, Int.MaxValue).map(s => s.docId -> s.score).toMap
    for (tb <- Seq(0.0, 0.3)) {
      val want = (sc.keySet ++ sm.keySet).map { d =>
        val (a, b) = (sc.getOrElse(d, 0.0), sm.getOrElse(d, 0.0))
        val mx = math.max(a, b)
        d -> (mx + tb * ((a + b) - mx))
      }.toMap
      val got = MultiFieldIndex.multiMatchScoreAll(spark, dir, Seq("content", "meta"), q, tb)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == want.keySet, s"best_fields doc set tb=$tb")
      got.foreach { case (d, s) =>
        assert(math.abs(s - want(d)) <= 1e-9 * math.max(1.0, math.abs(want(d))),
          s"best_fields score for doc $d tb=$tb")
      }
    }
    intercept[IllegalArgumentException](
      MultiFieldIndex.multiMatchScoreAll(spark, dir, Seq("content"), "def", 1.5))
  }

  test("multiMatchTopK == rank-all + limit, bit-exact (cross-field WAND gate)") {
    built
    for (q <- Seq("def scala", "rust z100_id", "val repo0001", "scala repo0001 buf_buf",
        "qqqzzznotfound", "def val class scala java")) {
      for (k <- Seq(1, 5, 10, 25)) {
        val want = MultiFieldIndex.multiMatchScoreAll(spark, dir, Seq("content", "meta"), q)
          .orderBy(desc("score"), asc("docId")).limit(k)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val got = MultiFieldIndex.multiMatchTopK(spark, dir, Seq("content", "meta"), q, k)
          .map(h => (h.docId, h.score)).toSeq
        // BIT-exact: the groupOf per-field partial summation reproduces the
        // relational form's float association, so == (not tolerance) is the
        // assertion — any drift means the orders diverged
        assert(got == want, s"multiMatchTopK differs from rank-all+limit for '$q' k=$k")
      }
    }
  }

  // cross_fields needs a fixture whose FIELDS SHARE VOCABULARY with
  // differing dfs (the driver corpus's text/tags vocabularies are disjoint,
  // so its row can't exercise the blend): head = a content prefix — every
  // head term is rarer than or equal to its content twin, and the
  // truncation tail mints head-only terms, so the blend runs both ways.
  val xdir = "/tmp/graft_xf_test"
  lazy val srcX = CorpusGen.dataset(spark, N, 4).toDF()
    .withColumn("head", substring(col("content"), 1, 120))
    .select("repo", "path", "commit", "lang", "content", "head")
  lazy val builtX: Unit = {
    Tables.delete(spark, "/tmp", "graft_xf_test")
    MultiFieldIndex.build(spark, srcX, Seq("content", "head"), xdir, cfg, "xf")
  }

  test("cross_fields == brute blended-idf dismax oracle; bounded == rank-all bit-exact") {
    builtX
    import graft.query.Bm25
    import graft.tokenize.CodeTokenizer
    val reg = Tables.read(spark, MultiFieldIndex.fieldDir(xdir, "content"), InvertedIndex.DocsTable)
      .select("docId", "repo", "path", "commit")
    val rows = srcX.join(reg, Seq("repo", "path", "commit"))
      .select(col("docId"), col("content"), col("head"))
      .as[(Long, String, String)].collect()
    val nD = rows.length.toLong
    val fields: Seq[Map[Long, Array[String]]] = Seq(
      rows.map(r => r._1 -> CodeTokenizer.tokenize(r._2)).toMap,
      rows.map(r => r._1 -> CodeTokenizer.tokenize(r._3)).toMap)
    val avgdls = fields.map(f => f.valuesIterator.map(_.length.toLong).sum.toDouble / nD)
    def dfOf(f: Map[Long, Array[String]], t: String): Long =
      f.valuesIterator.count(_.contains(t)).toLong
    // the blend must be REAL here: a term present in BOTH fields with
    // differing dfs, or the gate pins nothing the per-field form wouldn't
    val blended = Seq("def", "val", "class", "import").filter(t =>
      dfOf(fields(1), t) > 0 && dfOf(fields(1), t) != dfOf(fields(0), t))
    assert(blended.nonEmpty, "fixture has no shared term with differing dfs — blend unexercised")
    val readers = Seq("content", "head")
      .map(f => new graft.query.IndexReader(spark, MultiFieldIndex.fieldDir(xdir, f)))
    for ((q, tb) <- Seq(("def val", 0.0), (s"${blended.head} z100_id", 0.3),
        ("class import return", 1.0))) {
      val qts = CodeTokenizer.tokenize(q).distinct.sorted
      val blend = qts.flatMap { t =>
        val mx = fields.map(dfOf(_, t)).max
        if (mx == 0L) None else Some(t -> Bm25.idf(nD, mx))
      }.toMap
      val want = rows.map(_._1).collect(Function.unlift { id =>
        val perTerm = qts.filter(blend.contains).map { t =>
          val cs = fields.zip(avgdls).flatMap { case (f, ad) =>
            val tf = f(id).count(_ == t).toLong
            if (tf == 0L) None
            else Some(blend(t) * Bm25.tfNorm(tf, f(id).length.toLong, ad, Bm25.Default))
          }
          if (cs.isEmpty) 0.0
          else {
            val sm = cs.foldLeft(0.0)(_ + _)
            val mx = cs.max
            if (tb == 1.0) sm else mx + tb * (sm - mx)
          }
        }
        val s = perTerm.sum
        if (s > 0.0) Some(id -> s) else None
      }).toSeq.sortBy { case (id, s) => (-s, id) }
      val rankAll = MultiFieldIndex.crossFieldsScoreAllReaders(spark, readers, q, tieBreaker = tb)
        .orderBy(desc("score"), asc("docId")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rankAll.map(_._1) == want.map(_._1), s"cross_fields ranks for '$q' tb=$tb")
      rankAll.zip(want).foreach { case (g, w) =>
        assert(math.abs(g._2 - w._2) <= 1e-9 * math.max(1.0, math.abs(w._2)),
          s"cross_fields score for doc ${g._1} under '$q' tb=$tb: ${g._2} vs ${w._2}")
      }
      for (k <- Seq(1, 5, 20)) {
        val got = MultiFieldIndex.crossFieldsTopKDs(spark, readers, q, k, tieBreaker = tb)
          .collect().map(h => (h.docId, h.score)).toSeq
        // BIT-exact: the dismaxWithinGroups transpose folds the same
        // doubles in the same order as the relational (fi, term) aggregate
        assert(got == rankAll.take(k), s"cross_fields topK != rank-all+limit for '$q' tb=$tb k=$k")
      }
    }
  }

  test("multiMatchTopKReaders over external readers == field-dir form; geometry sidecars equal") {
    built
    // the alignment predicate DocumentsIndex.multiMatch gates on: one build
    // over one key set/partitions/docIdBase stamps IDENTICAL PLAN_GEOMETRY
    // sidecars on every field sub-index
    val geoms = Seq("content", "meta")
      .map(f => InvertedIndex.readPlanGeometry(spark, MultiFieldIndex.fieldDir(dir, f)))
    assert(geoms.forall(_.isDefined) && geoms.distinct.size == 1,
      s"field sub-index geometries diverge: $geoms")
    val readers = Seq("content", "meta")
      .map(f => new graft.query.IndexReader(spark, MultiFieldIndex.fieldDir(dir, f)))
    for (q <- Seq("def scala", "val repo0001")) {
      val viaFields = MultiFieldIndex.multiMatchTopK(spark, dir, Seq("content", "meta"), q, 10)
        .map(h => (h.docId, h.score)).toSeq
      val viaReaders = MultiFieldIndex.multiMatchTopKReaders(spark, readers, q, 10)
        .map(h => (h.docId, h.score)).toSeq
      assert(viaReaders == viaFields, s"reader-form multiMatchTopK diverges for '$q'")
    }
  }
}
