package graft

import graft.fixtures.CorpusGen
import graft.index.{IndexConfig, InvertedIndex}
import graft.io.Tables
import graft.query.{Bm25, IndexReader, QueryString}
import graft.tokenize.CodeTokenizer
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** Gates for the round-6 composition family: query_string (parser +
  * BooleanQuery composition), dis_max, boosting, top_hits, composite
  * paging, filters agg. Every scoring gate compares against a brute
  * recomputation from raw tokenization — never against another engine
  * path alone.
  */
class QueryComposeSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  val N = 800L
  val dir = "/tmp/graft_test_qcompose"
  val cfg: IndexConfig = IndexConfig(partitions = 8, heavyDfThreshold = 200L, saltRunDocs = 200L)

  lazy val corpus = CorpusGen.dataset(spark, N, 8)
  lazy val reader = new IndexReader(spark, dir)

  lazy val tokensById: Map[Long, Array[String]] =
    corpus.toDF()
      .join(Tables.read(spark, dir, InvertedIndex.DocsTable)
        .select("docId", "repo", "path", "commit"), Seq("repo", "path", "commit"))
      .select(col("docId"), col("content")).as[(Long, String)]
      .collect().map { case (id, c) => id -> CodeTokenizer.tokenize(c) }.toMap

  override def beforeAll(): Unit = {
    super.beforeAll()
    Tables.delete(spark, "/tmp", "graft_test_qcompose")
    InvertedIndex.build(spark, corpus, dir, cfg, runId = "qcompose")
    ()
  }

  // --- brute helpers over raw tokenization --------------------------------
  private lazy val nDocs = tokensById.size.toLong
  private lazy val avgDl = tokensById.valuesIterator.map(_.length.toLong).sum.toDouble / nDocs
  private def dfOf(t: String): Long = tokensById.valuesIterator.count(_.contains(t)).toLong
  private def bm25Of(id: Long, t: String): Double = {
    val ts = tokensById(id)
    val tf = ts.count(_ == t).toLong
    if (tf == 0) 0.0
    else Bm25.idf(nDocs, dfOf(t)) * Bm25.tfNorm(tf, ts.length.toLong, avgDl, Bm25.Default)
  }
  /** match-query score: Σ over distinct ASC term order (the engine's pinned
    * fold) of the present terms' contributions.
    */
  private def matchScore(id: Long, q: String): Double =
    CodeTokenizer.tokenize(q).distinct.sorted.foldLeft(0.0)((acc, t) => acc + bm25Of(id, t))
  private def matchDocs(q: String): Set[Long] = {
    val ts = CodeTokenizer.tokenize(q).distinct
    tokensById.keysIterator.filter(id => ts.exists(tokensById(id).contains)).toSet
  }
  private def approxEq(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  // --- query_string parser -------------------------------------------------
  test("query_string parser: clause kinds, signs, loud errors") {
    import QueryString._
    assert(parse("a b") == Seq(Clause(Term("a"), 0), Clause(Term("b"), 0)))
    assert(parse("+a -b c") == Seq(Clause(Term("a"), 1), Clause(Term("b"), -1), Clause(Term("c"), 0)))
    assert(parse("\"x y\" +\"z w\"") ==
      Seq(Clause(Phrase("x y"), 0), Clause(Phrase("z w"), 1)))
    assert(parse("pre* +q* -r*") ==
      Seq(Clause(Prefix("pre"), 0), Clause(Prefix("q"), 1), Clause(Prefix("r"), -1)))
    assert(parse("  a   b  ") == Seq(Clause(Term("a"), 0), Clause(Term("b"), 0)))
    for (bad <- Seq("", "   ", "-a", "-a -b", "+", "a +", "\"unbalanced", "a\"b",
        "*a", "a*b", "a**", "\"\"", "x +-y"))
      intercept[IllegalArgumentException](parse(bad))
  }

  // --- query_string composition -------------------------------------------
  test("query_string pure-term forms == searchBoolDf (6-dp-equivalent association)") {
    val cases = Seq(
      ("def val", Nil, Seq("def", "val"), Nil),
      ("+def -val", Seq("def"), Nil, Seq("val")),
      ("+def +val z100_id", Seq("def", "val"), Seq("z100_id"), Nil))
    for ((qs, m, sh, n) <- cases) {
      val got = reader.queryStringDf(qs).as[(Long, Double)].collect().toMap
      val want = reader.searchBoolDf(m, sh, n).as[(Long, Double)].collect().toMap
      assert(got.keySet == want.keySet, s"query_string '$qs' doc set")
      for ((id, s) <- got) assert(approxEq(s, want(id)), s"'$qs' doc $id: $s vs ${want(id)}")
    }
    // single required term is ONE frame — no association at all, exact
    val one = reader.queryStringDf("+def").as[(Long, Double)].collect().toMap
    val oneWant = reader.searchBoolDf(Seq("def")).as[(Long, Double)].collect().toMap
    assert(one == oneWant)
  }

  test("query_string phrase-only == phraseScoreDf; prefix contributes exactly 1.0") {
    val ph = reader.queryStringDf("\"def val\"").as[(Long, Double)].collect().toMap
    val want = reader.phraseScoreDf("def val").as[(Long, Double)].collect().toMap
    assert(ph == want, "phrase-only query_string must be the scored phrase frame")
    // constant-score rewrite: every matching doc scores exactly 1.0
    val pfx = reader.queryStringDf("z10*").as[(Long, Double)].collect().toMap
    val expDocs = tokensById.keysIterator
      .filter(id => tokensById(id).exists(_.startsWith("z10"))).toSet
    assert(pfx.keySet == expDocs, "prefix clause doc set")
    assert(pfx.valuesIterator.forall(_ == 1.0), "prefix clause must contribute exactly 1.0")
  }

  test("query_string mixed clauses == brute composition (appearance-order fold)") {
    val got = reader.queryStringDf("+def \"def val\" va* -class")
      .as[(Long, Double)].collect().toMap
    val phToks = Array("def", "val")
    val idfSum = phToks.foldLeft(0.0)((acc, t) => acc + Bm25.idf(nDocs, dfOf(t)))
    def slide(ts: Array[String]): Int =
      (0 to ts.length - 2).count(i => ts(i) == "def" && ts(i + 1) == "val")
    val exp = tokensById.iterator.flatMap { case (id, ts) =>
      if (!ts.contains("def") || ts.contains("class")) None
      else {
        val ptf = slide(ts)
        val phScore =
          if (ptf == 0) 0.0
          else idfSum * Bm25.tfNorm(ptf.toLong, ts.length.toLong, avgDl, Bm25.Default)
        val pfxScore = if (ts.exists(_.startsWith("va"))) 1.0 else 0.0
        Some(id -> (bm25Of(id, "def") + phScore + pfxScore))
      }
    }.toMap
    assert(got.keySet == exp.keySet, "mixed query_string doc set")
    for ((id, s) <- got) assert(approxEq(s, exp(id), 1e-12), s"mixed doc $id: $s vs ${exp(id)}")
    // the gate must exercise every clause kind non-trivially
    assert(exp.nonEmpty && exp.valuesIterator.exists(_ >= 1.0), "no prefix-matching doc — fixture too sparse")
  }

  test("query_string with no required clause: match set = union of optional matches") {
    val got = reader.queryStringDf("\"def val\" z10*").as[(Long, Double)].collect().toMap
    def slide(ts: Array[String]): Boolean =
      (0 to ts.length - 2).exists(i => ts(i) == "def" && ts(i + 1) == "val")
    val expDocs = tokensById.keysIterator.filter { id =>
      slide(tokensById(id)) || tokensById(id).exists(_.startsWith("z10"))
    }.toSet
    assert(got.keySet == expDocs, "optional-union doc set")
    // a required ABSENT term empties the result even with matching optionals
    assert(reader.queryStringDf("+qqqzzznotfound \"def val\"").isEmpty)
    // a prohibited phrase excludes its docs
    val noPh = reader.queryStringDf("def -\"def val\"").as[(Long, Double)].collect().toMap
    assert(noPh.keySet == matchDocs("def").filterNot(id => slide(tokensById(id))))
  }

  // --- simple_query_string ---------------------------------------------------
  test("simple_query_string parser: lenient operators, infix AND, degrade-to-text") {
    import QueryString._
    assert(parseSimple("a b") == Seq(Clause(Term("a"), 0), Clause(Term("b"), 0)))
    assert(parseSimple("a | b") == Seq(Clause(Term("a"), 0), Clause(Term("b"), 0)))
    assert(parseSimple("a+b c") ==
      Seq(Clause(Term("a"), 1), Clause(Term("b"), 1), Clause(Term("c"), 0)))
    assert(parseSimple("+a") == Seq(Clause(Term("a"), 1)))
    assert(parseSimple("-a+b") == Seq(Clause(Term("a"), -1), Clause(Term("b"), -1)))
    assert(parseSimple("\"x y\" -\"z w\"") ==
      Seq(Clause(Phrase("x y"), 0), Clause(Phrase("z w"), -1)))
    assert(parseSimple("pre* -r*") ==
      Seq(Clause(Prefix("pre"), 0), Clause(Prefix("r"), -1)))
    // every input below throws in the classic parser; simple degrades silently
    assert(parseSimple("") == Seq.empty)
    assert(parseSimple("  |  ") == Seq.empty)
    assert(parseSimple("\"unclosed x") ==
      Seq(Clause(Term("unclosed"), 0), Clause(Term("x"), 0)))
    assert(parseSimple("a -") == Seq(Clause(Term("a"), 0)))
    assert(parseSimple("a * b") == Seq(Clause(Term("a"), 0), Clause(Term("b"), 0)))
  }

  test("simple_query_string == classic query_string where the grammars overlap") {
    val pairs = Seq(
      ("def val", "def | val"),
      ("+def -class \"def val\"", "+def -class \"def val\""),
      ("\"def val\" va* -class", "\"def val\" | va* -class"))
    for ((classic, simple) <- pairs) {
      val want = reader.queryStringDf(classic).as[(Long, Double)].collect().toMap
      val got = reader.simpleQueryStringDf(simple).as[(Long, Double)].collect().toMap
      assert(got == want, s"simple '$simple' vs classic '$classic'")
      assert(want.nonEmpty, s"'$classic' matched nothing — fixture too sparse")
    }
  }

  test("simple_query_string engine leniency: never throws; pure-negative/empty match nothing; analyzer fan-out") {
    assert(reader.simpleQueryStringDf("").isEmpty)
    assert(reader.simpleQueryStringDf("-def").isEmpty)
    assert(reader.simpleQueryStringDf("\"unclosed").isEmpty) // degrades to an absent term
    // a chunk the analyzer splits fans out to SHOULD clauses == the spaced form
    val dotted = reader.simpleQueryStringDf("def.val").as[(Long, Double)].collect().toMap
    val spaced = reader.simpleQueryStringDf("def val").as[(Long, Double)].collect().toMap
    assert(dotted == spaced && dotted.nonEmpty, "analyzer fan-out must equal the spaced form")
  }

  // --- dis_max --------------------------------------------------------------
  test("dis_max == brute max + tb·(sum − max) at tb in {0, 0.5, 1}; single query passthrough") {
    val (q1, q2) = ("def val", "class import")
    val docs = matchDocs(q1) ++ matchDocs(q2)
    assert(docs.nonEmpty && (matchDocs(q1) -- matchDocs(q2)).nonEmpty,
      "fixture too sparse: subquery doc sets must differ")
    for (tb <- Seq(0.0, 0.5, 1.0)) {
      val got = reader.disMaxDf(Seq(q1, q2), tb).as[(Long, Double)].collect().toMap
      val exp = docs.iterator.map { id =>
        val (s1, s2) = (matchScore(id, q1), matchScore(id, q2))
        val (mx, sum) = (math.max(s1, s2), s1 + s2)
        id -> (mx + tb * (sum - mx))
      }.toMap
      assert(got.keySet == exp.keySet, s"dis_max tb=$tb doc set")
      for ((id, s) <- got) assert(approxEq(s, exp(id)), s"dis_max tb=$tb doc $id")
    }
    val single = reader.disMaxDf(Seq(q1), 0.3).as[(Long, Double)].collect().toMap
    val want = reader.scoreAllDf(q1).as[(Long, Double)].collect().toMap
    assert(single == want, "single-subquery dis_max must be the plain match frame")
    intercept[IllegalArgumentException](reader.disMaxDf(Nil, 0.0))
    intercept[IllegalArgumentException](reader.disMaxDf(Seq(q1), 1.5))
  }

  // --- boosting ---------------------------------------------------------------
  test("boosting == positive frame with matching-negative docs demoted exactly ×nb") {
    val got = reader.boostingDf("def val", "z100_id", 0.5).as[(Long, Double)].collect().toMap
    val negDocs = matchDocs("z100_id")
    assert(negDocs.exists(matchDocs("def val")), "fixture too sparse: no demoted doc")
    val exp = matchDocs("def val").iterator.map { id =>
      val s = matchScore(id, "def val")
      id -> (if (negDocs(id)) s * 0.5 else s)
    }.toMap
    assert(got.keySet == exp.keySet)
    for ((id, s) <- got) assert(approxEq(s, exp(id)), s"boosting doc $id")
    for (bad <- Seq(0.0, 1.0, 1.5, -0.5))
      intercept[IllegalArgumentException](reader.boostingDf("def", "val", bad))
    // absent negative query terms -> error (nothing to demote is a caller bug)
    intercept[IllegalArgumentException](reader.boostingDf("def", "", 0.5))
  }

  // --- top_hits ---------------------------------------------------------------
  test("TopHitsAgg: bounded buffer, total-order determinism, merge == sort-take") {
    val agg = new graft.query.TopHitsAgg(3)
    val rnd = new scala.util.Random(11)
    val items = Array.fill(200)((rnd.nextInt(20).toDouble, rnd.nextLong().abs))
    val best = items.toSeq.sortBy { case (s, id) => (-s, id) }.take(3)
    // any arrival order reduces to the same top-3, buffer never exceeds n
    for (_ <- 1 to 5) {
      val shuffled = rnd.shuffle(items.toSeq)
      val buf = shuffled.foldLeft(agg.zero) { (b, x) =>
        val r = agg.reduce(b, x)
        assert(r.length <= 3, "buffer exceeded n")
        r
      }
      assert(agg.finish(buf) == best)
    }
    // merge of disjoint partials == global sort-take
    val (l, r) = items.splitAt(97)
    val bl = l.foldLeft(agg.zero)(agg.reduce)
    val br = r.foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(bl, br) == best && agg.merge(br, bl) == best)
  }

  test("top_hits groupBy plan: no Window, result == per-group brute pick") {
    // scores joined to a 4-value group column derived from docId
    val scores = reader.scoreAllDf("def val")
      .select(col("docId"), round(col("score"), 6).as("score"),
        (col("docId") % 4).cast("long").as("grp"))
    val top = udaf(new graft.query.TopHitsAgg(2))
    val out = scores.groupBy("grp").agg(top(col("score"), col("docId")).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), (col("pos") + 1).as("hit_rank"), col("col._2").as("docId"),
        col("col._1").as("score"))
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "top_hits must not plan a window over group partitions")
    val got = out.as[(Long, Int, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    val brute = scores.as[(Long, Double, Long)].collect().toSeq
      .groupBy(_._3).toSeq.flatMap { case (g, rows) =>
        rows.sortBy { case (id, s, _) => (-s, id) }.take(2).zipWithIndex
          .map { case ((id, s, _), i) => (g, i + 1, id, s) }
      }.sortBy(r => (r._1, r._2))
    assert(got == brute, "top_hits picks differ from the brute per-group cut")
  }

  // --- composite paging ---------------------------------------------------------
  test("composite terms pages concatenate to the full key-ordered dictionary") {
    val full = reader.termsCompositeDf(Int.MaxValue).as[(String, Long)].collect().toSeq
    val vocab = tokensById.valuesIterator.flatten.toSet
    assert(full.map(_._1) == vocab.toSeq.sorted, "composite full listing must be key-ordered vocabulary")
    for ((t, df) <- full) assert(df == dfOf(t), s"composite df for '$t'")
    // keyset pages: walk with after = previous page's last key
    val pageSize = 7
    var after: Option[String] = None
    val walked = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var page = reader.termsCompositeDf(pageSize, after).as[(String, Long)].collect().toSeq
    while (page.nonEmpty) {
      walked ++= page
      after = Some(page.last._1)
      page = reader.termsCompositeDf(pageSize, after).as[(String, Long)].collect().toSeq
    }
    assert(walked.toSeq == full, "keyset pages must concatenate to the full listing")
  }

  // --- filters agg ---------------------------------------------------------------
  test("filters agg == brute membership-conjunction counts; absent bucket kept at 0") {
    val filters = Seq(
      "dv" -> Seq("def val"),
      "zz" -> Seq("z100_id", "z101_id"),
      "gone" -> Seq("def qqqzzznotfound"))
    val got = reader.filtersAggDf(filters).as[(String, Long)].collect().toMap
    def conjCount(terms: Seq[String]): Long =
      tokensById.valuesIterator.count(ts => terms.forall(ts.contains)).toLong
    assert(got == Map(
      "dv" -> conjCount(Seq("def", "val")),
      "zz" -> conjCount(Seq("z100_id", "z101_id")),
      "gone" -> 0L))
    assert(got("dv") > 0 && got("zz") >= 0, "fixture too sparse")
    intercept[IllegalArgumentException](reader.filtersAggDf(Nil))
  }
}
