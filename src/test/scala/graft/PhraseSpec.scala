package graft

import graft.codec.PostingsCodec
import graft.fixtures.CorpusGen
import graft.index.{DeltaIndex, IndexConfig, InvertedIndex}
import graft.io.Tables
import graft.query.IndexReader
import graft.tokenize.CodeTokenizer
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** Positional phrase matching (B15) against an exhaustive oracle: the
  * reference result is computed by tokenizing every document directly and
  * sliding the phrase window over the token stream — no index involved. The
  * engine path (positions through the salted SPIMI build, block pos
  * payloads, bucketed intersect + lazy position decode) must agree exactly
  * on (docId, phraseTf) for every phrase, including duplicate-token and
  * absent-term phrases.
  */
class PhraseSpec extends SparkSpec with BeforeAndAfterAll {
  val N = 800L
  val dir = "/tmp/graft_test_phrase"
  // salting forced on (low threshold) so phrase terms cross salted runs
  val cfg: IndexConfig = IndexConfig(partitions = 8, heavyDfThreshold = 200L, saltRunDocs = 200L)

  lazy val corpus = CorpusGen.dataset(spark, N, 8)
  lazy val reader = new IndexReader(spark, dir)

  // docId -> token stream, via the registry locator join (the docs table
  // stores no content)
  lazy val tokensById: Map[Long, Array[String]] = {
    import spark.implicits._
    corpus.toDF()
      .join(Tables.read(spark, dir, InvertedIndex.DocsTable)
        .select("docId", "repo", "path", "commit"), Seq("repo", "path", "commit"))
      .select(col("docId"), col("content")).as[(Long, String)]
      .collect().map { case (id, c) => id -> CodeTokenizer.tokenize(c) }.toMap
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    Tables.delete(spark, "/tmp", "graft_test_phrase")
    InvertedIndex.build(spark, corpus, dir, cfg, runId = "phrase")
    ()
  }

  def slideCount(tokens: Array[String], phrase: Array[String]): Int = {
    var c = 0
    var i = 0
    while (i + phrase.length <= tokens.length) {
      var j = 0
      var ok = true
      while (ok && j < phrase.length) {
        if (tokens(i + j) != phrase(j)) ok = false
        j += 1
      }
      if (ok) c += 1
      i += 1
    }
    c
  }

  def oracle(phrase: String): Map[Long, Int] = {
    val p = CodeTokenizer.tokenize(phrase)
    tokensById.iterator
      .map { case (id, ts) => id -> slideCount(ts, p) }
      .filter(_._2 > 0).toMap
  }

  def engine(phrase: String): Map[Long, Int] = {
    import spark.implicits._
    reader.matchPhraseDf(phrase).as[(Long, Int)].collect().toMap
  }

  val phrases = Seq(
    "def val",                 // stopword-scale pair
    "return if",               // stopword-scale pair
    "def def",                 // duplicate-token phrase
    "def val class",           // 3-token
    "val qqqzzznotfound",      // absent term -> conjunctive empty
    "buf_buf",                 // single token: phraseTf == tf
    "Def VAL")                 // case folding in the phrase analyzer

  test("phrase engine == exhaustive slide oracle on every phrase") {
    var nonEmpty = 0
    for (ph <- phrases) {
      val exp = oracle(ph)
      val got = engine(ph)
      assert(got == exp, s"phrase '$ph': engine $got vs oracle $exp")
      if (exp.nonEmpty) nonEmpty += 1
    }
    // the gate must not pass vacuously on an all-empty phrase set
    assert(nonEmpty >= 4, s"only $nonEmpty phrases matched anything — fixture too sparse")
  }

  test("phrase across base ∪ delta segments (positions in composite serving)") {
    import spark.implicits._
    val ddir = "/tmp/graft_test_phrase_delta"
    Tables.delete(spark, "/tmp", "graft_test_phrase_delta")
    val base = corpus.filter(f => math.abs(f.path.hashCode % 5) != 0)
    val extra = corpus.filter(f => math.abs(f.path.hashCode % 5) == 0)
    InvertedIndex.build(spark, base, ddir, cfg, runId = "phrase-base")
    DeltaIndex.addDocuments(spark, ddir, extra, cfg, runId = "phrase-delta")
    val r = new IndexReader(spark, ddir)
    // compare doc SETS via the stable (repo,path,commit)-independent count
    // per phrase: composite docIds differ from the single build's, so
    // compare multisets of phraseTf joined back through the registries
    for (ph <- Seq("def val", "def def", "val class")) {
      val exp = oracle(ph).toSeq.map(_._2).sorted
      val got = r.matchPhraseDf(ph).as[(Long, Int)].collect().toSeq.map(_._2).sorted
      assert(got == exp, s"composite phrase '$ph' multiset mismatch")
    }
  }

  test("positions codec round-trip (per-posting VByte streams split by tf)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val nPostings = 1 + rnd.nextInt(8)
      val perDoc = Array.fill(nPostings) {
        val tf = 1 + rnd.nextInt(6)
        val ps = scala.collection.mutable.SortedSet.empty[Int]
        while (ps.size < tf) ps += rnd.nextInt(100000)
        ps.toArray
      }
      val tfs = perDoc.map(_.length)
      val concat = perDoc.flatMap(PostingsCodec.encodePositions)
      val back = PostingsCodec.decodePositions(tfs, concat)
      assert(back.map(_.toSeq).toSeq == perDoc.map(_.toSeq).toSeq)
    }
  }

  test("TfPosCounter positions == tokenize-stream positions (differential)") {
    val docs = (0L until 50L).map(CorpusGen.row).map(_.content) :+ "" :+ "a b a b a"
    for (c <- docs) {
      val toks = CodeTokenizer.tokenize(c)
      val expected = toks.zipWithIndex.groupBy(_._1)
        .map { case (t, xs) => t -> xs.map(_._2).toSeq }
      val m = CodeTokenizer.tfPos(c)
      assert(m.dl == toks.length)
      val got = m.iterator.map { case (t, tf, bytes) =>
        val ps = PostingsCodec.decodePositions(Array(tf), bytes)(0)
        t -> ps.toSeq
      }.toMap
      assert(got == expected)
    }
  }

  /** Independent slop oracle: a start i (tokens(i) == phrase(0)) matches
    * when SOME strictly increasing index chain within the span budget
    * n-1+slop realizes the phrase — brute-force DFS over the window, no
    * greedy assumption shared with the engine.
    */
  def slopCount(tokens: Array[String], phrase: Array[String], slop: Int): Int = {
    val n = phrase.length
    def exists(start: Int, k: Int, prev: Int): Boolean =
      k == n || (prev + 1 to math.min(start + n - 1 + slop, tokens.length - 1)).exists(j =>
        tokens(j) == phrase(k) && exists(start, k + 1, j))
    tokens.indices.count(i => tokens(i) == phrase(0) && exists(i, 1, i))
  }

  def slopOracle(phrase: String, slop: Int): Map[Long, Int] = {
    val p = CodeTokenizer.tokenize(phrase)
    tokensById.iterator
      .map { case (id, ts) => id -> slopCount(ts, p, slop) }
      .filter(_._2 > 0).toMap
  }

  test("slop semantics: DFS oracle at slop 0 == exact slide-window oracle") {
    for (ph <- phrases) {
      val p = CodeTokenizer.tokenize(ph)
      for ((id, ts) <- tokensById.take(200))
        assert(slopCount(ts, p, 0) == slideCount(ts, p),
          s"slop-0 DFS vs slide for '$ph' doc $id")
    }
  }

  test("sloppy phrase engine == DFS oracle at slop in {0, 1, 2}") {
    import spark.implicits._
    var nonTrivial = 0
    for (ph <- Seq("def val", "def def", "def val class", "return if"); sl <- Seq(0, 1, 2)) {
      val exp = slopOracle(ph, sl)
      val got = reader.matchPhraseDf(ph, sl).as[(Long, Int)].collect().toMap
      assert(got == exp, s"phrase '$ph' slop $sl: engine ${got.size} docs vs oracle ${exp.size}")
      // the gate is vacuous unless slop actually ADMITS new matches somewhere
      if (sl > 0 && exp != slopOracle(ph, 0)) nonTrivial += 1
    }
    assert(nonTrivial >= 2, s"slop never changed any result — fixture too sparse for the gate")
  }

  /** phrase-prefix DFS oracle: last slot matches by startsWith, other
    * slots exactly; same span-budget chain semantics.
    */
  def prefixSlopCount(tokens: Array[String], fixed: Array[String], prefix: String,
      slop: Int): Int = {
    val n = fixed.length + 1
    def slotOk(k: Int, t: String): Boolean =
      if (k == n - 1) t.startsWith(prefix) else t == fixed(k)
    def exists(start: Int, k: Int, prev: Int): Boolean =
      k == n || (prev + 1 to math.min(start + n - 1 + slop, tokens.length - 1)).exists(j =>
        slotOk(k, tokens(j)) && exists(start, k + 1, j))
    tokens.indices.count(i => slotOk(0, tokens(i)) && exists(i, 1, i))
  }

  test("match_phrase_prefix engine == DFS oracle (incl. slop and expansion edge cases)") {
    import spark.implicits._
    var nonEmpty = 0
    // (phrase input, fixed tokens, prefix) — matchPhrasePrefixDf takes the
    // raw string and treats the LAST analyzed token as the prefix
    val cases = Seq(("def v", Array("def"), "v"), ("return cl", Array("return"), "cl"),
      ("def d", Array("def"), "d"), // expansion overlaps the fixed token
      ("val qqq", Array("val"), "qqq")) // empty expansion -> empty result
    for ((ph, fixed, prefix) <- cases; sl <- Seq(0, 1)) {
      val exp = tokensById.iterator
        .map { case (id, ts) => id -> prefixSlopCount(ts, fixed, prefix, sl) }
        .filter(_._2 > 0).toMap
      val got = reader.matchPhrasePrefixDf(ph, maxExpansions = 1000, slop = sl)
        .as[(Long, Int)].collect().toMap
      assert(got == exp, s"phrase_prefix '$ph' slop $sl: ${got.size} vs ${exp.size} docs")
      if (exp.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 4, "phrase-prefix gate near-vacuous — fixture too sparse")
  }

  test("span_near engine == brute-force min-cover oracle (k = 2 and 3, several slops)") {
    import spark.implicits._
    // brute force: min over the cartesian product of one position per term
    def bruteGap(tokens: Array[String], terms: Array[String]): Option[Int] = {
      val lists = terms.map(t => tokens.zipWithIndex.filter(_._1 == t).map(_._2))
      if (lists.exists(_.isEmpty)) return None
      def combos(ls: List[Array[Int]]): Iterator[List[Int]] = ls match {
        case Nil => Iterator(Nil)
        case h :: t => h.iterator.flatMap(v => combos(t).map(v :: _))
      }
      Some(combos(lists.toList).map(c => (c.max - c.min + 1) - terms.length).min)
    }
    var nonEmpty = 0
    for (q <- Seq("def val", "return if", "def val class"); sl <- Seq(0, 1, 3, 8)) {
      val terms = CodeTokenizer.tokenize(q).distinct.sorted
      val exp = tokensById.iterator.flatMap { case (id, ts) =>
        bruteGap(ts, terms).filter(_ <= sl).map(id -> _)
      }.toMap
      val got = reader.matchSpanNearDf(q, sl).as[(Long, Int)].collect().toMap
      assert(got == exp, s"span_near '$q' slop $sl: ${got.size} vs ${exp.size} docs")
      if (exp.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 6, "span-near gate near-vacuous")
    // unordered: order of terms in the doc must not matter — a doc matching
    // "join ... hash" (reverse order) is found; the DFS ordered oracle at
    // the same slop would reject it, so assert the sets genuinely differ
    val unord = reader.matchSpanNearDf("def val", 0).as[(Long, Int)].collect().toMap
    val ord = slopOracle("def val", 0).keySet
    assert(ord.subsetOf(unord.keySet), "ordered matches must be a subset of unordered")
    assert(unord.keySet != ord, "no reverse-order matches in fixture — unordered gate vacuous")
  }

  test("span_containing/within == brute window-containment oracle; degenerate shapes loud") {
    import spark.implicits._
    def bruteSpans(ts: Array[String], a: String, b: String, slop: Int): Set[(Int, Int)] = {
      val pa = ts.zipWithIndex.filter(_._1 == a).map(_._2)
      val pb = ts.zipWithIndex.filter(_._1 == b).map(_._2)
      (for (x <- pa; y <- pb; s = math.min(x, y); e = math.max(x, y)
            if e - s - 1 <= slop) yield (s, e)).toSet
    }
    var (nzC, nzW) = (0, 0)
    for ((a, b, c, sl) <- Seq(("def", "val", "class", 3), ("return", "if", "def", 5),
        ("def", "val", "import", 8))) {
      val expC = tokensById.iterator.flatMap { case (id, ts) =>
        val wins = bruteSpans(ts, a, b, sl)
        val pc = ts.zipWithIndex.filter(_._1 == c).map(_._2)
        val n = wins.count { case (s, e) => pc.exists(p => s <= p && p <= e) }
        if (n > 0) Some(id -> n) else None
      }.toMap
      val gotC = reader.matchSpanContainingDf(a, b, sl, c).as[(Long, Int)].collect().toMap
      assert(gotC == expC, s"containing ($a,$b,$c,$sl): ${gotC.size} vs ${expC.size}")
      val expW = tokensById.iterator.flatMap { case (id, ts) =>
        val wins = bruteSpans(ts, a, b, sl)
        val n = ts.zipWithIndex.filter(_._1 == c).map(_._2)
          .count(p => wins.exists { case (s, e) => s <= p && p <= e })
        if (n > 0) Some(id -> n) else None
      }.toMap
      val gotW = reader.matchSpanWithinDf(a, b, sl, c).as[(Long, Int)].collect().toMap
      assert(gotW == expW, s"within ($a,$b,$c,$sl): ${gotW.size} vs ${expW.size}")
      if (expC.nonEmpty) nzC += 1
      if (expW.nonEmpty) nzW += 1
    }
    assert(nzC >= 2 && nzW >= 2, "containment gates near-vacuous — fixture too sparse")
    intercept[IllegalArgumentException](reader.matchSpanContainingDf("def", "def", 2, "val"))
    intercept[IllegalArgumentException](reader.matchSpanWithinDf("def", "val", 2, "def"))
    intercept[IllegalArgumentException](reader.matchSpanContainingDf("def", "val", -1, "class"))
  }

  test("scored phrase == brute idf-sum × tfNorm over raw tokenization (incl. duplicates, slop)") {
    import spark.implicits._
    import graft.query.Bm25
    val nDocs = tokensById.size.toLong
    def df(t: String): Long = tokensById.valuesIterator.count(_.contains(t)).toLong
    val avgDl = tokensById.valuesIterator.map(_.length.toLong).sum.toDouble / nDocs
    var nonEmpty = 0
    // "def def" exercises the duplicate-token pin: idfSum counts idf(def) TWICE
    for ((ph, sl) <- Seq(("def val", 0), ("def val", 1), ("def def", 0), ("buf_buf", 0))) {
      val toks = CodeTokenizer.tokenize(ph)
      val idfSum = toks.foldLeft(0.0)((acc, t) => acc + Bm25.idf(nDocs, df(t)))
      val exp = tokensById.iterator.flatMap { case (id, ts) =>
        val ptf = slopCount(ts, toks, sl)
        if (ptf == 0) None
        else Some(id -> idfSum * Bm25.tfNorm(ptf.toLong, ts.length.toLong, avgDl, Bm25.Default))
      }.toMap
      val got = reader.phraseScoreDf(ph, sl).as[(Long, Double)].collect().toMap
      assert(got.keySet == exp.keySet, s"scored phrase '$ph' slop $sl doc set")
      for ((id, s) <- got)
        assert(math.abs(s - exp(id)) <= 1e-12 * math.max(1.0, math.abs(exp(id))),
          s"scored phrase '$ph' slop $sl doc $id: $s vs ${exp(id)}")
      if (exp.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 3, "scored-phrase gate near-vacuous — fixture too sparse")
    // absent term -> conjunctive empty frame (score schema, zero rows)
    assert(reader.phraseScoreDf("def qqqzzznotfound").isEmpty)
  }

  test("phrase query against a frequency-only index fails loudly") {
    val fdir = "/tmp/graft_test_phrase_nopos"
    Tables.delete(spark, "/tmp", "graft_test_phrase_nopos")
    InvertedIndex.build(spark, corpus.limit(50), fdir,
      cfg.copy(storePositions = false), runId = "nopos")
    val r = new IndexReader(spark, fdir)
    val e = intercept[IllegalArgumentException](r.matchPhraseDf("def val"))
    assert(e.getMessage.contains("storePositions"))
  }
}
