package graft

import graft.driver.DocumentsIndex
import graft.oracle.ExhaustiveScorer
import graft.tokenize.CodeTokenizer
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** Gates for the round-6 agg/suggest/collapse family (SURVEY.md §2.3 B7/B10/
  * B18/B19 extensions): each operator against a from-raw-text brute oracle
  * computed in plain Scala — independent of the engine's dictionary,
  * postings, and plans — over the driver's sf0.001 documents corpus.
  */
class SigCollapseSpec extends SparkSpec with BeforeAndAfterAll {
  private val sfDir = "/root/testdata/sf0.001"
  import spark.implicits._

  private def haveData = new java.io.File(s"$sfDir/documents.parquet").exists()

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (docId, lang, distinct terms, dl) per doc, tokenized from raw text. */
  private lazy val docTok: Seq[(Long, String, Set[String], Int)] = {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
      .map { case (id, lang, text) =>
        val toks = CodeTokenizer.tokenize(text)
        (id, lang, toks.toSet, toks.length)
      }.toSeq
  }

  test("significant_terms == brute JLH over raw tokenization") {
    assume(haveData, s"$sfDir not mounted")
    val n = docTok.size.toDouble
    for (q <- Seq("stream", "vector")) {
      val fgDocs = docTok.filter(_._3.contains(q))
      val fgN = fgDocs.size.toDouble
      assert(fgN > 0, s"fixture term '$q' absent — gate has no foreground")
      val fgCounts = fgDocs.flatMap(_._3).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val bgCounts = docTok.flatMap(_._3).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val want = fgCounts.iterator.filter(_._1 != q).map { case (t, fg) =>
        val bg = bgCounts(t)
        val fgPct = fg / fgN
        val bgPct = bg / n
        (t, fg, bg, round6((fgPct - bgPct) * (fgPct / bgPct)))
      }.toSeq.sortBy { case (t, _, _, s) => (-s, t) }.take(10)
      val got = DocumentsIndex.significantTerms(spark, sfDir, q, 10)
        .as[(String, Long, Long, Double)].collect().toSeq
      assert(got == want, s"significant_terms('$q'):\n  got  $got\n  want $want")
    }
  }

  test("rescore == brute window re-rank; outside-window phrase docs never enter") {
    assume(haveData, s"$sfDir not mounted")
    import graft.query.Bm25
    val seqs: Map[Long, Array[String]] = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> CodeTokenizer.tokenize(t) }.toMap
    val n = seqs.size.toLong
    val avgdl = seqs.valuesIterator.map(_.length.toLong).sum.toDouble / n
    def df(t: String): Long = seqs.valuesIterator.count(_.contains(t)).toLong
    def bm25(id: Long, t: String): Double = {
      val tf = seqs(id).count(_ == t).toLong
      if (tf == 0) 0.0
      else Bm25.idf(n, df(t)) * Bm25.tfNorm(tf, seqs(id).length.toLong, avgdl, Bm25.Default)
    }
    // window: protocol-ordered top-20 of the main query (rounded scores)
    val qTerms = Seq("hash", "table")
    val window = seqs.keysIterator
      .map(id => (id, round6(qTerms.distinct.sorted.foldLeft(0.0)((a, t) => a + bm25(id, t)))))
      .filter(_._2 > 0).toSeq.sortBy { case (id, s) => (-s, id) }.take(20)
    // rescore side: the b44 scored-phrase definition, 6-dp rounded
    val idfSum = Array("hash", "join").foldLeft(0.0)((a, t) => a + Bm25.idf(n, df(t)))
    def ptf(ts: Array[String]): Int =
      (0 to ts.length - 2).count(i => ts(i) == "hash" && ts(i + 1) == "join")
    def phScore(id: Long): Double = {
      val c = ptf(seqs(id))
      if (c == 0) 0.0
      else round6(idfSum * Bm25.tfNorm(c.toLong, seqs(id).length.toLong, avgdl, Bm25.Default))
    }
    val want = window.map { case (id, s) => (id, round6(1.0 * s + 2.0 * phScore(id))) }
      .sortBy { case (id, s) => (-s, id) }
    val got = DocumentsIndex.rescorePhrase(spark, sfDir, "hash table", "hash join", 20, 1.0, 2.0)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"rescore:\n  got  $got\n  want $want")
    // the gate is vacuous unless the rescore actually reordered the window
    assert(want.map(_._1) != window.map(_._1), "rescore did not reorder — fixture too weak")
    // an outside-window doc with a phrase hit must NOT enter (window_size pin)
    val outside = seqs.keysIterator
      .filter(id => ptf(seqs(id)) > 0 && !window.exists(_._1 == id)).toSeq
    assert(outside.nonEmpty, "no phrase doc outside the window — exclusion not exercised")
    assert(!got.exists(r => outside.contains(r._1)), "an outside-window doc entered the rescored page")
  }

  test("significant_terms of an absent foreground term is empty, typed") {
    assume(haveData, s"$sfDir not mounted")
    val out = DocumentsIndex.significantTerms(spark, sfDir, "qqqzzznotfound", 5)
    assert(out.columns.toSeq == Seq("term", "fg", "bg", "score"))
    assert(out.count() == 0)
  }

  /** Classic Levenshtein (no transpositions — the pinned B18 semantics). */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("phrase suggester == brute bigram-df ranking; misspelled slot corrects") {
    assume(haveData, s"$sfDir not mounted")
    val seqs: Map[Long, Array[String]] = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> CodeTokenizer.tokenize(t) }.toMap
    val vocab = seqs.valuesIterator.flatten.toSet
    def bigramDf(l: String, r: String): Long =
      seqs.valuesIterator.count(ts =>
        (0 to ts.length - 2).exists(i => ts(i) == l && ts(i + 1) == r)).toLong
    for (input <- Seq("hash joyn", "slw qery", "hash join")) {
      val Array(t0, t1) = input.split(" ")
      val c0 = vocab.filter(t => lev(t, t0) <= 1)
      val c1 = vocab.filter(t => lev(t, t1) <= 1)
      val want = (for { a <- c0; b <- c1 } yield (s"$a $b", bigramDf(a, b)))
        .filter(_._2 > 0).toSeq.sortBy { case (s, f) => (-f, s) }.take(5)
      val got = DocumentsIndex.suggestPhrase(spark, sfDir, input, 5)
        .as[(String, Long)].collect().toSeq
      assert(got == want, s"phrase suggest '$input':\n  got  $got\n  want $want")
    }
    // the correction must be real: 'joyn' is NOT vocabulary, yet the top
    // suggestion is the corrected adjacent bigram
    assert(!vocab.contains("joyn"), "fixture drift: 'joyn' entered the vocabulary")
    val top = DocumentsIndex.suggestPhrase(spark, sfDir, "hash joyn", 5)
      .as[(String, Long)].collect()
    assert(top.nonEmpty && top.head._1 == "hash join",
      s"expected 'hash join' on top, got ${top.toSeq}")
    // longer inputs are a rejected shape, not a silent truncation
    intercept[IllegalArgumentException](
      DocumentsIndex.suggestPhrase(spark, sfDir, "a b c", 5))
  }

  test("term suggester == brute vocabulary Levenshtein under (dist, df desc, term)") {
    assume(haveData, s"$sfDir not mounted")
    val vocabDf = docTok.flatMap(_._3).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    for ((input, maxEdits, size) <- Seq(("vectr", 2, 5), ("strea", 1, 5), ("vector", 2, 8))) {
      val want = vocabDf.iterator
        .map { case (t, df) => (t, lev(t, input).toLong, df) }
        .filter { case (_, dist, _) => dist >= 1 && dist <= maxEdits }
        .toSeq.sortBy { case (t, dist, df) => (dist, -df, t) }.take(size)
      val got = DocumentsIndex.suggest(spark, sfDir, input, maxEdits, size)
        .as[(String, Long, Long)].collect().toSeq
      assert(got == want, s"suggest('$input', $maxEdits):\n  got  $got\n  want $want")
      assert(!got.exists(_._1 == input), s"suggest('$input') must exclude the input term")
    }
  }

  test("field collapse == brute per-group best under (score desc, doc_id asc); no window in the plan") {
    assume(haveData, s"$sfDir not mounted")
    val query = "spark join"
    // rank-all is already oracle-gated; the collapse pick is what's under test
    val all = DocumentsIndex.bm25(spark, sfDir, query, -1).as[(Long, Double)].collect()
    val langOf = docTok.map(d => d._1 -> d._2).toMap
    val want = all.map { case (id, s) => (langOf(id), id, s) }
      .groupBy(_._1).map { case (_, xs) => xs.minBy { case (_, id, s) => (-s, id) } }
      .toSeq.sortBy { case (lang, _, s) => (-s, lang) }
    val out = DocumentsIndex.collapseByLang(spark, sfDir, query)
    val got = out.as[(String, Long, Double)].collect().toSeq
    assert(got == want, s"collapse:\n  got  $got\n  want $want")
    // scale shape: one map-side-combinable aggregate, never a per-group window
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"collapse must not serve through a window:\n$plan")
  }

  test("function_score == exhaustive-BM25 × ln(1 + dl/64) modifier, re-ranked") {
    assume(haveData, s"$sfDir not mounted")
    val query = "spark join"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("docId"), col("text").as("content"))
      .as[ExhaustiveScorer.OracleDoc]
    val prep = ExhaustiveScorer.prepare(spark, docs)
    val raw = prep.topK(query, docTok.size + 1)
    val dlOf = docTok.map(d => d._1 -> d._4).toMap
    val want = raw.map { h =>
      (h.docId, round6(h.score * math.log(1.0 + dlOf(h.docId) / 64.0)))
    }.sortBy { case (id, s) => (-s, id) }.take(20).toSeq
    val got = DocumentsIndex.functionScore(spark, sfDir, query, 20)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"function_score:\n  got  $got\n  want $want")
    // the modifier must actually re-rank (otherwise the gate proves nothing)
    val plain = DocumentsIndex.bm25(spark, sfDir, query, 20).as[(Long, Double)].collect()
    assert(got.map(_._1) != plain.map(_._1).toSeq,
      "fixture too weak: modifier did not re-order the top-20 — pick a different query")
  }

  test("gauss decay == brute exp(ln d²) modifier; offset radius preserves scores exactly") {
    assume(haveData, s"$sfDir not mounted")
    val query = "hash table"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("docId"), col("text").as("content"))
      .as[ExhaustiveScorer.OracleDoc]
    val prep = ExhaustiveScorer.prepare(spark, docs)
    val raw = prep.topK(query, docTok.size + 1)
    val dlOf = docTok.map(d => d._1 -> d._4).toMap
    def mult(dl: Long, origin: Double, scale: Double, offset: Double, decay: Double): Double = {
      val d = math.max(0.0, math.abs(dl - origin) - offset)
      math.exp(math.log(decay) * (d / scale) * (d / scale))
    }
    for ((origin, scale, offset, decay) <- Seq((60.0, 20.0, 5.0, 0.5), (40.0, 10.0, 0.0, 0.25))) {
      val want = raw.map { h =>
        (h.docId, round6(h.score * mult(dlOf(h.docId).toLong, origin, scale, offset, decay)))
      }.sortBy { case (id, s) => (-s, id) }.take(20).toSeq
      val got = DocumentsIndex.functionScoreGauss(spark, sfDir, query,
        origin, scale, offset, decay, 20).as[(Long, Double)].collect().toSeq
      assert(got == want, s"gauss($origin,$scale,$offset,$decay):\n  got  $got\n  want $want")
    }
    // a WIDE offset covers every dl -> d = 0 -> multiplier exactly 1: the
    // decayed frame must be BIT-identical to the plain protocol ranking
    val wide = DocumentsIndex.functionScoreGauss(spark, sfDir, query,
      0.0, 20.0, 1e6, 0.5, 20).as[(Long, Double)].collect().toSeq
    val plain = DocumentsIndex.bm25(spark, sfDir, query, 20).as[(Long, Double)].collect().toSeq
    assert(wide == plain, "inside-offset docs must keep their score EXACTLY")
    // and the real params must re-rank, or the gate is vacuous
    val tight = DocumentsIndex.functionScoreGauss(spark, sfDir, query,
      60.0, 20.0, 5.0, 0.5, 20).as[(Long, Double)].collect().toSeq
    assert(tight.map(_._1) != plain.map(_._1), "gauss decay did not re-order the top-20")
    intercept[IllegalArgumentException](
      DocumentsIndex.functionScoreGauss(spark, sfDir, query, 60.0, 0.0, 5.0, 0.5, 20))
    intercept[IllegalArgumentException](
      DocumentsIndex.functionScoreGauss(spark, sfDir, query, 60.0, 20.0, 5.0, 1.0, 20))
  }

  test("b33 twin preconditions: affix-safe vocabulary, analyzer-charset + space text") {
    assume(haveData, s"$sfDir not mounted")
    // The b33_highlight_multi DuckDB twin wraps matches with \b boundaries
    // over a WINDOW-CUT fragment. A corpus token containing a query term as
    // a proper affix (e.g. 'joined') could be sliced at the window edge
    // into a string where \b falsely matches — the engine's full-text
    // char-offset tokenizer (HighlightOps.fragmentMulti) never sees that
    // boundary. This gate turns the documented corpus precondition into a
    // loud failure if the fixtures ever change: rework the twin first.
    val vocab = docTok.flatMap(_._3).toSet
    for (q <- Seq("hash", "join")) {
      val bad = vocab.filter(t => t != q && t.contains(q))
      assert(bad.isEmpty,
        s"corpus token(s) $bad contain '$q' — the b33 twin's \\b wrapping can falsely match a window-cut slice")
    }
    // the padded-strpos anchor additionally assumes space-separated
    // analyzer-charset text (shared with the pinned b28 v1 twin)
    val nonSimple = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(!col("text").rlike("^[a-z0-9_ ]*$")).count()
    assert(nonSimple == 0,
      "b33/b28 twins assume space-separated lowercase analyzer-charset text; fixture changed — rework the twins")
  }

  test("extended_stats moments == two-pass exact computation at the pinned 4-dp rounding") {
    assume(haveData, s"$sfDir not mounted")
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_quantity").as[(String, Double)].collect()
    val want = rows.groupBy(_._1).map { case (flag, xs) =>
      val v = xs.map(_._2)
      val mean = v.sum / v.length
      val varp = v.map(x => (x - mean) * (x - mean)).sum / v.length
      flag -> (v.length.toLong, BigDecimal(varp).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = SparkEntry.queries("a22_extended_stats")(spark, sfDir)
      .select("l_returnflag", "cnt", "var_qty").as[(String, Long, Double)].collect()
    got.foreach { case (flag, cnt, varq) =>
      val (wc, wv) = want(flag)
      assert(cnt == wc, s"count mismatch for $flag")
      assert(math.abs(varq - wv) <= 1e-4, s"var_pop drift for $flag: $varq vs $wv")
    }
  }

  test("span_first == brute first-occurrence cut; end boundary exact; bad end rejected") {
    assume(haveData, s"$sfDir not mounted")
    val seqs: Map[Long, Array[String]] = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> CodeTokenizer.tokenize(t) }.toMap
    for ((term, end) <- Seq(("hash", 8), ("hash", 1), ("join", 3), ("hash", 100000))) {
      val want = seqs.iterator.flatMap { case (id, ts) =>
        val p = ts.indexOf(term)
        if (p >= 0 && p < end) Some((id, p.toLong)) else None
      }.toSeq.sortBy(_._1)
      val got = DocumentsIndex.spanFirstMatch(spark, sfDir, term, end)
        .as[(Long, Long)].collect().toSeq
      assert(got == want, s"span_first('$term', $end)")
    }
    // the cut must be REAL at the driver row's params: some docs contain
    // the term but first see it at position >= 8
    val containing = seqs.count(_._2.contains("hash"))
    val matched = DocumentsIndex.spanFirstMatch(spark, sfDir, "hash", 8).count()
    assert(matched > 0 && matched < containing,
      s"span_first fixture vacuous: $matched of $containing")
    intercept[IllegalArgumentException](DocumentsIndex.spanFirstMatch(spark, sfDir, "hash", 0))
  }

  test("percolate == brute stored-query conjunctions; unsatisfiable query matches nothing; bad registries rejected") {
    assume(haveData, s"$sfDir not mounted")
    val queries = Seq("hj" -> Seq("hash", "join"), "sv" -> Seq("sort", "vector"),
      "zz" -> Seq("hash", "qqqzzznotfound"))
    val want = (for {
      (id, _, terms, _) <- docTok
      (name, qts) <- queries
      if qts.forall(terms.contains)
    } yield (id, name)).sortBy { case (id, n) => (id, n) }
    val got = DocumentsIndex.percolate(spark, sfDir, queries)
      .as[(Long, String)].collect().toSeq
    assert(got == want, s"percolate: got ${got.size} want ${want.size}")
    assert(!got.exists(_._2 == "zz"), "unsatisfiable stored query leaked a match")
    assert(got.exists(_._2 == "hj") && got.exists(_._2 == "sv"),
      "percolate fixture vacuous — no query matched")
    intercept[IllegalArgumentException](DocumentsIndex.percolate(spark, sfDir, Nil))
    intercept[IllegalArgumentException](
      DocumentsIndex.percolate(spark, sfDir, Seq("a" -> Seq("hash"), "a" -> Seq("join"))))
    intercept[IllegalArgumentException](
      DocumentsIndex.percolate(spark, sfDir, Seq("a" -> Nil)))
  }

  test("sampler significant_terms == brute JLH over the protocol top-k sample") {
    assume(haveData, s"$sfDir not mounted")
    val query = "hash join"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("docId"), col("text").as("content"))
      .as[ExhaustiveScorer.OracleDoc]
    val prep = ExhaustiveScorer.prepare(spark, docs)
    val sampleSize = 50
    val sample = prep.topK(query, docTok.size + 1)
      .map(h => (h.docId, round6(h.score)))
      .sortBy { case (id, s) => (-s, id) }.take(sampleSize).map(_._1).toSet
    assert(sample.size == sampleSize, "sample smaller than shard_size — fixture too weak")
    val byId = docTok.map(d => d._1 -> d._3).toMap
    val fgN = sample.size.toDouble
    val n = docTok.size.toDouble
    val qTerms = Set("hash", "join")
    val fgCounts = sample.toSeq.flatMap(byId(_)).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val bgCounts = docTok.flatMap(_._3).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val want = fgCounts.iterator.filter(t => !qTerms.contains(t._1)).map { case (t, fg) =>
      val bg = bgCounts(t)
      val fgPct = fg / fgN
      val bgPct = bg / n
      (t, fg, bg, round6((fgPct - bgPct) * (fgPct / bgPct)))
    }.toSeq.sortBy { case (t, _, _, s) => (-s, t) }.take(10)
    val got = DocumentsIndex.samplerSigTerms(spark, sfDir, query, sampleSize, 10)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == want, s"sampler sig_terms:\n  got  $got\n  want $want")
    // sampling must be REAL: the query matches more docs than the sample
    val matches = docTok.count(d => d._3.contains("hash") || d._3.contains("join"))
    assert(matches > sampleSize, s"fixture: only $matches matches for a $sampleSize sample")
    intercept[IllegalArgumentException](
      DocumentsIndex.samplerSigTerms(spark, sfDir, query, 0, 10))
  }

  test("explain == brute per-(doc, term) BM25 leaves over the protocol top-k; leaves sum to the hit score") {
    assume(haveData, s"$sfDir not mounted")
    import graft.query.Bm25
    val query = "hash join"
    val seqs: Map[Long, Array[String]] = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> CodeTokenizer.tokenize(t) }.toMap
    val n = seqs.size.toLong
    val avgdl = seqs.valuesIterator.map(_.length.toLong).sum.toDouble / n
    def dfOf(t: String): Long = seqs.valuesIterator.count(_.contains(t)).toLong
    val qTerms = Seq("hash", "join")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("docId"), col("text").as("content"))
      .as[ExhaustiveScorer.OracleDoc]
    val prep = ExhaustiveScorer.prepare(spark, docs)
    val top = prep.topK(query, seqs.size + 1)
      .map(h => (h.docId, round6(h.score)))
      .sortBy { case (id, s) => (-s, id) }.take(10)
    val want = (for {
      (id, _) <- top
      t <- qTerms
      ts = seqs(id)
      tf = ts.count(_ == t).toLong
      if tf > 0
    } yield {
      val dl = ts.length.toLong
      (id, t, tf, dl,
        round6(Bm25.idf(n, dfOf(t)) * Bm25.tfNorm(tf, dl, avgdl, Bm25.Default)))
    }).toSeq.sortBy { case (id, t, _, _, _) => (id, t) }
    val got = DocumentsIndex.explain(spark, sfDir, query, 10)
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(got == want, s"explain:\n  got  $got\n  want $want")
    // the leaves must SUM (unrounded, term order) to each hit's score
    val scoreOf = top.toMap
    got.groupBy(_._1).foreach { case (id, rows) =>
      val s = rows.sortBy(_._2).map { case (_, t, tf, dl, _) =>
        Bm25.idf(n, dfOf(t)) * Bm25.tfNorm(tf, dl, avgdl, Bm25.Default) }.sum
      assert(math.abs(round6(s) - scoreOf(id)) <= 1e-6,
        s"leaves of doc $id sum to $s, hit score ${scoreOf(id)}")
    }
    intercept[IllegalArgumentException](DocumentsIndex.explain(spark, sfDir, query, 0))
  }

  test("terms lookup == brute shared-tag membership; random_score == pinned MINSTD hash order") {
    assume(haveData, s"$sfDir not mounted")
    val meta = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "source").as[(Long, String, String)].collect()
    val (_, l42, s42) = meta.find(_._1 == 42L).get
    val lkTerms = Set(l42, s42)
    val wantLk = meta.flatMap { case (id, l, s) =>
      val m = Seq(l, s).distinct.count(lkTerms.contains)
      if (m > 0) Some((id, m.toLong)) else None
    }.sortBy(_._1).toSeq
    val gotLk = DocumentsIndex.termsLookup(spark, sfDir, 42L)
      .as[(Long, Long)].collect().toSeq
    assert(gotLk == wantLk, "terms lookup")
    assert(wantLk.exists(_._2 == 2L) && wantLk.exists(_._2 == 1L),
      "lookup fixture vacuous — need both 1- and 2-tag matches")
    intercept[IllegalArgumentException](DocumentsIndex.termsLookup(spark, sfDir, -1L))
    // random_score: seeded MINSTD over the 'vector' membership set
    val members = docTok.filter(_._3.contains("vector")).map(_._1)
    def minstd2(id: Long, seed: Long): Double =
      (((((id + seed) % 2147483647L) * 48271L) % 2147483647L) * 48271L % 2147483647L)
        .toDouble / 2147483647.0
    val wantR = members.map(id => (id, round6(minstd2(id, 7L))))
      .sortBy { case (id, r) => (-r, id) }.take(20)
    // the pre-multiply reduction keeps a huge seed inside Long: still in
    // [0,1) where the unreduced form would wrap negative
    val huge = DocumentsIndex.randomScore(spark, sfDir, Seq("vector"), 3e14.toLong, 20)
      .as[(Long, Double)].collect()
    assert(huge.forall(r => r._2 >= 0.0 && r._2 < 1.0), "huge seed must stay in [0,1)")
    val gotR = DocumentsIndex.randomScore(spark, sfDir, Seq("vector"), 7L, 20)
      .as[(Long, Double)].collect().toSeq
    assert(gotR == wantR, s"random_score:\n  got  $gotR\n  want $wantR")
    // determinism: same seed twice is identical; a different seed re-orders
    val again = DocumentsIndex.randomScore(spark, sfDir, Seq("vector"), 7L, 20)
      .as[(Long, Double)].collect().toSeq
    assert(again == gotR, "random_score must be seed-deterministic")
    val other = DocumentsIndex.randomScore(spark, sfDir, Seq("vector"), 8L, 20)
      .as[(Long, Double)].collect().toSeq
    assert(other.map(_._1) != gotR.map(_._1), "different seed must re-order")
    intercept[IllegalArgumentException](
      DocumentsIndex.randomScore(spark, sfDir, Seq("vector"), -1L, 20))
  }

  test("span_not == brute windowed exclusion; absent exclude degrades to the plain term count") {
    assume(haveData, s"$sfDir not mounted")
    val seqs: Map[Long, Array[String]] = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> CodeTokenizer.tokenize(t) }.toMap
    def brute(inc: String, exc: String, pre: Int, post: Int): Seq[(Long, Long)] =
      seqs.iterator.flatMap { case (id, ts) =>
        val ips = ts.indices.filter(i => ts(i) == inc)
        val eps = ts.indices.filter(i => ts(i) == exc)
        val cnt = ips.count(p => !eps.exists(q => q >= p - pre && q <= p + post))
        if (cnt > 0) Some((id, cnt.toLong)) else None
      }.toSeq.sortBy(_._1)
    for ((pre, post) <- Seq((0, 0), (1, 1), (2, 0), (0, 3))) {
      val want = brute("hash", "join", pre, post)
      val got = DocumentsIndex.spanNotMatch(spark, sfDir, "hash", "join", pre, post)
        .as[(Long, Long)].collect().toSeq
      assert(got == want, s"span_not(pre=$pre, post=$post)")
      assert(want.nonEmpty, s"span_not fixture vacuous at ($pre, $post)")
    }
    // the exclusion must be REAL at the driver params: fewer surviving
    // spans than raw occurrences for at least one doc
    val raw = seqs.map { case (id, ts) => id -> ts.count(_ == "hash").toLong }
    val got11 = DocumentsIndex.spanNotMatch(spark, sfDir, "hash", "join", 1, 1)
      .as[(Long, Long)].collect().toMap
    assert(seqs.keys.exists(id => raw(id) > 0 && got11.getOrElse(id, 0L) < raw(id)),
      "no occurrence was ever excluded — fixture vacuous")
    // absent exclude term: every include occurrence survives
    val plain = raw.filter(_._2 > 0).toSeq.sortBy(_._1)
    val gotAbs = DocumentsIndex.spanNotMatch(spark, sfDir, "hash", "qqqzzznotfound", 1, 1)
      .as[(Long, Long)].collect().toSeq
    assert(gotAbs == plain, "absent exclude must degrade to the plain term count")
    intercept[IllegalArgumentException](
      DocumentsIndex.spanNotMatch(spark, sfDir, "hash", "hash", 1, 1))
    intercept[IllegalArgumentException](
      DocumentsIndex.spanNotMatch(spark, sfDir, "hash", "join", -1, 0))
  }

  test("msearch pages == the per-query bm25 pages; top_metrics == latest-ts metric per bucket") {
    assume(haveData, s"$sfDir not mounted")
    val queries = Seq("spark join", "window merge batch vector", "hash table")
    val got = DocumentsIndex.msearch(spark, sfDir, queries, 10)
      .as[(Int, Long, Double)].collect().toSeq
    val want = queries.zipWithIndex.flatMap { case (q, qi) =>
      DocumentsIndex.bm25(spark, sfDir, q, 10)
        .as[(Long, Double)].collect().map(h => (qi, h._1, h._2))
    }
    assert(got == want, s"msearch:\n  got  $got\n  want $want")
    assert(got.map(_._1).distinct == Seq(0, 1, 2), "a query's page went missing")
    intercept[IllegalArgumentException](DocumentsIndex.msearch(spark, sfDir, Nil, 10))
    intercept[IllegalArgumentException](DocumentsIndex.msearch(spark, sfDir, queries, 0))
    // top_metrics: the metric at the latest timestamp, per bucket
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_type", "ts", "value")
      .as[(String, java.sql.Timestamp, Double)].collect()
    val wantTm = ev.groupBy(_._1).map { case (t, xs) =>
      val m = xs.maxBy(_._2.getTime); (t, m._2, m._3) }.toSeq.sortBy(_._1)
    val gotTm = SparkEntry.queries("a36_top_metrics")(spark, sfDir)
      .as[(String, java.sql.Timestamp, Double)].collect().toSeq
    assert(gotTm == wantTm, s"top_metrics:\n  got  $gotTm\n  want $wantTm")
  }

  test("rank_feature/distance_feature == brute saturation; pinned == curated-then-organic with unknown ids dropped") {
    assume(haveData, s"$sfDir not mounted")
    // rank_feature: dl/(dl + pivot) off the doc value
    val wantRf = docTok.map { case (id, _, _, dl) =>
      (id, round6(dl / (dl + 64.0))) }
      .sortBy { case (id, s) => (-s, id) }.take(20)
    val gotRf = DocumentsIndex.rankFeature(spark, sfDir, 64.0, 20)
      .as[(Long, Double)].collect().toSeq
    assert(gotRf == wantRf, s"rank_feature:\n  got  $gotRf\n  want $wantRf")
    intercept[IllegalArgumentException](DocumentsIndex.rankFeature(spark, sfDir, 0.0, 20))
    // distance_feature: pivot/(pivot + protocol km) from (10, 20)
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def km(id: Long): Double = {
      val la = (id * 37 % 18000) / 100.0 - 90.0
      val lo = (id * 73 % 36000) / 100.0 - 180.0
      round4(2 * 6371.0 * math.asin(math.sqrt(
        math.pow(math.sin(math.toRadians(la - 10.0) / 2), 2) +
          math.cos(math.toRadians(10.0)) * math.cos(math.toRadians(la)) *
            math.pow(math.sin(math.toRadians(lo - 20.0) / 2), 2))))
    }
    val wantDf = docTok.map { case (id, _, _, _) =>
      (id, round6(500.0 / (500.0 + km(id)))) }
      .sortBy { case (id, s) => (-s, id) }.take(20)
    val gotDf = DocumentsIndex.distanceFeature(spark, sfDir, 10.0, 20.0, 500.0, 20)
      .as[(Long, Double)].collect().toSeq
    assert(gotDf == wantDf, s"distance_feature:\n  got  $gotDf\n  want $wantDf")
    intercept[IllegalArgumentException](
      DocumentsIndex.distanceFeature(spark, sfDir, 10.0, 20.0, 0.0, 20))
    // pinned: curated order above organic, unknown id silently dropped,
    // pinned docs excluded from the organic tail
    val query = "hash join"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("docId"), col("text").as("content"))
      .as[ExhaustiveScorer.OracleDoc]
    val prep = ExhaustiveScorer.prepare(spark, docs)
    val pins = Seq(42L, 7L, 99999L)
    val organic = prep.topK(query, docTok.size + 1)
      .map(h => (h.docId, round6(h.score)))
      .filter(h => !pins.contains(h._1))
      .sortBy { case (id, s) => (-s, id) }
    val existing = docTok.map(_._1).toSet
    val wantPin = pins.zipWithIndex.collect {
      case (id, i) if existing(id) => (id, 1e9 - i) } ++ organic
    val gotPin = DocumentsIndex.pinnedQuery(spark, sfDir, query, pins, 20)
      .as[(Long, Double)].collect().toSeq
    assert(gotPin == wantPin.take(20), s"pinned:\n  got  $gotPin\n  want ${wantPin.take(20)}")
    assert(gotPin.take(2).map(_._1) == Seq(42L, 7L), "pinned ids must lead in order")
    assert(!gotPin.drop(2).exists(p => pins.contains(p._1)),
      "pinned docs leaked into the organic tail")
    // a pinned doc that does NOT match the organic query still surfaces
    val noMatchPin = docTok.find(d => !d._3.contains("hash") && !d._3.contains("join")).map(_._1)
    assume(noMatchPin.nonEmpty, "corpus saturated — no non-matching doc")
    val lead = DocumentsIndex.pinnedQuery(spark, sfDir, query, Seq(noMatchPin.get), 5)
      .as[(Long, Double)].collect().head
    assert(lead._1 == noMatchPin.get && lead._2 == 1e9,
      "non-matching pinned doc must still surface first")
    intercept[IllegalArgumentException](
      DocumentsIndex.pinnedQuery(spark, sfDir, query, Seq(1L, 1L), 5))
    intercept[IllegalArgumentException](
      DocumentsIndex.pinnedQuery(spark, sfDir, query, Nil, 5))
  }
}
