package graft

import graft.driver.DocumentsIndex
import graft.fixtures.CorpusGen
import graft.functions.DamerauLevenshtein
import graft.index.{IndexConfig, InvertedIndex, MultiFieldIndex}
import graft.io.Tables
import graft.query.Bm25
import graft.tokenize.CodeTokenizer
import org.apache.spark.sql.functions._

/** Gates for the ring-12 additions: the native Damerau–Levenshtein
  * expression (pinned unrestricted semantics, codegen ≡ interpreted,
  * properties vs classic Levenshtein), fuzzy `transpositions: true`
  * (the swap-reaching expansion classic edit distance cannot make),
  * combined_fields BM25F (single-field degeneracy to plain BM25 + brute
  * recount on an overlapping-vocabulary two-field corpus), and the
  * unigram-LM quality signal (brute mean log-prob recount).
  */
class Ring12Spec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/documents.parquet").exists()

  private def classicLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("damerau_levenshtein: pinned cases, properties, codegen == interpreted") {
    val f = DamerauLevenshtein.distance _
    // the UNRESTRICTED pin: a transposed pair may be edited again (OSA says 3)
    assert(f("ca", "abc") == 2)
    assert(f("ab", "ba") == 1 && f("abcd", "acbd") == 1) // adjacent swaps = 1 edit
    assert(f("ordre", "order") == 1 && classicLev("ordre", "order") == 2)
    assert(f("", "abc") == 3 && f("abc", "") == 3 && f("same", "same") == 0)
    // properties over the full {a,b,c}^<=4 cross product
    val words = (0 to 4).flatMap(n =>
      Seq.fill(n)("abc").foldLeft(Seq(""))((acc, cs) => acc.flatMap(w => cs.map(w + _))))
    for (x <- words; y <- words) {
      val d = f(x, y)
      assert(d == f(y, x), s"symmetry $x/$y")
      assert(d <= classicLev(x, y), s"DL <= classic Lev for $x/$y")
      assert(d >= math.abs(x.length - y.length) && d <= math.max(x.length, y.length))
      assert((d == 0) == (x == y))
    }
    // the Column form evaluates through doGenCode — same numbers
    val pairs = (for (x <- words; y <- words) yield (x, y)).toDF("a", "b")
    val viaExpr = pairs.select(col("a"), col("b"),
      DamerauLevenshtein(col("a"), col("b")).as("d")).collect()
    viaExpr.foreach(r => assert(r.getInt(2) == f(r.getString(0), r.getString(1))))
  }

  test("fuzzy transpositions: ordre@1 reaches 'order' only under DL") {
    assume(haveData, s"$sfDir not mounted")
    val r = DocumentsIndex.reader(spark, sfDir)
    assert(r.expandFuzzy("ordre", 1).isEmpty, "classic Lev@1 must find nothing")
    assert(r.expandFuzzy("ordre", 1, transpositions = true).toSeq == Seq("order"))
    // at maxEdits 2 classic reaches 'order' too — DL is a superset never a rewrite
    val cl2 = r.expandFuzzy("ordre", 2).toSet
    val dl2 = r.expandFuzzy("ordre", 2, transpositions = true).toSet
    assert(cl2.subsetOf(dl2) && cl2.contains("order"))
  }

  test("combined_fields: one field at weight 1 degenerates to plain BM25") {
    assume(haveData, s"$sfDir not mounted")
    val r = DocumentsIndex.reader(spark, sfDir)
    for (q <- Seq("hash join", "the", "scan vector table")) {
      val got = MultiFieldIndex.combinedFieldsScoreAll(spark, Seq(r), Seq(1.0), q)
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      val want = r.scoreAllDf(q).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      assert(got.keySet == want.keySet, s"doc set for '$q'")
      got.foreach { case (d, s) =>
        assert(math.abs(s - want(d)) <= 1e-9 * math.max(1.0, math.abs(want(d))), s"doc $d '$q'") }
    }
    intercept[IllegalArgumentException] { // ES rejects weights < 1
      MultiFieldIndex.combinedFieldsScoreAll(spark, Seq(r), Seq(0.5), "hash") }
  }

  test("combined_fields: brute BM25F on an overlapping-vocabulary corpus") {
    val dir = "/tmp/graft_r12_cf"
    Tables.delete(spark, "/tmp", "graft_r12_cf")
    // meta = lang + a short prefix of the content: the two fields SHARE
    // vocabulary by construction, so tf_c genuinely sums across fields
    val src = CorpusGen.dataset(spark, 400L, 4).toDF()
      .withColumn("meta", concat_ws(" ", col("lang"), substring(col("content"), 1, 120)))
      .select("repo", "path", "commit", "lang", "content", "meta")
    MultiFieldIndex.build(spark, src, Seq("content", "meta"), dir,
      IndexConfig(partitions = 8, heavyDfThreshold = 200L, saltRunDocs = 200L), "r12cf")
    val readers = Seq(MultiFieldIndex.reader(spark, dir, "content"),
      MultiFieldIndex.reader(spark, dir, "meta"))
    val ws = Seq(2.0, 1.0)
    val reg = Tables.read(spark, MultiFieldIndex.fieldDir(dir, "content"), InvertedIndex.DocsTable)
      .select("docId", "repo", "path", "commit")
    val docs = src.join(reg, Seq("repo", "path", "commit"))
      .select(col("docId"), col("content"), col("meta"))
      .as[(Long, String, String)].collect()
      .map { case (id, c, m) => id -> Seq(CodeTokenizer.tokenize(c), CodeTokenizer.tokenize(m)) }
    val n = docs.length.toLong
    // per-field avgdl exactly as CorpusStats: sumDl / N over the full doc set
    val cavg = ws.zipWithIndex.map { case (w, fi) =>
      w * (docs.map(_._2(fi).length.toLong).sum.toDouble / n) }.sum
    val pp = Bm25.Default
    // 'def' lives in BOTH fields of most docs -> tf_c really merges
    for (q <- Seq("def", "val class", "def scala")) {
      val qts = readers.head.analyze(q).distinct
      assert(q != "def" || docs.exists { case (_, fs) =>
        fs(0).contains("def") && fs(1).contains("def") }, "fixture lost the overlap")
      val dfu = qts.map(t => t -> docs.count(_._2.exists(_.contains(t))).toLong).toMap
      val want = docs.flatMap { case (id, fs) =>
        val cdl = ws.zip(fs).map { case (w, ts) => w * ts.length }.sum
        val score = qts.map { t =>
          val ctf = ws.zip(fs).map { case (w, ts) => w * ts.count(_ == t) }.sum
          if (ctf == 0.0 || dfu(t) == 0L) 0.0
          else math.log(1.0 + (n.toDouble - dfu(t) + 0.5) / (dfu(t) + 0.5)) *
            (ctf / (ctf + pp.k1 * (1.0 - pp.b + pp.b * cdl / cavg)))
        }.sum
        if (score > 0.0) Some(id -> score) else None
      }.toMap
      val got = MultiFieldIndex.combinedFieldsScoreAll(spark, readers, ws, q)
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      assert(got.keySet == want.keySet, s"doc set for '$q'")
      got.foreach { case (d, s) =>
        assert(math.abs(s - want(d)) <= 1e-9 * math.max(1.0, math.abs(want(d))), s"doc $d '$q'") }
    }
  }

  test("unigram LM: brute mean log-prob recount; common-vocab docs score higher") {
    assume(haveData, s"$sfDir not mounted")
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) => id -> CodeTokenizer.tokenize(t) }
    val cf = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c = cf.values.sum.toDouble
    val brute = toks.map { case (id, ts) =>
      id -> ts.map(t => math.log(cf(t) / c)).sum / ts.length }.toMap
    val got = DocumentsIndex.unigramLogProb(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == brute.keySet)
    got.foreach { case (d, s) => assert(math.abs(s - brute(d)) <= 1e-6, s"doc $d") }
    // the rare-token doc family ('dup' cf=29 vs ~900+ for everything else)
    // must sit below the corpus median — the signal actually separates
    val med = got.values.toSeq.sorted.apply(got.size / 2)
    val rareDocs = toks.filter(_._2.contains("dup")).map(_._1)
    assume(rareDocs.nonEmpty)
    assert(rareDocs.forall(d => got(d) < med),
      "docs carrying the rare token should score below the median")
  }
}
