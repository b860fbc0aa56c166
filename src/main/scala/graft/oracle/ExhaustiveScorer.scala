package graft.oracle

import graft.query.{Bm25, Bm25Params}
import graft.tokenize.CodeTokenizer
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Brute-force exact-BM25 scorer (SURVEY.md §5.2 gate 1).
  *
  * The executable embodiment of the reference engine's documented scoring
  * semantics: no index, no compression, no skipping — every document's raw
  * (term, tf, dl) rows are produced by tokenizing content directly, with
  * df/N/avgdl recomputed exhaustively and independently of the engine's
  * dictionary. The engine's top-k (naive DAAT and Block-Max WAND) must be
  * rank-identical to this.
  *
  * [[prepare]] tokenizes the corpus ONCE into a raw row table; each query
  * then filters + folds those rows (in pinned ascending-term order). Callers
  * issuing many queries should persist `Prepared.rows` — the round-1 oracle
  * re-tokenized the corpus twice per query, which dominated `sbt test` wall
  * time.
  */
object ExhaustiveScorer {
  /** (docId, content) input — the oracle needs nothing else. */
  final case class OracleDoc(docId: Long, content: String)

  final case class Scored(docId: Long, score: Double)

  final class Prepared(spark: SparkSession, val rows: Dataset[(Long, String, Int, Int)],
      val n: Long, val avgDl: Double, p: Bm25Params) extends Serializable {
    import spark.implicits._

    /** Bool-query reference: must = conjunction, should contributes when
      * present, mustNot excludes; score = Σ over (must ∪ should) terms
      * present, ascending term order — all recomputed from raw rows.
      * A should clause duplicating a must clause is stripped from scoring
      * (never double-counted) but ALWAYS satisfies itself in any doc the
      * conjunction admits, so it credits `minimum_should_match` (ES
      * semantics — mirrors IndexReader.boolClauses' shouldCredit).
      */
    def topKBool(must: Seq[String], should: Seq[String], mustNot: Seq[String],
        k: Int, minShould: Int = 0): Array[Scored] = {
      val mustT = must.flatMap(CodeTokenizer.tokenize(_)).distinct.sorted
      val notT = mustNot.flatMap(CodeTokenizer.tokenize(_)).distinct.sorted
      val shouldAll = should.flatMap(CodeTokenizer.tokenize(_)).distinct.sorted
      val shouldT = shouldAll.filterNot(t => mustT.contains(t) || notT.contains(t))
      val effMinShould = math.max(0, minShould - shouldAll.count(mustT.contains))
      if (mustT.exists(notT.contains)) return Array.empty
      val scoring = (mustT ++ shouldT).distinct.sorted
      if (scoring.isEmpty || n == 0) return Array.empty
      val all = (scoring ++ notT).distinct
      val hit = rows.filter(r => all.contains(r._2)).collect()
      val byDoc = hit.groupBy(_._1)
      val dfMap = hit.filter(r => scoring.contains(r._2)).groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
      if (mustT.exists(t => !dfMap.contains(t))) return Array.empty
      val idf = dfMap.map { case (t, df) => t -> Bm25.idf(n, df) }
      byDoc.iterator.flatMap { case (d, rs) =>
        val terms = rs.map(_._2).toSet
        if (mustT.forall(terms.contains) && !notT.exists(terms.contains) &&
            scoring.exists(terms.contains) &&
            shouldT.count(terms.contains) >= effMinShould) {
          var s = 0.0
          rs.sortBy(_._2).foreach { case (_, t, tf, dl) =>
            if (scoring.contains(t)) s += idf(t) * Bm25.tfNorm(tf.toLong, dl.toLong, avgDl, p)
          }
          Some(Scored(d, s))
        } else None
      }.toArray.sortBy(h => (-h.score, h.docId)).take(k)
    }

    def topK(query: String, k: Int): Array[Scored] = {
      val qterms = CodeTokenizer.tokenize(query).distinct.sorted
      if (qterms.isEmpty || n == 0) return Array.empty
      val hit = rows.filter(r => qterms.contains(r._2))
      // exact df per query term, recomputed from the raw rows
      val dfMap = hit.groupByKey(_._2).count().collect().toMap
      val idfB = spark.sparkContext.broadcast(
        qterms.flatMap(t => dfMap.get(t).map(df => t -> Bm25.idf(n, df))).toMap)
      val avg = avgDl
      val pp = p
      hit.groupByKey(_._1).mapGroups { (d, it) =>
        // ascending term order — the pinned summation order (SURVEY.md §7.4)
        val arr = it.toArray.sortBy(_._2)
        var s = 0.0
        arr.foreach { case (_, t, tf, dl) =>
          idfB.value.get(t).foreach(idf => s += idf * Bm25.tfNorm(tf.toLong, dl.toLong, avg, pp))
        }
        Scored(d, s)
      }.orderBy(desc("score"), asc("docId")).limit(k).as[Scored].collect()
    }
  }

  /** Tokenize the corpus once into raw (docId, term, tf, dl) rows + exact
    * global stats (all recomputed from content, independent of the engine's
    * docs/stats tables).
    */
  def prepare(spark: SparkSession, docs: Dataset[OracleDoc],
      p: Bm25Params = Bm25.Default): Prepared = {
    import spark.implicits._
    val rows = docs.flatMap { d =>
      val (m, dl) = CodeTokenizer.tfMap(d.content)
      m.iterator.map { case (t, tf) => (d.docId, t, tf, dl) }
    }
    val agg = docs.map(d => CodeTokenizer.tokenize(d.content).length.toLong)
      .agg(count(lit(1)), sum("value")).collect()(0)
    val n = agg.getLong(0)
    val avgDl = if (n == 0) 0.0 else agg.getLong(1).toDouble / n
    new Prepared(spark, rows, n, avgDl, p)
  }

  /** One-shot convenience: prepare + single query. */
  def topK(spark: SparkSession, docs: Dataset[OracleDoc], query: String, k: Int,
      p: Bm25Params = Bm25.Default): Array[Scored] =
    prepare(spark, docs, p).topK(query, k)
}
