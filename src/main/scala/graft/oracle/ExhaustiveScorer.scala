package graft.oracle

import graft.index.DocRow
import graft.query.{Bm25, Bm25Params}
import graft.tokenize.CodeTokenizer
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Brute-force exact-BM25 scorer (SURVEY.md §5.2 gate 1).
  *
  * The executable embodiment of the reference engine's documented scoring
  * semantics: no index, no compression, no skipping — every document is
  * tokenized and scored from raw content, with df/N/avgdl recomputed
  * exhaustively and independently of the engine's dictionary. The engine's
  * top-k (naive DAAT and Block-Max WAND) must be rank-identical to this.
  */
object ExhaustiveScorer {
  final case class Scored(docId: Long, score: Double)

  def topK(spark: SparkSession, docs: Dataset[DocRow], query: String, k: Int,
      p: Bm25Params = Bm25.Default): Array[Scored] = {
    import spark.implicits._
    val qterms = CodeTokenizer.tokenize(query).distinct.sorted
    if (qterms.isEmpty) return Array.empty
    val qB = spark.sparkContext.broadcast(qterms)

    val n = docs.agg(count(lit(1))).collect()(0).getLong(0)
    if (n == 0) return Array.empty
    // avgdl recomputed from content (independent of the docs.dl column)
    val sumDl = docs.map(d => CodeTokenizer.tokenize(d.content).length.toLong)
      .agg(sum("value")).collect()(0).getLong(0)
    val avgDl = sumDl.toDouble / n

    val dfMap: Map[String, Long] = docs.flatMap { d =>
      val (m, _) = CodeTokenizer.tfMap(d.content)
      qB.value.iterator.filter(m.contains)
    }.groupBy("value").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val idfB = spark.sparkContext.broadcast(
      qterms.flatMap(t => dfMap.get(t).map(df => t -> Bm25.idf(n, df))).toMap)

    docs.flatMap { d =>
      val (m, dl) = CodeTokenizer.tfMap(d.content)
      var s = 0.0
      var any = false
      // ascending term order — the pinned summation order (SURVEY.md §7.4)
      qB.value.foreach { t =>
        if (m.contains(t) && idfB.value.contains(t)) {
          s += idfB.value(t) * Bm25.tfNorm(m(t).toLong, dl.toLong, avgDl, p)
          any = true
        }
      }
      if (any) Some(Scored(d.docId, s)) else None
    }.orderBy(desc("score"), asc("docId")).limit(k).as[Scored].collect()
  }
}
