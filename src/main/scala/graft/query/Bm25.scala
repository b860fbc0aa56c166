package graft.query

/** Okapi BM25 scoring math (SURVEY.md §2.3 B7; parameters pinned by
  * BASELINE.json:6: k1=1.2, b=0.75).
  *
  * Reference analog: Lucene `BM25Similarity` as used by the Elasticsearch
  * cluster behind `slub/efre-lod-elasticsearch-tools`. Modern-Lucene form:
  * the `(k1+1)` numerator factor is omitted (rank-preserving), and
  * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`.
  *
  * Determinism contract (SURVEY.md §7.4):
  *  - dl is the EXACT token count (no Lucene 1-byte norm quantization);
  *  - a document's score is the sum of per-term contributions in ASCENDING
  *    term order over the DISTINCT query terms;
  *  - tie-break everywhere is (score desc, docId asc).
  * Shared verbatim by the engine (TopK/BlockMaxWand) and the exhaustive
  * oracle so rank-identity is provable.
  */
final case class Bm25Params(k1: Double = 1.2, b: Double = 0.75) extends Serializable

object Bm25 {
  val Default: Bm25Params = Bm25Params()

  def idf(numDocs: Long, df: Long): Double =
    math.log(1.0 + (numDocs - df + 0.5) / (df + 0.5))

  /** The document-dependent factor: tf / (tf + k1*(1 - b + b*dl/avgdl)).
    * Monotone increasing in tf with supremum 1.0, so
    * `idf * tfNorm <= idf` always — the trivial WAND upper bound; the real
    * per-block bound is max(tfNorm) within the block (SURVEY.md §2.3 B6).
    */
  def tfNorm(tf: Long, dl: Long, avgDl: Double, p: Bm25Params): Double =
    tf / (tf + p.k1 * (1.0 - p.b + p.b * dl / avgDl))

  def score(tf: Long, dl: Long, avgDl: Double, numDocs: Long, df: Long, p: Bm25Params): Double =
    idf(numDocs, df) * tfNorm(tf, dl, avgDl, p)
}
