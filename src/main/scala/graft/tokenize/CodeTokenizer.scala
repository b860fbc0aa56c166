package graft.tokenize

import scala.collection.mutable

/** Code-payload analyzer (SURVEY.md §2.3 B1, semantics pinned in §7.4).
  *
  * Reference analog: the Elasticsearch standard analyzer that
  * `slub/efre-lod-elasticsearch-tools` delegates to (no stemming, no
  * stopwords). Re-pinned for a code corpus and for cross-engine (Spark vs
  * DuckDB oracle) determinism: lowercase first, then split on any run of
  * characters outside `[a-z0-9_]`, drop empties, truncate terms at
  * [[CodeTokenizer.MaxTermLen]] chars (guards pathological minified lines).
  *
  * The exact DuckDB twin of this function is:
  * {{{
  * unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) , then
  * substr(term, 1, 64) ... WHERE term <> ''
  * }}}
  *
  * MUST stay deterministic and version-frozen: BM25 rank-identity between the
  * engine, the exhaustive oracle and the DuckDB twin all assume this exact
  * token stream.
  */
object CodeTokenizer extends Serializable {
  val MaxTermLen = 64

  private val Sep = "[^a-z0-9_]+"

  /** Tokenize content into the term stream (duplicates preserved; dl = length
    * of the returned sequence).
    */
  def tokenize(content: String): Array[String] = {
    if (content == null || content.isEmpty) return Array.empty
    val parts = content.toLowerCase(java.util.Locale.ROOT).split(Sep)
    val out = mutable.ArrayBuilder.make[String]
    out.sizeHint(parts.length)
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      if (t.nonEmpty) out += (if (t.length > MaxTermLen) t.substring(0, MaxTermLen) else t)
      i += 1
    }
    out.result()
  }

  /** One-pass (term -> tf) map plus document length (total token count).
    * This IS the SPIMI in-memory invert step at per-document granularity:
    * a document is wholly contained in one row, so tf needs no shuffle
    * (SURVEY.md §2.3 B3).
    */
  def tfMap(content: String): (mutable.HashMap[String, Int], Int) = {
    val m = new mutable.HashMap[String, Int]()
    var dl = 0
    val toks = tokenize(content)
    var i = 0
    while (i < toks.length) {
      m.update(toks(i), m.getOrElse(toks(i), 0) + 1)
      dl += 1
      i += 1
    }
    (m, dl)
  }
}
