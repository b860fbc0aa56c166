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

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'

  /** Tokenize content into the term stream (duplicates preserved; dl = length
    * of the returned sequence).
    *
    * Implementation is a char scan over the lowercased string, not a regex
    * split — provably identical output (the kept charset is ASCII, so runs of
    * word chars in the same lowercased string are exactly the regex split's
    * non-empty fields; surrogate halves are never word chars), ~4x faster on
    * the build hot path. A differential property test pins equivalence to the
    * regex reference.
    */
  def tokenize(content: String): Array[String] = {
    if (content == null || content.isEmpty) return Array.empty
    val s = content.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    val out = mutable.ArrayBuilder.make[String]
    out.sizeHint(8 + n / 6)
    var i = 0
    while (i < n) {
      while (i < n && !isWordChar(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && isWordChar(s.charAt(i))) i += 1
        val len = math.min(i - start, MaxTermLen)
        out += s.substring(start, start + len)
      }
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
    if (content == null || content.isEmpty) return (m, 0)
    val s = content.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    var dl = 0
    var i = 0
    while (i < n) {
      while (i < n && !isWordChar(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && isWordChar(s.charAt(i))) i += 1
        val len = math.min(i - start, MaxTermLen)
        val t = s.substring(start, start + len)
        val cur = m.getOrElse(t, 0)
        m.update(t, cur + 1)
        dl += 1
      }
    }
    (m, dl)
  }
}
