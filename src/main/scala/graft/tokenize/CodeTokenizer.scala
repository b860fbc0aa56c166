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

  /** One analyzer token with its RAW character span in the source string:
    * `term` is the pinned analyzed form (lowercased, 64-truncated) while
    * [start, end) is the full raw run of word chars (0-based, end
    * exclusive) — highlighting wraps the raw span, matching wraps the term.
    * lower() is length-preserving for this ASCII charset, so offsets in the
    * lowercased scan are valid indices into the ORIGINAL string.
    */
  final case class TokenSpan(term: String, start: Int, end: Int)

  /** [[tokenize]] with character offsets — the char-offset pass the
    * highlighter family needs (ES stores these as token offsets in the
    * postings; here the source text is at hand when highlighting, so one
    * re-tokenize of k documents beats carrying offsets for the whole
    * corpus). Same pinned split/lowercase/truncate semantics as
    * [[tokenize]]; a differential test pins `map(_.term)` == tokenize.
    */
  def tokenizeWithOffsets(content: String): Array[TokenSpan] = {
    if (content == null || content.isEmpty) return Array.empty
    val s = content.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    val out = mutable.ArrayBuilder.make[TokenSpan]
    var i = 0
    while (i < n) {
      while (i < n && !isWordChar(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && isWordChar(s.charAt(i))) i += 1
        val len = math.min(i - start, MaxTermLen)
        out += TokenSpan(s.substring(start, start + len), start, i)
      }
    }
    out.result()
  }

  /** Token COUNT without materializing any token string — the registry only
    * needs dl, and allocating ~200 substrings per document just to count
    * them was a measurable share of build GC time.
    */
  def countTokens(content: String): Int = {
    if (content == null || content.isEmpty) return 0
    val s = content.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    var dl = 0
    var i = 0
    while (i < n) {
      while (i < n && !isWordChar(s.charAt(i))) i += 1
      if (i < n) {
        dl += 1
        while (i < n && isWordChar(s.charAt(i))) i += 1
      }
    }
    dl
  }

  /** Open-addressing String->count map: no per-entry boxing/objects (the
    * scala HashMap[String,Int] version allocated a boxed Int + entry per
    * token on the build hot path — ~hundreds of millions per build).
    */
  final class TfCounter(initialCapacity: Int = 256) {
    private var cap = Integer.highestOneBit(math.max(16, initialCapacity) * 2 - 1) << 1
    private var keys = new Array[String](cap)
    private var counts = new Array[Int](cap)
    private var used = 0
    var dl = 0

    def size: Int = used

    private def grow(): Unit = {
      val ok = keys; val oc = counts
      cap <<= 1
      keys = new Array[String](cap)
      counts = new Array[Int](cap)
      used = 0
      var i = 0
      while (i < ok.length) {
        if (ok(i) != null) addN(ok(i), oc(i))
        i += 1
      }
    }

    def addN(t: String, n: Int): Unit = {
      if (used * 4 >= cap * 3) grow()
      var i = t.hashCode & (cap - 1)
      while (keys(i) != null && !keys(i).equals(t)) i = (i + 1) & (cap - 1)
      if (keys(i) == null) { keys(i) = t; counts(i) = n; used += 1 }
      else counts(i) += n
    }

    def foreachEntry(f: (String, Int) => Unit): Unit = {
      var i = 0
      while (i < keys.length) {
        if (keys(i) != null) f(keys(i), counts(i))
        i += 1
      }
    }

    /** Iterator over entries (allocation: one tuple per DISTINCT term). */
    def iterator: Iterator[(String, Int)] = new Iterator[(String, Int)] {
      private var i = 0
      private def skip(): Unit = { while (i < keys.length && keys(i) == null) i += 1 }
      skip()
      def hasNext: Boolean = i < keys.length
      def next(): (String, Int) = { val r = (keys(i), counts(i)); i += 1; skip(); r }
    }
  }

  /** tf + POSITIONS counter (the positional sibling of [[TfCounter]], same
    * open-addressing layout): each occurrence's 0-based token position is
    * appended DIRECTLY as its final on-disk encoding — a raw VByte stream of
    * (first position absolute, then successive gaps minus 1), the per-posting
    * payload [[graft.codec.PostingsCodec.decodePositions]] splits by tf. No
    * intermediate Int arrays: the narrow tokenize map emits postings whose
    * position bytes travel the token exchange and concatenate into block
    * payloads untouched.
    */
  final class TfPosCounter(initialCapacity: Int = 256) {
    private var cap = Integer.highestOneBit(math.max(16, initialCapacity) * 2 - 1) << 1
    private var keys = new Array[String](cap)
    private var counts = new Array[Int](cap)
    private var lastPos = new Array[Int](cap)
    private var bufs = new Array[mutable.ArrayBuilder[Byte]](cap)
    private var used = 0
    var dl = 0

    def size: Int = used

    private def grow(): Unit = {
      val ok = keys; val oc = counts; val ol = lastPos; val ob = bufs
      cap <<= 1
      keys = new Array[String](cap)
      counts = new Array[Int](cap)
      lastPos = new Array[Int](cap)
      bufs = new Array[mutable.ArrayBuilder[Byte]](cap)
      var i = 0
      while (i < ok.length) {
        if (ok(i) != null) {
          var j = ok(i).hashCode & (cap - 1)
          while (keys(j) != null) j = (j + 1) & (cap - 1)
          keys(j) = ok(i); counts(j) = oc(i); lastPos(j) = ol(i); bufs(j) = ob(i)
        }
        i += 1
      }
    }

    def add(t: String, pos: Int): Unit = {
      if (used * 4 >= cap * 3) grow()
      var i = t.hashCode & (cap - 1)
      while (keys(i) != null && !keys(i).equals(t)) i = (i + 1) & (cap - 1)
      if (keys(i) == null) {
        keys(i) = t; counts(i) = 1; used += 1
        val b = mutable.ArrayBuilder.make[Byte]
        bufs(i) = b
        graft.codec.PostingsCodec.writeVLong(b, pos.toLong)
      } else {
        counts(i) += 1
        graft.codec.PostingsCodec.writeVLong(bufs(i), (pos - lastPos(i) - 1).toLong)
      }
      lastPos(i) = pos
    }

    /** Iterator over (term, tf, encoded positions). */
    def iterator: Iterator[(String, Int, Array[Byte])] = new Iterator[(String, Int, Array[Byte])] {
      private var i = 0
      private def skip(): Unit = { while (i < keys.length && keys(i) == null) i += 1 }
      skip()
      def hasNext: Boolean = i < keys.length
      def next(): (String, Int, Array[Byte]) = {
        val r = (keys(i), counts(i), bufs(i).result())
        i += 1; skip(); r
      }
    }
  }

  /** Per-document invert WITH positions — the build hot path when
    * IndexConfig.storePositions is on.
    */
  def tfPos(content: String): TfPosCounter = {
    val m = new TfPosCounter()
    if (content == null || content.isEmpty) return m
    val s = content.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && !isWordChar(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && isWordChar(s.charAt(i))) i += 1
        val len = math.min(i - start, MaxTermLen)
        m.add(s.substring(start, start + len), m.dl)
        m.dl += 1
      }
    }
    m
  }

  /** Hot-path per-document invert: tf counts + dl with minimal garbage. */
  def tfCount(content: String): TfCounter = {
    val m = new TfCounter()
    if (content == null || content.isEmpty) return m
    val s = content.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && !isWordChar(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && isWordChar(s.charAt(i))) i += 1
        val len = math.min(i - start, MaxTermLen)
        m.addN(s.substring(start, start + len), 1)
        m.dl += 1
      }
    }
    m
  }

  /** Analyzer-aware [[tokenize]]: the pinned token stream with stopwords
    * removed (positions are NOT represented here — use [[tfPos]] for the
    * gap-preserving positional form).
    */
  def tokenize(content: String, a: Analyzer): Array[String] =
    if (a.isDefault) tokenize(content) else tokenize(content).filter(a.keep)

  /** Analyzer-aware token count: dl counts EMITTED (non-stopword) tokens
    * only — Lucene norms do the same.
    */
  def countTokens(content: String, a: Analyzer): Int =
    if (a.isDefault) countTokens(content)
    else tokenize(content).count(a.keep)

  /** Analyzer-aware positional invert: a stopword is skipped but its
    * POSITION survives as a gap (kept tokens carry their index in the FULL
    * stream — Lucene StopFilter's enable_position_increments), while dl
    * counts kept tokens only.
    */
  def tfPos(content: String, a: Analyzer): TfPosCounter = {
    if (a.isDefault) return tfPos(content)
    val m = new TfPosCounter()
    if (content == null || content.isEmpty) return m
    val s = content.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    var pos = 0
    var i = 0
    while (i < n) {
      while (i < n && !isWordChar(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && isWordChar(s.charAt(i))) i += 1
        val len = math.min(i - start, MaxTermLen)
        val t = s.substring(start, start + len)
        if (a.keep(t)) { m.add(t, pos); m.dl += 1 }
        pos += 1
      }
    }
    m
  }

  /** Analyzer-aware tf invert (no positions): stopwords excluded from both
    * tf and dl.
    */
  def tfCount(content: String, a: Analyzer): TfCounter = {
    if (a.isDefault) return tfCount(content)
    val m = new TfCounter()
    if (content == null || content.isEmpty) return m
    val s = content.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && !isWordChar(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && isWordChar(s.charAt(i))) i += 1
        val len = math.min(i - start, MaxTermLen)
        val t = s.substring(start, start + len)
        if (a.keep(t)) { m.addN(t, 1); m.dl += 1 }
      }
    }
    m
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
