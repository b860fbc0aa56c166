package graft.query

/** Lucene classic `query_string` syntax, pinned v1 subset (SURVEY.md §2.3
  * B27 — `upstream:` the reference's ES endpoints accept `q=` /
  * `query_string` bodies from every search client):
  *
  * {{{
  *   query  := clause (WS clause)*
  *   clause := ['+' | '-'] body
  *   body   := '"' text '"'      phrase (positional, slop 0)
  *          |  chars '*'         prefix (constant-score rewrite)
  *          |  chars             scored term
  * }}}
  *
  * `+` marks a clause REQUIRED, `-` PROHIBITED, unsigned is optional-scoring
  * — exactly Lucene `BooleanClause.Occur` MUST / MUST_NOT / SHOULD.
  *
  * Out of the v1 grammar (documented, each fails loudly rather than parsing
  * to something else): field-qualified clauses (`field:x` — the driver
  * surface serves `multi_match` instead), fuzzy suffix (`x~2` —
  * `matchFuzzyDf` exists; blending expansions into the composition is
  * deferred), boosts (`x^2` — `applyClauseBoosts` exists), infix
  * `AND`/`OR`/`NOT` (the signs cover the reference toolchain's usage),
  * grouping parens, ranges. A `*` anywhere but the clause tail is rejected
  * (non-anchored wildcard has its own operator).
  */
object QueryString {
  sealed trait Body
  final case class Term(text: String) extends Body
  final case class Phrase(text: String) extends Body
  final case class Prefix(prefix: String) extends Body

  /** occur: +1 required (MUST), 0 optional (SHOULD), -1 prohibited
    * (MUST_NOT).
    */
  final case class Clause(body: Body, occur: Int)

  def parse(q: String): Seq[Clause] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Clause]
    val n = q.length
    var i = 0
    while (i < n) {
      while (i < n && q(i).isWhitespace) i += 1
      if (i < n) {
        val occur = q(i) match {
          case '+' => i += 1; 1
          case '-' => i += 1; -1
          case _ => 0
        }
        require(i < n && !q(i).isWhitespace,
          s"dangling '${if (occur > 0) "+" else "-"}' at offset ${i - 1} in '$q'")
        if (q(i) == '"') {
          val close = q.indexOf('"', i + 1)
          require(close > i, s"unbalanced quote at offset $i in '$q'")
          val body = q.substring(i + 1, close)
          require(body.trim.nonEmpty, s"empty phrase at offset $i in '$q'")
          out += Clause(Phrase(body), occur)
          i = close + 1
          require(i >= n || q(i).isWhitespace,
            s"trailing characters after closing quote at offset $i in '$q'")
        } else {
          var j = i
          while (j < n && !q(j).isWhitespace) j += 1
          val raw = q.substring(i, j)
          require(!raw.contains('"'), s"quote inside term '$raw' in '$q'")
          require(!raw.exists(c => c == '+' || c == '-'),
            s"sign inside term '$raw' in '$q' — signs attach to the clause head only")
          if (raw.endsWith("*")) {
            val pfx = raw.dropRight(1)
            require(pfx.nonEmpty && !pfx.contains('*'),
              s"bad prefix clause '$raw' in '$q' — exactly one trailing '*'")
            out += Clause(Prefix(pfx), occur)
          } else {
            require(!raw.contains('*'),
              s"non-trailing '*' in '$raw' — only the anchored prefix form (term*) is in the v1 grammar")
            out += Clause(Term(raw), occur)
          }
          i = j
        }
      }
    }
    require(out.nonEmpty, s"empty query_string '$q'")
    require(out.exists(_.occur >= 0),
      s"query_string '$q' has only prohibited clauses — nothing can match (Lucene rejects this too)")
    out.toSeq
  }

  /** ES `simple_query_string` surface syntax, pinned v1 (SURVEY.md §2.3
    * B27): same clause algebra as [[parse]] — the output feeds the SAME
    * BooleanQuery composer — but a different grammar and a LENIENT error
    * contract (ES: simple_query_string "discards invalid parts" and never
    * throws, unlike query_string):
    *
    *   - clauses split on whitespace; a bare `|` (ES OR) is a separator
    *     only — unsigned clauses already compose as SHOULD, which IS the
    *     default-OR semantics;
    *   - infix `+` (ES AND) splits a chunk into clauses that are each
    *     REQUIRED: `a+b` → must(a), must(b);
    *   - a leading `-` prohibits the chunk (and wins over infix `+`:
    *     `-a+b` prohibits both — lenient pin);
    *   - `"…"` is a phrase; an UNTERMINATED quote degrades to plain text
    *     (the quote char drops, the rest re-scans as a term chunk);
    *   - a trailing `*` marks a prefix clause; any other `*` placement is
    *     literal text for the analyzer to strip (never an error);
    *   - chunks that end up empty after operator stripping drop silently.
    *
    * PINNED FLATTENING divergence: ES parses `a b+c` as `a OR (b AND c)`
    * (a recursive grammar); this v1 compiles a FLAT clause list, so
    * `+`-members become MUST clauses globally — should(a), must(b),
    * must(c) — exact when the query carries a single conjunction (the
    * common case) and stricter otherwise. The driver twin mirrors the
    * flat semantics, so parity is unaffected.
    *
    * Term text is returned RAW (possibly multi-token); the caller fans
    * each Term out through its analyzer — ES analyzes free text per field,
    * and the analyzer lives with the index, not the parser.
    */
  def parseSimple(q: String): Seq[Clause] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Clause]
    val n = q.length
    var i = 0
    while (i < n) {
      while (i < n && (q(i).isWhitespace || q(i) == '|')) i += 1
      if (i < n) {
        var occur = 0
        if (q(i) == '-') { occur = -1; i += 1 }
        if (i < n && q(i) == '"') {
          val close = q.indexOf('"', i + 1)
          if (close > i) {
            val body = q.substring(i + 1, close)
            if (body.trim.nonEmpty) out += Clause(Phrase(body), occur)
            i = close + 1
          } else {
            i += 1 // unterminated quote: degrade to text (lenient pin)
          }
        } else if (i < n && !q(i).isWhitespace && q(i) != '|') {
          var j = i
          while (j < n && !q(j).isWhitespace && q(j) != '|') j += 1
          val raw = q.substring(i, j)
          // infix '+' = AND: every non-empty part becomes its own clause,
          // REQUIRED unless the chunk head already prohibited it
          val parts = raw.split('+').toSeq.filter(_.nonEmpty)
          val partOccur = if (occur < 0) -1 else if (parts.size > 1 || raw.contains('+')) 1 else occur
          for (p <- parts) {
            if (p.endsWith("*") && p.length > 1 && !p.dropRight(1).contains('*'))
              out += Clause(Prefix(p.dropRight(1)), partOccur)
            else if (p != "*")
              out += Clause(Term(p), partOccur)
          }
          i = j
        }
      }
    }
    out.toSeq
  }
}
