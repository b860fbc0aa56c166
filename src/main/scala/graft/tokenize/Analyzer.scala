package graft.tokenize

/** Analyzer configuration (SURVEY.md §7.8 — ES per-field analyzer settings,
  * scoped to what the pinned charset supports): the ES `standard` analyzer
  * is tokenize + lowercase + an OPTIONAL stopword list, and the first two
  * are [[CodeTokenizer]]'s frozen semantics — so the configurable surface is
  * exactly `stopwords`. Folding/stemming stay out (§7.8: any further option
  * must thread through engine build, query compile AND the DuckDB twin SQL
  * before it may exist).
  *
  * PINNED STOPWORD SEMANTICS (Lucene StopFilter with the default
  * `enable_position_increments`):
  *  - a stopword token is NOT indexed and does NOT count toward dl (Lucene
  *    norms count emitted tokens only);
  *  - its POSITION survives as a GAP — kept tokens keep their index in the
  *    FULL token stream, so `"x y"` does NOT phrase-match `x the y` at
  *    slop 0 but does at slop 1, exactly ES's behavior;
  *  - query `match`/`bool` text is filtered by the SAME analyzer (an
  *    all-stopword query matches nothing);
  *  - term-LEVEL queries (prefix/wildcard/regexp/fuzzy inputs) are NOT
  *    stopword-filtered — ES does not analyze those either.
  *
  * The analyzer an index was BUILT with is written to an `ANALYZER` sidecar
  * and is the only analyzer its readers will use — the immutability ES
  * enforces through field mappings. [[twinTokPredicate]] prints the DuckDB
  * twin fragment so both engines share one source of truth.
  */
final case class Analyzer(stopwords: Set[String]) {
  stopwords.foreach { s =>
    require(s.nonEmpty && s == s.toLowerCase(java.util.Locale.ROOT) &&
      s.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'),
      s"stopword must be a non-empty analyzed term ([a-z0-9_]+): '$s'")
  }

  def isDefault: Boolean = stopwords.isEmpty

  @inline def keep(term: String): Boolean = !stopwords.contains(term)

  /** The DuckDB twin fragment: appended inside a tok CTE's WHERE so tf, dl,
    * df and N all see the same filtered stream the engine indexes.
    */
  def twinTokPredicate: String =
    if (isDefault) ""
    else stopwords.toSeq.sorted.map(s => s"'$s'")
      .mkString(" AND t.term NOT IN (", ", ", ")")

  /** Sidecar encoding — sorted CSV, empty string = default analyzer. */
  def serialized: String = stopwords.toSeq.sorted.mkString(",")
}

object Analyzer {
  val default: Analyzer = Analyzer(Set.empty)

  def parse(s: String): Analyzer =
    if (s.trim.isEmpty) default
    else Analyzer(s.trim.split(",").map(_.trim).filter(_.nonEmpty).toSet)
}
