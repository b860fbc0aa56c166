package graft.ops

import graft.tokenize.CodeTokenizer

/** Multi-term highlighting v2 (SURVEY.md §2.3 B22) — the general form of the
  * pinned v1 fragment in `DocumentsIndex.highlight`: token-exact via a
  * char-offset tokenizer pass ([[CodeTokenizer.tokenizeWithOffsets]]), so it
  * needs NO space-padding corpus assumption — punctuation, underscores and
  * case all resolve exactly as the analyzer does (ES's unified highlighter
  * re-analyzes the field text the same way).
  *
  * PINNED v2 semantics (deterministic, SQL-twin-expressible):
  *   - anchor = the FIRST token whose analyzed term is a query term;
  *   - fragment window = [anchor.start - window, anchor.end + window),
  *     clamped to the text (char offsets, end exclusive);
  *   - every matched token FULLY INSIDE the window is wrapped in
  *     `<em>raw-span</em>` (raw span: original case, un-truncated);
  *   - no match -> None (the doc emits no highlight row).
  * ES's scored multi-fragment passage selection remains out of scope — the
  * anchor-window rule is the pinned deterministic stand-in (documented
  * divergence; the twin pins the identical rule).
  */
object HighlightOps {

  /** One highlighted fragment, or None when no query term occurs as a token.
    * `terms` must be analyzed terms (lowercase, truncated) — callers pass
    * `reader.analyze(query)` output.
    */
  def fragmentMulti(text: String, terms: Set[String], window: Int): Option[String] = {
    if (text == null || text.isEmpty || terms.isEmpty) return None
    val matches = CodeTokenizer.tokenizeWithOffsets(text).filter(t => terms.contains(t.term))
    if (matches.isEmpty) return None
    val first = matches(0)
    val lo = math.max(0, first.start - window)
    val end = math.min(text.length, first.end + window)
    // java.lang.StringBuilder: the (CharSequence, from, to) append overload
    // (the scala wrapper would auto-tuple a 3-arg append into append(Any))
    val sb = new java.lang.StringBuilder(end - lo + 16 * matches.length)
    var cur = lo
    for (m <- matches if m.start >= lo && m.end <= end) {
      sb.append(text, cur, m.start).append("<em>").append(text, m.start, m.end).append("</em>")
      cur = m.end
    }
    sb.append(text, cur, end)
    Some(sb.toString)
  }
}
