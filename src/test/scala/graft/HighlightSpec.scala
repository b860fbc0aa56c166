package graft

import graft.ops.HighlightOps
import graft.tokenize.CodeTokenizer
import org.scalatest.funsuite.AnyFunSuite

/** Highlighter-v2 gate (SURVEY.md §2.3 B22): the char-offset tokenizer must
  * agree with the pinned analyzer, and fragmentMulti must be token-exact
  * across punctuation/underscore/case boundaries — the exact corpus shapes
  * the v1 space-padding expression could NOT handle.
  */
class HighlightSpec extends AnyFunSuite {

  test("offsets tokenizer: map(_.term) == pinned tokenize on punctuation-heavy inputs") {
    for (s <- Seq("", "   ", "Foo.bar(baz_qux)", "a-b_c  d!!e", "hash,join;hash_join.",
        "x" * 200, "Ünïcödé glüe björk", "a\nb\tc", "0x1F slot_9"))
      assert(CodeTokenizer.tokenizeWithOffsets(s).map(_.term).toSeq ==
        CodeTokenizer.tokenize(s).toSeq, s"offsets/terms diverge on '$s'")
  }

  test("spans point at raw runs: original case preserved, 64-truncation keeps the raw span") {
    assert(CodeTokenizer.tokenizeWithOffsets("Foo.bar!").toSeq ==
      Seq(CodeTokenizer.TokenSpan("foo", 0, 3), CodeTokenizer.TokenSpan("bar", 4, 7)))
    val sp = CodeTokenizer.tokenizeWithOffsets("A" * 70 + "!x")
    assert(sp(0).term == "a" * 64 && sp(0).start == 0 && sp(0).end == 70)
    assert(sp(1) == CodeTokenizer.TokenSpan("x", 71, 72))
  }

  test("fragmentMulti: punctuation boundaries, no space-padding assumption") {
    // "hash(join)" must match token-exactly; "hashx" and "hash_join" are
    // DIFFERENT analyzer tokens and must not be wrapped
    val text = "use hash(join) on hashx and hash_join now"
    val got = HighlightOps.fragmentMulti(text, Set("hash", "join"), 30).get
    assert(got == "use <em>hash</em>(<em>join</em>) on hashx and hash_join ")
  }

  test("fragmentMulti: original case preserved in the wrapped span, matching is case-folded") {
    val got = HighlightOps.fragmentMulti("Hash JOIN here", Set("hash", "join"), 30).get
    assert(got == "<em>Hash</em> <em>JOIN</em> here")
  }

  test("fragmentMulti: window clamps and excludes matches outside it") {
    // anchor at the first match; a second match far beyond anchor.end +
    // window stays unwrapped and the fragment cuts at the window edge
    val text = "hash " + ("z " * 40) + "join end"
    val got = HighlightOps.fragmentMulti(text, Set("hash", "join"), 10).get
    assert(got == "<em>hash</em> z z z z z")
    // anchor mid-text: window extends both directions
    val text2 = ("a " * 20) + "hash tail"
    val got2 = HighlightOps.fragmentMulti(text2, Set("hash"), 6).get
    assert(got2 == "a a a <em>hash</em> tail")
  }

  test("fragmentMulti: no token match -> None (substring occurrences don't count)") {
    assert(HighlightOps.fragmentMulti("hashing rejoined", Set("hash", "join"), 30).isEmpty)
    assert(HighlightOps.fragmentMulti("", Set("hash"), 30).isEmpty)
    assert(HighlightOps.fragmentMulti("plain text", Set.empty, 30).isEmpty)
  }
}
