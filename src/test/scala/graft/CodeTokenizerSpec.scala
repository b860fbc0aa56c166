package graft

import graft.tokenize.CodeTokenizer
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class CodeTokenizerSpec extends AnyFunSuite with GenCheck {

  test("basic code line") {
    assert(CodeTokenizer.tokenize("def fooBar(x: Int) = x + 1").toSeq ==
      Seq("def", "foobar", "x", "int", "x", "1"))
  }

  test("null / empty / all-separator input") {
    assert(CodeTokenizer.tokenize(null).isEmpty)
    assert(CodeTokenizer.tokenize("").isEmpty)
    assert(CodeTokenizer.tokenize("  \n\t ++ -- !! ").isEmpty)
  }

  test("underscores and digits are word chars") {
    assert(CodeTokenizer.tokenize("snake_case_2 x1_y").toSeq == Seq("snake_case_2", "x1_y"))
  }

  test("terms truncated at MaxTermLen") {
    val long = "a" * 200
    val toks = CodeTokenizer.tokenize(long + " b")
    assert(toks.toSeq == Seq("a" * CodeTokenizer.MaxTermLen, "b"))
  }

  test("non-ascii characters act as separators") {
    assert(CodeTokenizer.tokenize("für straße 中文 abc").toSeq == Seq("f", "r", "stra", "e", "abc"))
  }

  val printable: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '_', '.', '(', ')', '\n', '+', '"'))).map(_.mkString)

  test("property: deterministic, lowercase-closed, no empties") {
    forAllG(printable) { s =>
      val t1 = CodeTokenizer.tokenize(s)
      val t2 = CodeTokenizer.tokenize(s)
      assert(t1.toSeq == t2.toSeq)
      assert(t1.forall(t => t.nonEmpty && t.length <= CodeTokenizer.MaxTermLen))
      assert(t1.forall(t => t == t.toLowerCase(java.util.Locale.ROOT)))
    }
  }

  test("property: concat with separator boundary = concat of token streams") {
    forAllG2(printable, printable) { (a, b) =>
      assert(CodeTokenizer.tokenize(a + " " + b).toSeq ==
        (CodeTokenizer.tokenize(a) ++ CodeTokenizer.tokenize(b)).toSeq)
    }
  }

  /** The original regex formulation — kept as the differential reference for
    * the char-scan implementation.
    */
  private def tokenizeRegex(content: String): Seq[String] = {
    if (content == null || content.isEmpty) return Seq.empty
    content.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9_]+").toSeq
      .filter(_.nonEmpty)
      .map(t => if (t.length > CodeTokenizer.MaxTermLen) t.substring(0, CodeTokenizer.MaxTermLen) else t)
  }

  val anyString: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '_', '.', '(', '\n', '+', 'Ä', 'ß', '中', 'İ', 'ı', 'Σ', 'K'),
    1 -> Gen.choose(Char.MinValue, Char.MaxValue))).map(_.mkString)

  test("property: char-scan tokenizer == regex reference (incl. unicode)") {
    forAllG(anyString, 400) { s =>
      assert(CodeTokenizer.tokenize(s).toSeq == tokenizeRegex(s), s"input=${s.map(_.toInt)}")
    }
  }

  test("tfMap matches tokenize") {
    forAllG(printable) { s =>
      val toks = CodeTokenizer.tokenize(s)
      val (m, dl) = CodeTokenizer.tfMap(s)
      assert(dl == toks.length)
      assert(m.toMap == toks.groupBy(identity).view.mapValues(_.length).toMap)
    }
  }

  test("tfCount / countTokens match tfMap / tokenize (hot-path variants)") {
    forAllG(anyString, 300) { s =>
      val toks = CodeTokenizer.tokenize(s)
      assert(CodeTokenizer.countTokens(s) == toks.length)
      val tc = CodeTokenizer.tfCount(s)
      assert(tc.dl == toks.length)
      assert(tc.iterator.toMap == toks.groupBy(identity).view.mapValues(_.length).toMap)
      val viaForeach = scala.collection.mutable.Map[String, Int]()
      tc.foreachEntry((t, n) => viaForeach(t) = n)
      assert(viaForeach.toMap == tc.iterator.toMap)
    }
  }
}
