package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftshim.ExprColumn
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau–Levenshtein edit distance (insert / delete /
  * substitute / transpose, Lowrance–Wagner) as a native Catalyst
  * [[BinaryExpression]] with whole-stage codegen — the generated code calls
  * the static [[DamerauLevenshtein.distance]] directly, so the fuzzy
  * expansion's dictionary scan stays inside one codegen span exactly like
  * the classic-`levenshtein` path it extends.
  *
  * PINNED DISTANCE SEMANTICS (`transpositions = true` of the fuzzy family):
  * the UNRESTRICTED variant — a transposed pair may be edited again later
  * ('ca' → 'abc' = 2: transpose then insert) — because that is what the
  * oracle engine's `damerau_levenshtein()` computes (verified empirically:
  * ca/abc = 2, not OSA's 3). Lucene's `fuzziness` uses the RESTRICTED
  * variant (OSA, no edits on a transposed pair); the two agree on every
  * adjacent-swap case ('ab'/'ba' = 1, 'abcd'/'acbd' = 1) and differ only
  * when a substring is both transposed and edited — documented divergence,
  * same class as the classic-Levenshtein pin (SURVEY.md B18). Both engines
  * here compute the identical unrestricted distance, so parity is exact.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
  extends BinaryExpression {

  // no ExpectsInputTypes (AbstractDataType is private[sql] in Spark 4);
  // the only construction site is the typed apply(Column, Column) below,
  // always over the string dictionary column and a string literal
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshtein.distance(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauLevenshtein.distance($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Column form: `damerauLevenshtein(col("term"), lit(q))`. */
  def apply(a: Column, b: Column): Column =
    ExprColumn.column(DamerauLevenshtein(
      ExprColumn.expression(a), ExprColumn.expression(b)))

  /** Lowrance–Wagner unrestricted Damerau–Levenshtein. O(|a|·|b|) time,
    * O(|a|·|b|) space — dictionary terms are capped at 64 chars
    * (CodeTokenizer), so the matrix is at most 66×66 ints per comparison.
    * Called from generated code (see doGenCode) — keep the signature
    * (String, String) => Int and the method static-forwardable.
    */
  def distance(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // h is offset by +1 in both axes; h(0)(*) / h(*)(0) is the INF sentinel
    // row the transposition lookback falls into when a char was never seen.
    val h = Array.ofDim[Int](la + 2, lb + 2)
    h(0)(0) = inf
    var i = 0
    while (i <= la) { h(i + 1)(1) = i; h(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { h(1)(j + 1) = j; h(0)(j + 1) = inf; j += 1 }
    // last row index (1-based) where each char occurred in `a`
    val da = new java.util.HashMap[Char, Int]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1 = da.getOrDefault(b.charAt(j - 1), 0)
        val j1 = db
        var cost = 1
        if (a.charAt(i - 1) == b.charAt(j - 1)) { cost = 0; db = j }
        val sub = h(i)(j) + cost
        val ins = h(i + 1)(j) + 1
        val del = h(i)(j + 1) + 1
        val tra = h(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (tra < m) m = tra
        h(i + 1)(j + 1) = m
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    h(la + 1)(lb + 1)
  }
}
