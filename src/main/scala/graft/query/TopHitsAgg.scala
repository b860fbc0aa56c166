package graft.query

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-N aggregator — ES `top_hits` (`upstream:` the agg
  * a search UI uses for "best N hits per facet bucket"; `collapse` is its
  * size = 1 case).
  *
  * The buffer NEVER exceeds `n` (score desc, docId asc) pairs at any
  * partial step, so a `groupBy(group).agg(...)` stays map-side combinable:
  * every input partition reduces to ≤ n rows per group BEFORE the
  * exchange. The alternative — a row_number window partitioned by the
  * group column — funnels the corpus-sized match set through |groups|
  * tasks at 100 TB (the same argument as collapseByLang's struct-max,
  * generalized from n = 1 to n; a 5-value lang column would leave 27 of 32
  * cores idle AND spill).
  *
  * Determinism: top-n under a TOTAL order (score desc, docId asc — docId
  * unique) is independent of reduce/merge arrival order, so the aggregate
  * is deterministic under any partitioning. Callers feed the PROTOCOL
  * score (already 6-dp rounded) so the group-local order matches the
  * output protocol's global one.
  */
final class TopHitsAgg(n: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(n > 0, "top_hits size must be positive")

  // best-first total order: higher score first, then lower docId
  private val best: Ordering[(Double, Long)] = Ordering.by { case (s, id) => (-s, id) }

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length == n && best.lteq(buf.last, in)) buf // can't displace the worst kept
    else ((buf :+ in).sorted(best)).take(n)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(best).take(n)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
