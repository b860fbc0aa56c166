package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ES parent/child JOIN FIELD queries (`has_child`, `has_parent`): two
  * document types sharing a routing key, queried across the relation
  * (ES reference: join.query.HasChildQueryBuilder / HasParentQueryBuilder).
  * Here the parent table and child table are separate sources sharing the
  * key — exactly the join-field data model with ES's same-shard routing
  * replaced by a shuffle on the key.
  *
  * Scale notes: `has_child` is child-filter → map-side-combinable
  * groupBy(key) count → join to parents — the exchanges move (key, count)
  * partials, never child documents; this IS ES's global-ordinals parent
  * bitset cost model, with min/max_children applied at the aggregate
  * (HAVING pushes before the join, so out-of-range parents never join).
  * `has_parent` is a LeftSemi join of children against the matching-parent
  * key set — children never duplicate (semi), parents never materialize
  * into the output.
  */
object JoinFieldOps {

  /** ES `has_child` with `min_children`/`max_children` and
    * `score_mode: sum` over filter-context (constant-score 1) children:
    * parents whose matching-child count lies in [minChildren, maxChildren],
    * scored by that count. Pass pre-filtered `children` (the child query —
    * its predicate pushes to the child scan).
    */
  def hasChild(parents: DataFrame, parentKey: String, children: DataFrame,
      childKey: String, minChildren: Long = 1L,
      maxChildren: Long = Long.MaxValue): DataFrame = {
    require(minChildren >= 1L, s"min_children must be >= 1, got $minChildren")
    require(maxChildren >= minChildren,
      s"max_children ($maxChildren) must be >= min_children ($minChildren)")
    val counts = children
      .groupBy(col(childKey).as(parentKey))
      .agg(count(lit(1)).as("n_children"))
      .where(col("n_children").between(minChildren, maxChildren))
    // inner join = ES's "parent must exist" routing invariant (orphan child
    // keys drop out); parents' other columns are not carried — has_child
    // returns parent HITS, the caller re-attaches fields by key if needed.
    parents.select(col(parentKey)).join(counts, Seq(parentKey))
  }

  /** ES `has_parent` (default `score: false` — constant-score children):
    * every child whose parent key is in the matching-parent set. The parent
    * side arrives as a key frame (the parent query's ids); the semi join
    * keeps child rows intact and never duplicates them.
    */
  def hasParent(children: DataFrame, childKey: String,
      matchingParents: DataFrame, parentKey: String): DataFrame =
    children.join(
        matchingParents.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_semi")
      .select(children.columns.map(col).toIndexedSeq: _*) // joins hoist the key column first

  /** ES `has_child` with `inner_hits`: the qualifying parents ([[hasChild]]
    * count-range semantics) each carrying their top-`perParent` matching
    * children, ranked INSIDE the parent by (sortCol desc, tieCol asc) — ES
    * returns an inner_hits block per parent hit. The ranking window
    * partitions on the join key (distributed — never a global sort), and
    * children rank only AFTER the semi join onto qualifying parents (ES
    * collects inner_hits only for emitted parent hits), so the window's
    * input is already cut to the output parents' children. Output = the
    * child's columns + `hit_rank`.
    */
  def hasChildInnerHits(parents: DataFrame, parentKey: String,
      children: DataFrame, childKey: String, sortCol: String, tieCol: String,
      perParent: Int, minChildren: Long = 1L,
      maxChildren: Long = Long.MaxValue): DataFrame = {
    require(perParent >= 1, s"inner_hits size must be >= 1, got $perParent")
    val qualifying = hasChild(parents, parentKey, children, childKey,
      minChildren, maxChildren).select(col(parentKey).as(childKey))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(childKey)).orderBy(desc(sortCol), asc(tieCol))
    children.join(qualifying, Seq(childKey), "left_semi")
      .withColumn("hit_rank", row_number().over(w))
      .where(col("hit_rank") <= perParent)
  }

  /** ES `children` aggregation: bucket the PARENTS (here by `bucket`), then
    * aggregate metrics over each bucket's CHILD documents — "per parent
    * category, how many children and what's their mean value". One shuffle
    * join on the parent key attaches the bucket to each child, then one
    * map-side-combined groupBy folds the metrics — the exchanges move
    * (bucket, partials), never joined child rows, and when the parent side
    * projects to (key, bucket) it is broadcastable at any realistic parent
    * cardinality (ES's global-ordinals map is exactly that structure).
    */
  def childrenAgg(parents: DataFrame, parentKey: String, bucket: String,
      children: DataFrame, childKey: String, valueCol: String): DataFrame =
    children.select(col(childKey).as(parentKey), col(valueCol))
      .join(parents.select(col(parentKey), col(bucket)), Seq(parentKey))
      .groupBy(bucket)
      .agg(count(lit(1)).as("n_children"),
        round(avg(col(valueCol)), 4).as("avg_value"))
      .orderBy(bucket)

  /** ES `parent` aggregation — the reverse of [[childrenAgg]]: child-side
    * buckets ask about their PARENTS — per child bucket, the count of
    * distinct matching parents and a parent-metric mean. ES walks the join
    * field's ordinals child→parent under the child agg's scope; the
    * relational form must weight each PARENT ONCE per bucket, not once per
    * child (ES aggregates the parent DOC SET) — hence the two-level fold:
    * dedupe (bucket, key) first (map-side-combinable distinct), join the
    * parent's (key, value) onto that key-grain frame, then one aggregate.
    * Exchanges move (bucket, key) pairs and partials, never documents; the
    * parent projection is two columns and broadcasts at dimension-like
    * parent cardinalities.
    */
  def parentAgg(children: DataFrame, childKey: String, bucket: String,
      parents: DataFrame, parentKey: String, parentValueCol: String): DataFrame =
    children.select(col(bucket), col(childKey).as(parentKey)).distinct()
      .join(parents.select(col(parentKey), col(parentValueCol)), Seq(parentKey))
      .groupBy(bucket)
      .agg(count(lit(1)).as("n_parents"),
        round(avg(col(parentValueCol)), 4).as("avg_parent_value"))
      .orderBy(bucket)
}
