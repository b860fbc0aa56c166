package graft.query

import graft.codec.PostingsCodec
import graft.index.PostingBlock
import scala.collection.mutable

final case class SearchHit(docId: Long, score: Double)

/** Bounded top-k heap with the pinned tie-break (score desc, docId asc). */
final class TopKHeap(k: Int) {
  require(k >= 1, s"top-k heap needs k >= 1, got $k (callers map 'all results' to a large k or a dedicated rank-all path)")
  // priority = "worst first": smallest score, then largest docId
  private val pq = mutable.PriorityQueue.empty[SearchHit](
    Ordering.by((h: SearchHit) => (-h.score, h.docId)))

  def threshold: Double = if (pq.size < k) Double.NegativeInfinity else pq.head.score
  def full: Boolean = pq.size >= k

  def offer(docId: Long, score: Double): Unit = {
    if (pq.size < k) pq.enqueue(SearchHit(docId, score))
    else {
      val w = pq.head
      if (score > w.score || (score == w.score && docId < w.docId)) {
        pq.dequeue()
        pq.enqueue(SearchHit(docId, score))
      }
    }
  }

  def results: Array[SearchHit] =
    pq.toArray.sortBy(h => (-h.score, h.docId))
}

/** Decoded-block cache shared by all queries scored in one bucket task: a
  * batch's queries overlap heavily on hot (stopword-scale) blocks, so each
  * block is decoded at most once per bucket regardless of how many queries
  * touch it.
  */
final class BlockCache {
  // keyed by (term, blockId, firstDocId): blockId alone repeats across
  // SEGMENTS of a delta-maintained index, but segment docId ranges are
  // disjoint, so firstDocId disambiguates
  private val m = mutable.HashMap.empty[(String, Long, Long), (Array[Long], Array[Int], Array[Int])]
  var decodes = 0L
  var hits = 0L
  def decoded(b: PostingBlock): (Array[Long], Array[Int], Array[Int]) = {
    val key = (b.term, b.blockId, b.firstDocId)
    m.get(key) match {
      case Some(v) => hits += 1; v
      case None =>
        decodes += 1
        val v = (PostingsCodec.decodeDocIds(b.firstDocId, b.count, b.docDeltas),
          PostingsCodec.decodeTfs(b.count, b.tfs), PostingsCodec.decodeDls(b.count, b.dls))
        m.update(key, v)
        v
    }
  }
}

/** Per-term cursor over this bucket's compressed block list: block-level
  * skipping without decode; a block is decoded only when a document inside
  * it must actually be visited (SURVEY.md §2.3 B9).
  *
  * `blocks` must be this term's blocks sorted by firstDocId — non-overlapping
  * by construction (salted runs partition the docId space in salt order,
  * blockId = (salt << 32) | position). [lo, hi) masks the cursor to this
  * bucket's docId range.
  */
final class TermCursor(val term: String, val idf: Double, val ubGlobal: Double,
    blocks: Array[PostingBlock], lo: Long, hi: Long, avgDl: Double, p: Bm25Params,
    cache: BlockCache = null) {
  private var bi = 0
  private var ids: Array[Long] = null
  private var tfs: Array[Int] = null
  private var dls: Array[Int] = null
  private var pos = 0
  var exhausted: Boolean = blocks.isEmpty
  var decodedBlocks = 0L
  var skippedBlocks = 0L

  advanceTo(lo)

  def curDoc: Long = ids(pos)
  def score: Double = idf * Bm25.tfNorm(tfs(pos).toLong, dls(pos).toLong, avgDl, p)

  private def decodeBlock(): Unit = {
    val b = blocks(bi)
    if (cache != null) {
      val (i, t, d) = cache.decoded(b)
      ids = i; tfs = t; dls = d
    } else {
      ids = PostingsCodec.decodeDocIds(b.firstDocId, b.count, b.docDeltas)
      tfs = PostingsCodec.decodeTfs(b.count, b.tfs)
      dls = PostingsCodec.decodeDls(b.count, b.dls)
    }
    pos = 0
    decodedBlocks += 1
  }

  /** Index of the last block with firstDocId <= d (>= bi for d >= curDoc). */
  private def blockContainingOrBefore(d: Long): Int = {
    var j = bi
    while (j + 1 < blocks.length && blocks(j + 1).firstDocId <= d) j += 1
    j
  }

  /** Upper bound of this term's contribution to EXACTLY doc d (0 if d falls
    * in a gap between blocks). No decode, no state change.
    */
  def boundAt(d: Long): Double = {
    val j = blockContainingOrBefore(d)
    if (blocks(j).lastDocId >= d && blocks(j).firstDocId <= d) idf * blocks(j).blockMaxTfn else 0.0
  }

  /** Largest docId d' >= d such that every doc in [d, d'] has the same bound
    * as boundAt(d) (end of the covering block, or end of the gap).
    */
  def boundaryAt(d: Long): Long = {
    val j = blockContainingOrBefore(d)
    if (blocks(j).lastDocId >= d) blocks(j).lastDocId
    else if (j + 1 < blocks.length) blocks(j + 1).firstDocId - 1
    else Long.MaxValue
  }

  /** Move to the first posting with docId >= target; skips whole blocks
    * without decoding them.
    */
  def advanceTo(target: Long): Unit = {
    if (exhausted) return
    if (target >= hi) { exhausted = true; return }
    while (bi < blocks.length && blocks(bi).lastDocId < target) {
      if (ids == null) skippedBlocks += 1
      bi += 1
      ids = null
    }
    if (bi >= blocks.length) { exhausted = true; return }
    if (blocks(bi).firstDocId >= hi) { exhausted = true; return }
    if (ids == null) decodeBlock()
    // first id >= target within the block (<= 128 entries; binary search)
    var lo0 = pos
    var hi0 = ids.length
    while (lo0 < hi0) {
      val mid = (lo0 + hi0) >>> 1
      if (ids(mid) < target) lo0 = mid + 1 else hi0 = mid
    }
    pos = lo0
    if (pos >= ids.length) { // target beyond this block's last (can't happen: lastDocId >= target)
      bi += 1; ids = null
      if (bi >= blocks.length || blocks(bi).firstDocId >= hi) { exhausted = true; return }
      decodeBlock()
    }
    if (ids(pos) >= hi) exhausted = true
  }
}

/** Block-Max WAND over one docId-range bucket (the Spark-level sharding:
  * each bucket is ES's "shard" — local top-k with a local threshold, merged
  * globally by orderBy(score desc, docId asc).limit(k), SURVEY.md §3.3).
  */
object BlockMaxWand {
  final case class TermMeta(term: String, idf: Double, maxImpact: Double)

  /** Per-clause/field boost applied where every scoring path reads its term
    * statistics: both idf (the score contribution multiplier) AND maxImpact
    * (the WAND upper bound) scale together, so Block-Max pruning and the
    * cross-field pivot sum stay EXACT under boosts — a bound left unscaled
    * would make WAND skip docs the boosted scores still rank. Scaling at
    * the meta level (not the per-field sum) keeps the bounded WAND path and
    * the relational rank-all path bit-identical for ANY boost: both fold
    * the same boosted per-term contributions in the same order.
    */
  def boostMeta(meta: Map[String, TermMeta], boost: Double): Map[String, TermMeta] =
    if (boost == 1.0) meta
    else meta.view.mapValues(m =>
      m.copy(idf = m.idf * boost, maxImpact = m.maxImpact * boost)).toMap

  final case class BucketStats(var decoded: Long = 0L, var skipped: Long = 0L, var scoredDocs: Long = 0L)

  /** termBlocks: per query term, this bucket's blocks. Returns the
    * bucket-local top-k. Exact w.r.t. the exhaustive scorer: skips only
    * docs provably unable to enter the top-k under the pinned tie-break.
    * `presorted = true` promises every term's blocks are already sorted by
    * firstDocId — batch callers sort once per bucket and share the arrays
    * across all queries instead of paying an O(blocks log blocks) sort per
    * (query, term).
    */
  def scoreBucket(termBlocks: Map[String, Array[PostingBlock]], meta: Map[String, TermMeta],
      lo: Long, hi: Long, k: Int, avgDl: Double, p: Bm25Params,
      stats: BucketStats = BucketStats(), cache: BlockCache = null,
      presorted: Boolean = false): Array[SearchHit] = {
    val cursors: Array[TermCursor] = termBlocks.toArray.sortBy(_._1).map { case (t, bs) =>
      val m = meta(t)
      val sorted = if (presorted) bs else bs.sortBy(_.firstDocId)
      new TermCursor(t, m.idf, m.maxImpact, sorted, lo, hi, avgDl, p, cache)
    }
    scoreCursors(cursors, k, stats)
  }

  /** The WAND core over PRE-BUILT cursors — what lets one heap span cursors
    * with DIFFERENT per-cursor stats (idf under a field's own df, bound and
    * score under the field's own avgdl): cross-field `multi_match` top-k is
    * this, with one cursor per (field, term). `cursors` array order IS the
    * pinned summation order (single-field callers sort by term; multi-field
    * by (field, term)). `groupOf(i)`, ascending and aligned with `cursors`,
    * optionally partitions cursors into summation groups: a doc's score is
    * then the GROUP sums added in group order — exactly the float
    * association the relational form produces (per-field fold joined by
    * coalesce-sum), so the WAND path is bit-identical to it, not just
    * mathematically equal.
    */
  /** `tieBreaker` (only meaningful with `groupOf`): ES `multi_match` type
    * semantics over the per-group (= per-field) partial sums —
    * 1.0 = `most_fields`/sum (the default; bit-identical to the plain
    * grouped fold), 0.0 = `best_fields` (max group wins), between =
    * `max + tieBreaker · (sum − max)`. The WAND pivot/block bounds sum
    * across ALL fields, which upper-bounds every tieBreaker ≤ 1.0 score —
    * valid (slightly looser for small tieBreaker), so pruning stays exact.
    */
  /** `dismaxWithinGroups` TRANSPOSES the group combine for `cross_fields`:
    * groups are then TERMS (one group = one term's cursors across fields),
    * the dismax `max + tieBreaker · (sum − max)` applies WITHIN each group
    * over per-field contributions, and groups SUM — the term-centric
    * BlendedTermQuery shape, versus the default's field-centric one (sum
    * within a field, dismax across fields). The ALL-cursor bound sum stays
    * a valid pivot bound either way for tieBreaker ≤ 1 (each group's dismax
    * ≤ its sum).
    */
  def scoreCursors(cursors: Array[TermCursor], k: Int,
      stats: BucketStats = BucketStats(), groupOf: Array[Int] = null,
      tieBreaker: Double = 1.0, dismaxWithinGroups: Boolean = false): Array[SearchHit] = {
    val heap = new TopKHeap(k)
    var active = cursors.filter(!_.exhausted)

    while (active.nonEmpty) {
      val sorted = active.sortBy(_.curDoc)
      val theta = heap.threshold

      // WAND pivot over global per-term upper bounds. STRICT inequality is
      // exact here: docs are visited in ascending docId order within a
      // bucket, so a candidate tying theta loses the (score desc, docId asc)
      // tie-break to the already-seated smaller docId and can never enter.
      var acc = 0.0
      var pi = -1
      var i = 0
      while (i < sorted.length && pi == -1) {
        acc += sorted(i).ubGlobal
        if (acc > theta) pi = i
        i += 1
      }
      if (pi == -1) {
        active = Array.empty // no remaining doc can reach the threshold
      } else {
        val pivotDoc = sorted(pi).curDoc
        // extend the prefix to every cursor at or before the pivot doc
        while (pi + 1 < sorted.length && sorted(pi + 1).curDoc <= pivotDoc) pi += 1
        // block-max refinement: tight bound for scoring exactly pivotDoc
        var bms = 0.0
        var j = 0
        while (j <= pi) { bms += sorted(j).boundAt(pivotDoc); j += 1 }

        if (bms > theta) {
          if (sorted(0).curDoc == pivotDoc) {
            // all prefix cursors aligned: score pivotDoc in `cursors` order
            // (the pinned summation order), with optional per-group partial
            // sums (see scaladoc)
            var s = 0.0
            var c = 0
            if (groupOf == null) {
              while (c < cursors.length) {
                val cur = cursors(c)
                if (!cur.exhausted && cur.curDoc == pivotDoc) s += cur.score
                c += 1
              }
            } else if (dismaxWithinGroups) {
              // cross_fields transpose: dismax WITHIN each group (a term's
              // per-field contributions, added/maxed in cursor = field
              // order), groups SUM in group = term order — the float
              // association the relational fold reproduces exactly
              var gSum = 0.0
              var gMax = 0.0
              var acc2 = 0.0
              var curG = groupOf(0)
              while (c < cursors.length) {
                if (groupOf(c) != curG) {
                  acc2 += (if (tieBreaker == 1.0) gSum
                           else gMax + tieBreaker * (gSum - gMax))
                  gSum = 0.0; gMax = 0.0; curG = groupOf(c)
                }
                val cur = cursors(c)
                if (!cur.exhausted && cur.curDoc == pivotDoc) {
                  val v = cur.score
                  gSum += v
                  if (v > gMax) gMax = v
                }
                c += 1
              }
              acc2 += (if (tieBreaker == 1.0) gSum
                       else gMax + tieBreaker * (gSum - gMax))
              s = acc2
            } else {
              // per-group partials in group order; gsSum's additions happen
              // in EXACTLY the order the plain fold used, so tieBreaker=1.0
              // stays bit-identical to it
              var gs = 0.0
              var gsSum = 0.0
              var gsMax = 0.0
              var curG = groupOf(0)
              while (c < cursors.length) {
                if (groupOf(c) != curG) {
                  gsSum += gs; if (gs > gsMax) gsMax = gs
                  gs = 0.0; curG = groupOf(c)
                }
                val cur = cursors(c)
                if (!cur.exhausted && cur.curDoc == pivotDoc) gs += cur.score
                c += 1
              }
              gsSum += gs; if (gs > gsMax) gsMax = gs
              s = if (tieBreaker == 1.0) gsSum
                  else gsMax + tieBreaker * (gsSum - gsMax)
            }
            heap.offer(pivotDoc, s)
            stats.scoredDocs += 1
            j = 0
            while (j <= pi) { sorted(j).advanceTo(pivotDoc + 1); j += 1 }
          } else {
            // advance lagging cursors up to the pivot
            j = 0
            while (j <= pi && sorted(j).curDoc < pivotDoc) { sorted(j).advanceTo(pivotDoc); j += 1 }
          }
        } else {
          // block-max skip: past the bucket where the bound holds
          var target = Long.MaxValue
          j = 0
          while (j <= pi) { target = math.min(target, sorted(j).boundaryAt(pivotDoc)); j += 1 }
          if (pi + 1 < sorted.length) target = math.min(target, sorted(pi + 1).curDoc - 1)
          if (target != Long.MaxValue) target += 1 // first doc NOT covered by the bound
          j = 0
          while (j <= pi) { sorted(j).advanceTo(target); j += 1 }
        }
        active = active.filter(!_.exhausted)
      }
    }
    cursors.foreach { c => stats.decoded += c.decodedBlocks; stats.skipped += c.skippedBlocks }
    heap.results
  }
}
