package graft.query

import graft.index.PostingBlock

/** Positional phrase matching over one docId-range bucket (SURVEY.md §2.3
  * B15; ES `match_phrase` / Lucene PhraseQuery, exact positions, ordered
  * slop).
  *
  * Shape: conjunctive docId intersection FIRST (decoded id arrays only),
  * position verification SECOND — and a block's `pos` payload is decoded
  * lazily, only when some candidate doc inside that block survives the
  * intersection. A phrase over one rare + one common term therefore decodes
  * the common term's positions for only the handful of blocks containing
  * candidates, which is the property that makes phrase queries affordable
  * at corpus scale (the same economics as Lucene: .doc is read list-wide,
  * .pos only at verified candidates).
  *
  * Slop semantics (pinned): a start position `p0` (an occurrence of token
  * 0) matches when there exist strictly increasing positions
  * `p0 < p1 < … < p(n-1)`, one per token slot in phrase order, with total
  * slack `p(n-1) - p0 - (n-1) <= slop`; `phraseTf` counts the matching
  * starts. `slop = 0` is exact adjacency (identical to the slide-window
  * oracle). This is Lucene's ORDERED sloppy semantics — for two terms it is
  * exactly `match_phrase` with `slop`; for n > 2 ES additionally allows
  * out-of-order moves within the edit budget, which this engine pins away
  * (documented caveat: order is always required here).
  */
object PhraseMatcher {
  /** First index in sorted `a` with value strictly greater than `key`. */
  @inline private def upperBound(a: Array[Int], key: Int): Int = {
    var lo = 0
    var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) <= key) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Match the analyzed phrase `tokens` (order and duplicates preserved)
    * against this bucket's blocks; returns (docId, phraseTf) for every doc
    * in [lo, hi) with at least one matching start under `slop`. `termBlocks`
    * must cover every distinct token (callers return early on any absent
    * term — a conjunctive query with a df=0 term matches nothing) with
    * blocks sorted by firstDocId.
    */
  def matchBucket(termBlocks: Map[String, Array[PostingBlock]], tokens: Array[String],
      lo: Long, hi: Long, slop: Int = 0): Array[(Long, Int)] = {
    require(slop >= 0, s"slop must be >= 0, got $slop")
    val n = tokens.length
    val maxSpan = n - 1 + slop
    val distinct = tokens.distinct
    val views = distinct.map(t => t -> new PostingsView(termBlocks(t))).toMap
    // anchor the MEMBERSHIP walk on the RAREST term in this bucket: fewest
    // candidate docs reach the position-verify phase
    val anchorTerm = distinct.minBy(t => views(t).total)
    val anchorSlot = tokens.indexOf(anchorTerm)
    val anchor = views(anchorTerm)
    // every NON-anchor slot gets its own membership check — by SLOT, not
    // term: a phrase repeating the anchor term ("join x join") must still
    // verify the repeat's position
    val others: Array[(PostingsView, Int)] = tokens.zipWithIndex
      .filter(_._2 != anchorSlot)
      .map { case (t, slot) => (views(t), slot) }

    // per-candidate work buffers hoisted out of the per-posting loop (a
    // common-term phrase otherwise allocates once per posting)
    val hits = new Array[(Int, Int)](others.length)
    val posBySlot = new Array[Array[Int]](n)

    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var bi = 0
    while (bi < anchor.ids.length) {
      val idArr = anchor.ids(bi)
      var i = 0
      while (i < idArr.length) {
        val d = idArr(i)
        if (d >= lo && d < hi) {
          // phase 1: conjunctive membership of EVERY non-anchor slot's term
          // — ids only; no slot's positions are decoded until the whole
          // membership test passes (decoding on a partial pass would pay
          // full-block position decodes for docs a later slot rejects)
          var ok = true
          var oi = 0
          while (ok && oi < others.length) {
            val h = others(oi)._1.find(d)
            if (h == null) ok = false else hits(oi) = h
            oi += 1
          }
          // phase 2: greedy chain walk from each slot-0 start. Greedy
          // smallest-next minimizes the chain's final position, so it finds
          // a chain within the span budget iff one exists — exact for the
          // pinned semantics at every slop, and for slop = 0 the budget
          // forces p(i) = p0 + i (exact adjacency).
          if (ok) {
            posBySlot(anchorSlot) = anchor.positionsOf(bi, i)
            oi = 0
            while (oi < others.length) {
              posBySlot(others(oi)._2) = others(oi)._1.positionsOf(hits(oi)._1, hits(oi)._2)
              oi += 1
            }
            val starts = posBySlot(0)
            var cnt = 0
            var pi = 0
            while (pi < starts.length) {
              val p0 = starts(pi)
              var prev = p0
              var alive = true
              var si = 1
              while (alive && si < n) {
                val arr = posBySlot(si)
                val j = upperBound(arr, prev)
                // remaining slots each need one more strict increment, so a
                // pick past maxSpan - (n - 1 - si) can never finish in budget
                if (j == arr.length || arr(j) - p0 > maxSpan - (n - 1 - si)) alive = false
                else prev = arr(j)
                si += 1
              }
              if (alive) cnt += 1
              pi += 1
            }
            if (cnt > 0) out += ((d, cnt))
          }
        }
        i += 1
      }
      bi += 1
    }
    out.toArray
  }
}
