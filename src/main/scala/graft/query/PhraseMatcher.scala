package graft.query

import graft.index.PostingBlock

/** Positional phrase matching over one docId-range bucket (SURVEY.md §2.3
  * B15; ES `match_phrase` / Lucene PhraseQuery, exact positions, no slop).
  *
  * Shape: conjunctive docId intersection FIRST (decoded id arrays only),
  * position verification SECOND — and a block's `pos` payload is decoded
  * lazily, only when some candidate doc inside that block survives the
  * intersection. A phrase over one rare + one common term therefore decodes
  * the common term's positions for only the handful of blocks containing
  * candidates, which is the property that makes phrase queries affordable
  * at corpus scale (the same economics as Lucene: .doc is read list-wide,
  * .pos only at verified candidates).
  */
object PhraseMatcher {
  @inline private def contains(a: Array[Int], v: Int): Boolean =
    java.util.Arrays.binarySearch(a, v) >= 0

  /** Match the analyzed phrase `tokens` (order and duplicates preserved)
    * against this bucket's blocks; returns (docId, phraseTf) for every doc
    * in [lo, hi) where the tokens occur at consecutive positions, with
    * phraseTf = the number of such occurrences. `termBlocks` must cover
    * every distinct token (callers return early on any absent term — a
    * conjunctive query with a df=0 term matches nothing) with blocks sorted
    * by firstDocId.
    */
  def matchBucket(termBlocks: Map[String, Array[PostingBlock]], tokens: Array[String],
      lo: Long, hi: Long): Array[(Long, Int)] = {
    val distinct = tokens.distinct
    val views = distinct.map(t => t -> new PostingsView(termBlocks(t))).toMap
    // anchor the chain walk on the RAREST term in this bucket, offset back
    // to token slot 0: fewest candidate docs AND fewest start positions
    val anchorTerm = distinct.minBy(t => views(t).total)
    val anchorSlot = tokens.indexOf(anchorTerm)
    val anchor = views(anchorTerm)
    // every NON-anchor slot gets its own check — filter by SLOT, not term:
    // a phrase repeating the anchor term ("join x join") must still verify
    // the repeat's position
    val others: Array[(PostingsView, Int)] = tokens.zipWithIndex
      .filter(_._2 != anchorSlot)
      .map { case (t, slot) => (views(t), slot - anchorSlot) }

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
          val hits = new Array[(Int, Int)](others.length)
          while (ok && oi < others.length) {
            val h = others(oi)._1.find(d)
            if (h == null) ok = false else hits(oi) = h
            oi += 1
          }
          // phase 2: position-chain verify anchored on the rare term
          if (ok) {
            val slots = new Array[Array[Int]](others.length)
            oi = 0
            while (oi < others.length) {
              slots(oi) = others(oi)._1.positionsOf(hits(oi)._1, hits(oi)._2)
              oi += 1
            }
            val base = anchor.positionsOf(bi, i)
            var cnt = 0
            var pi = 0
            while (pi < base.length) {
              if (base(pi) >= anchorSlot) { // phrase start can't be negative
                var all = true
                var oj = 0
                while (all && oj < others.length) {
                  if (!contains(slots(oj), base(pi) + others(oj)._2)) all = false
                  oj += 1
                }
                if (all) cnt += 1
              }
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
