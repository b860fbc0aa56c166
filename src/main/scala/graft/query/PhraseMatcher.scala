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

  /** Sorted-distinct union of several already-sorted int arrays (per-term
    * position lists are disjoint — one token per position — so this is a
    * plain merge; implemented as concat+sort for the small per-candidate
    * arrays it sees).
    */
  private def mergeSorted(arrays: Array[Array[Int]]): Array[Int] = {
    if (arrays.length == 1) return arrays(0)
    val out = new Array[Int](arrays.map(_.length).sum)
    var o = 0
    var i = 0
    while (i < arrays.length) {
      System.arraycopy(arrays(i), 0, out, o, arrays(i).length)
      o += arrays(i).length
      i += 1
    }
    java.util.Arrays.sort(out)
    out
  }

  /** Phrase matching where each SLOT accepts a set of alternative terms —
    * the machinery under `match_phrase_prefix` (last slot = the prefix's
    * dictionary expansion) and synonym-style phrase clauses. Semantics:
    * identical chain walk, with slot i's position list = the union of its
    * present alternatives' positions (token positions are unique per doc,
    * so the union stays strictly sorted and start-counting is unchanged).
    * A slot with NO present alternative in the doc (or the bucket) fails
    * the conjunction. Candidate generation anchors on the slot with the
    * fewest total postings across its alternatives.
    */
  def matchBucketAlts(termBlocks: Map[String, Array[PostingBlock]],
      slots: Array[Array[String]], lo: Long, hi: Long, slop: Int = 0): Array[(Long, Int)] = {
    require(slop >= 0, s"slop must be >= 0, got $slop")
    val n = slots.length
    val maxSpan = n - 1 + slop
    val distinct = slots.flatten.distinct.filter(termBlocks.contains)
    val views = distinct.map(t => t -> new PostingsView(termBlocks(t))).toMap
    val slotViews: Array[Array[PostingsView]] =
      slots.map(_.filter(termBlocks.contains).distinct.map(views))
    // a slot with no alternative present in this bucket kills the bucket
    if (slotViews.exists(_.isEmpty)) return Array.empty
    val anchorSlot = slotViews.indices.minBy(i => slotViews(i).map(_.total).sum)
    // candidate docIds = sorted distinct union over the anchor slot's
    // alternatives (each view's ids are sorted; LongStream dedups cheaply)
    val candIds: Array[Long] = {
      val all = slotViews(anchorSlot).flatMap(_.ids.iterator.flatten)
      java.util.Arrays.sort(all)
      var w = 0
      var r = 0
      while (r < all.length) {
        if (w == 0 || all(w - 1) != all(r)) { all(w) = all(r); w += 1 }
        r += 1
      }
      java.util.Arrays.copyOf(all, w)
    }
    val posBySlot = new Array[Array[Int]](n)
    val hitBuf = new Array[Array[Int]](slots.map(_.length).max)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var ci = 0
    while (ci < candIds.length) {
      val d = candIds(ci)
      if (d >= lo && d < hi) {
        // membership + positions per slot: union the present alternatives
        var ok = true
        var si = 0
        while (ok && si < n) {
          val alts = slotViews(si)
          var nHit = 0
          var ai = 0
          while (ai < alts.length) {
            val h = alts(ai).find(d)
            if (h != null) { hitBuf(nHit) = alts(ai).positionsOf(h._1, h._2); nHit += 1 }
            ai += 1
          }
          if (nHit == 0) ok = false
          else posBySlot(si) = mergeSorted(java.util.Arrays.copyOf(hitBuf, nHit))
          si += 1
        }
        if (ok) {
          val starts = posBySlot(0)
          var cnt = 0
          var pi = 0
          while (pi < starts.length) {
            val p0 = starts(pi)
            var prev = p0
            var alive = true
            var si2 = 1
            while (alive && si2 < n) {
              val arr = posBySlot(si2)
              val j = upperBound(arr, prev)
              if (j == arr.length || arr(j) - p0 > maxSpan - (n - 1 - si2)) alive = false
              else prev = arr(j)
              si2 += 1
            }
            if (alive) cnt += 1
            pi += 1
          }
          if (cnt > 0) out += ((d, cnt))
        }
      }
      ci += 1
    }
    out.toArray
  }

  /** Minimal covering gap of k sorted position lists (Lucene SpanNearQuery
    * unordered): the smallest `(max - min + 1) - k` over windows containing
    * one position from EVERY list — the classic k-pointer sweep (advance
    * the minimum head each step; every step's head set is a candidate
    * cover). Lists must be non-empty and sorted ascending.
    */
  def minCoverGap(lists: Array[Array[Int]]): Int = {
    val k = lists.length
    if (k == 1) return 0
    val idx = new Array[Int](k)
    var best = Int.MaxValue
    var done = false
    while (!done) {
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var mnList = -1
      var j = 0
      while (j < k) {
        val v = lists(j)(idx(j))
        if (v < mn) { mn = v; mnList = j }
        if (v > mx) mx = v
        j += 1
      }
      val gap = (mx - mn + 1) - k
      if (gap < best) best = gap
      idx(mnList) += 1
      if (idx(mnList) == lists(mnList).length) done = true
    }
    best
  }

  /** Unordered span-near over one bucket (ES/Lucene `span_near`
    * `in_order = false`): docs where every distinct term occurs with total
    * gap <= slop in SOME window; returns (docId, minGap). The ordered form
    * is the slop phrase above. Duplicate terms in `terms` are meaningless
    * for the unordered cover and must be pre-deduplicated by the caller.
    */
  def matchNearBucket(termBlocks: Map[String, Array[PostingBlock]],
      terms: Array[String], lo: Long, hi: Long, slop: Int): Array[(Long, Int)] = {
    require(slop >= 0, s"slop must be >= 0, got $slop")
    val views = terms.map(t => new PostingsView(termBlocks(t)))
    val anchorIdx = views.indices.minBy(i => views(i).total)
    val anchor = views(anchorIdx)
    val others = views.indices.filter(_ != anchorIdx).map(views).toArray
    val hits = new Array[(Int, Int)](others.length)
    val lists = new Array[Array[Int]](terms.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var bi = 0
    while (bi < anchor.ids.length) {
      val idArr = anchor.ids(bi)
      var i = 0
      while (i < idArr.length) {
        val d = idArr(i)
        if (d >= lo && d < hi) {
          var ok = true
          var oi = 0
          while (ok && oi < others.length) {
            val h = others(oi).find(d)
            if (h == null) ok = false else hits(oi) = h
            oi += 1
          }
          if (ok) {
            lists(0) = anchor.positionsOf(bi, i)
            oi = 0
            while (oi < others.length) {
              lists(oi + 1) = others(oi).positionsOf(hits(oi)._1, hits(oi)._2)
              oi += 1
            }
            val gap = minCoverGap(lists)
            if (gap <= slop) out += ((d, gap))
          }
        }
        i += 1
      }
      bi += 1
    }
    out.toArray
  }

  /** `span_near(span_multi(<expansion>), <other>)` over one bucket — the
    * multi clause's span set is the UNION of the expansion terms' width-1
    * occurrences (distinct terms never share a position, so the union is a
    * plain sorted merge), and the pair cover is the same k-pointer sweep as
    * [[matchNearBucket]] over (union, other). The OTHER term anchors the
    * walk — expansion views probe per CANDIDATE doc only, so a broad
    * expansion never decodes positions list-wide.
    */
  def spanMultiNearBucket(termBlocks: Map[String, Array[PostingBlock]],
      expansion: Array[String], other: String, lo: Long, hi: Long,
      slop: Int): Iterator[(Long, Int)] = {
    require(slop >= 0, s"slop must be >= 0, got $slop")
    if (!termBlocks.contains(other)) return Iterator.empty
    val expViews = expansion.flatMap(t => termBlocks.get(t).map(new PostingsView(_)))
    if (expViews.isEmpty) return Iterator.empty
    val anchor = new PostingsView(termBlocks(other))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var bi = 0
    while (bi < anchor.ids.length) {
      val idArr = anchor.ids(bi)
      var i = 0
      while (i < idArr.length) {
        val d = idArr(i)
        if (d >= lo && d < hi) {
          var union: Array[Int] = Array.emptyIntArray
          var vi = 0
          while (vi < expViews.length) {
            val h = expViews(vi).find(d)
            if (h != null) union = union ++ expViews(vi).positionsOf(h._1, h._2)
            vi += 1
          }
          if (union.nonEmpty) {
            java.util.Arrays.sort(union)
            val gap = minCoverGap(Array(union, anchor.positionsOf(bi, i)))
            if (gap <= slop) out += ((d, gap))
          }
        }
        i += 1
      }
      bi += 1
    }
    out.iterator
  }

  /** Match the analyzed phrase `tokens` (order and duplicates preserved)
    * against this bucket's blocks; returns (docId, phraseTf) for every doc
    * in [lo, hi) with at least one matching start under `slop`. `termBlocks`
    * must cover every distinct token (callers return early on any absent
    * term — a conjunctive query with a df=0 term matches nothing) with
    * blocks sorted by firstDocId.
    */
  /** Bigram adjacency DOCUMENT frequencies for a whole CANDIDATE-PAIR SET
    * in one bucket pass (the phrase suggester's corpus statistic): a doc
    * counts once for pair (l, r) iff some position p of l has p+1 in r.
    * Per pair the walk drives the LEFT view's postings and probes the
    * right — candidate sets are expansion-capped, so the loop is
    * O(pairs · left-postings-in-bucket) with position decodes cached
    * across pairs by the shared views.
    */
  def bigramDfBucket(termBlocks: Map[String, Array[PostingBlock]],
      pairs: Array[(String, String)], lo: Long, hi: Long): Iterator[((String, String), Long)] = {
    val views = scala.collection.mutable.HashMap.empty[String, PostingsView]
    def viewOf(t: String): Option[PostingsView] =
      termBlocks.get(t).map(bs => views.getOrElseUpdate(t, new PostingsView(bs)))
    val out = scala.collection.mutable.ArrayBuffer.empty[((String, String), Long)]
    var pi = 0
    while (pi < pairs.length) {
      val (l, r) = pairs(pi)
      (viewOf(l), viewOf(r)) match {
        case (Some(lv), Some(rv)) =>
          var cnt = 0L
          var bi = 0
          while (bi < lv.ids.length) {
            val idArr = lv.ids(bi)
            var i = 0
            while (i < idArr.length) {
              val d = idArr(i)
              if (d >= lo && d < hi) {
                val h = rv.find(d)
                if (h != null) {
                  val lp = lv.positionsOf(bi, i)
                  val rp = rv.positionsOf(h._1, h._2)
                  var a = 0
                  var b = 0
                  var hit = false
                  while (!hit && a < lp.length && b < rp.length) {
                    val want = lp(a) + 1
                    if (rp(b) == want) hit = true
                    else if (rp(b) < want) b += 1
                    else a += 1
                  }
                  if (hit) cnt += 1L
                }
              }
              i += 1
            }
            bi += 1
          }
          if (cnt > 0L) out += (((l, r), cnt))
        case _ =>
      }
      pi += 1
    }
    out.iterator
  }

  /** Lucene `SpanNotQuery` walk for one bucket: include-term occurrences
    * that have NO exclude-term occurrence within [p − pre, p + post]
    * (inclusive window). Drives the include view's postings; the exclude
    * view is probed per candidate doc only (a doc with no exclude
    * occurrence keeps every include position — the asymmetric economics of
    * span_not: the exclude side never gates the scan). Returns
    * (docId, surviving-span count), docs with zero survivors omitted.
    */
  def spanNotBucket(termBlocks: Map[String, Array[PostingBlock]], include: String,
      exclude: String, pre: Int, post: Int, lo: Long, hi: Long): Iterator[(Long, Int)] = {
    val ivOpt = termBlocks.get(include).map(new PostingsView(_))
    if (ivOpt.isEmpty) return Iterator.empty
    val iv = ivOpt.get
    val ev = termBlocks.get(exclude).map(new PostingsView(_))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var bi = 0
    while (bi < iv.ids.length) {
      val idArr = iv.ids(bi)
      var i = 0
      while (i < idArr.length) {
        val d = idArr(i)
        if (d >= lo && d < hi) {
          val ip = iv.positionsOf(bi, i)
          val h = ev.map(_.find(d)).orNull
          if (h == null) {
            out += ((d, ip.length)) // no exclude occurrences: all survive
          } else {
            val ep = ev.get.positionsOf(h._1, h._2)
            var cnt = 0
            var e = 0
            var pi = 0
            while (pi < ip.length) {
              val p = ip(pi)
              while (e < ep.length && ep(e) < p - pre) e += 1
              if (e >= ep.length || ep(e) > p + post) cnt += 1
              pi += 1
            }
            if (cnt > 0) out += ((d, cnt))
          }
        }
        i += 1
      }
      bi += 1
    }
    out.iterator
  }

  /** Lucene `SpanContainingQuery` / `SpanWithinQuery` walk for one bucket,
    * pinned v1 shapes: big = the unordered two-term near window over
    * (a, b) with gap ≤ slop (the [[matchNearBucket]] span definition for a
    * pair), little = a term span [p, p+1). Containment is positional:
    * window [s, e] holds p iff s ≤ p ≤ e.
    *   - containing (within = false): count of DISTINCT big windows
    *     holding ≥ 1 little occurrence — "big spans that contain little";
    *   - within (within = true): count of DISTINCT little occurrences
    *     inside ≥ 1 big window — the inverse query.
    * The walk drives a's postings; b and little are probed per candidate
    * doc only (the spanNot economics — the conjunction never decodes
    * positions for docs missing any side). Docs with zero survivors are
    * omitted; integer-exact, no float protocol.
    */
  def spanContainBucket(termBlocks: Map[String, Array[PostingBlock]],
      a: String, b: String, slop: Int, little: String,
      lo: Long, hi: Long, within: Boolean): Iterator[(Long, Int)] = {
    val avO = termBlocks.get(a).map(new PostingsView(_))
    val bvO = termBlocks.get(b).map(new PostingsView(_))
    val cvO = termBlocks.get(little).map(new PostingsView(_))
    if (avO.isEmpty || bvO.isEmpty || cvO.isEmpty) return Iterator.empty
    val (av, bv, cv) = (avO.get, bvO.get, cvO.get)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var bi = 0
    while (bi < av.ids.length) {
      val idArr = av.ids(bi)
      var i = 0
      while (i < idArr.length) {
        val d = idArr(i)
        if (d >= lo && d < hi) {
          val hb = bv.find(d)
          if (hb != null) {
            val hc = cv.find(d)
            if (hc != null) {
              val pa = av.positionsOf(bi, i)
              val pb = bv.positionsOf(hb._1, hb._2)
              val pc = cv.positionsOf(hc._1, hc._2)
              // distinct near windows of (a, b) at gap <= slop
              val wins = scala.collection.mutable.LinkedHashSet.empty[(Int, Int)]
              var x = 0
              while (x < pa.length) {
                var y = 0
                while (y < pb.length) {
                  val s = math.min(pa(x), pb(y))
                  val e = math.max(pa(x), pb(y))
                  if (e - s - 1 <= slop) wins += ((s, e))
                  y += 1
                }
                x += 1
              }
              var cnt = 0
              if (within) {
                var p = 0
                while (p < pc.length) {
                  if (wins.exists { case (s, e) => s <= pc(p) && pc(p) <= e }) cnt += 1
                  p += 1
                }
              } else {
                val it = wins.iterator
                while (it.hasNext) {
                  val (s, e) = it.next()
                  if (pc.exists(p => s <= p && p <= e)) cnt += 1
                }
              }
              if (cnt > 0) out += ((d, cnt))
            }
          }
        }
        i += 1
      }
      bi += 1
    }
    out.iterator
  }

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
