package graft.query

import graft.index.PostingBlock

/** ES `bool` query over one docId-range bucket (SURVEY.md §2.3 B16; Lucene
  * BooleanQuery): MUST terms are a conjunction (every one required), SHOULD
  * terms contribute score when present, MUST_NOT terms exclude. Score =
  * Σ idf·tfNorm over the (must ∪ should) terms present in the doc, summed
  * in ascending term order (the pinned order).
  *
  * Shape: the conjunction DRIVES — candidates are walked off the bucket's
  * rarest must term and every other clause is a binary find against its
  * decoded id arrays; tf/dl payloads decode lazily per block only for docs
  * that survive must + must_not filtering (PostingsView), and the handles
  * located during the must-membership pass are REUSED by the scoring loop
  * (no second binary search per must term). With no must clause the
  * candidate stream is the deduplicated merge of the should terms' ids
  * (ES `minimum_should_match = 1` default for a should-only bool), built
  * as one primitive long-array sort — no boxing.
  */
object BoolMatcher {

  /** ES `minimum_should_match` SPEC resolution (pinned v1 subset of the
    * parameter syntax): a plain non-negative integer (`"3"`), or a positive
    * percentage (`"75%"`) resolved as floor(n · pct / 100) — ES documents
    * that percentages "round down". Out of the v1 grammar (each rejected
    * LOUDLY rather than mis-parsed): negative forms (`-2`, `-25%` — count
    * FROM the clause total), conditional combinations (`3<90%`), and
    * multiple space-separated conditions. The resolved floor feeds the
    * SAME msm executors (searchBool / searchBoolDf) an integer floor
    * always did — resolution is pure arithmetic, no new query semantics.
    */
  def resolveMinShould(spec: String, nOptional: Int): Int = {
    require(nOptional >= 0, s"optional clause count must be >= 0, got $nOptional")
    val s = spec.trim
    val pct = """(\d{1,3})%""".r
    val int = """(\d+)""".r
    s match {
      case pct(v) =>
        val p = v.toInt
        require(p <= 100, s"minimum_should_match percentage > 100%: '$spec'")
        nOptional * p / 100 // integer floor — ES rounds percentages down
      case int(v) => v.toInt
      case _ => throw new IllegalArgumentException(
        s"minimum_should_match spec '$spec' outside the pinned v1 grammar (integer or 'N%')")
    }
  }
  /** Bucket-local top-k. `scoring` = (term, idf) for must ∪ should terms,
    * ASCENDING term order; `mustT`/`notT` are distinct term lists; every
    * term's blocks (sorted by firstDocId) that exist in this bucket are in
    * `termBlocks` — absent terms simply have no entry (a must term absent
    * from the bucket yields zero candidates; callers short-circuit the
    * whole query when a must term is absent from every segment).
    */
  def scoreBucket(termBlocks: Map[String, Array[PostingBlock]],
      scoring: Array[(String, Double)], mustT: Array[String], notT: Array[String],
      lo: Long, hi: Long, k: Int, avgDl: Double, p: Bm25Params,
      minShould: Int = 0, filterT: Array[String] = Array.empty,
      dlLo: Long = 0L, dlHi: Long = Long.MaxValue): Array[SearchHit] = {
    val views = scala.collection.mutable.HashMap.empty[String, PostingsView]
    def viewOf(t: String): PostingsView =
      views.getOrElseUpdate(t, new PostingsView(termBlocks.getOrElse(t, Array.empty)))

    // ES `filter` context: required like must, contributes NO score. The
    // conjunction walk below treats (must ∪ filter) uniformly — a filter
    // term may even be the rarest driver (filters are often the most
    // selective clause) — but only must terms have scoring slots.
    val conjT: Array[String] = (mustT ++ filterT).distinct
    val mustViews = conjT.map(viewOf)
    if (conjT.nonEmpty && mustViews.exists(_.blocks.isEmpty)) return Array.empty
    val notViews = notT.map(viewOf)
    val scoringViews: Array[(String, Double, PostingsView)] =
      scoring.map { case (t, idf) => (t, idf, viewOf(t)) }
    val scoringIdx: Map[String, Int] = scoring.iterator.map(_._1).zipWithIndex.toMap
    // minimum_should_match: count DISTINCT should terms present per doc
    // (should = scoring minus must) during the same handle walk scoring
    // already performs — zero extra searches
    val isShould: Array[Boolean] = scoring.map { case (t, _) => !mustT.contains(t) }

    val heap = new TopKHeap(k)
    // per-candidate handle slots aligned with scoringViews: the must pass
    // deposits what it finds so scoring never re-searches a must term
    val pre = new Array[(Int, Int)](scoringViews.length)
    // ES numeric-range filter context over the doc-length doc value: dl
    // rides in EVERY posting's payload (the tfNorm input), so the range is
    // a per-candidate comparison against an already-decoded value — zero
    // extra reads. Inactive (the default bounds) costs one branch.
    val rangeActive = dlLo > 0L || dlHi < Long.MaxValue
    @inline def inRange(dl: Long): Boolean = dl >= dlLo && dl < dlHi

    @inline def excluded(d: Long): Boolean = {
      var i = 0
      while (i < notViews.length) {
        if (notViews(i).find(d) != null) return true
        i += 1
      }
      false
    }

    /** `dlKnown` >= 0 = the candidate's dl, already read by the caller (the
      * conjunction driver's handle); -1 = derive from the first present
      * scoring handle (the should-only branch — every candidate there came
      * from some scoring view, so one always exists).
      */
    @inline def scoreDoc(d: Long, dlKnown: Long): Unit = {
      if (!excluded(d)) {
        var dl = dlKnown
        var s = 0.0
        var shouldHits = 0
        var i = 0
        while (i < scoringViews.length) {
          val v = scoringViews(i)._3
          val h = if (pre(i) != null) pre(i) else v.find(d)
          if (h != null) {
            if (dl < 0L) dl = v.dlAt(h._1, h._2).toLong
            s += scoringViews(i)._2 *
              Bm25.tfNorm(v.tfAt(h._1, h._2).toLong, v.dlAt(h._1, h._2).toLong, avgDl, p)
            if (isShould(i)) shouldHits += 1
          }
          i += 1
        }
        if (shouldHits >= minShould && (!rangeActive || inRange(dl))) heap.offer(d, s)
      }
    }

    if (conjT.nonEmpty) {
      // conjunction drives: walk the rarest required term's candidates
      // (must OR filter), check the other required terms before any payload
      // decode. Slot -1 = a pure-filter term with no scoring contribution.
      val driverIdx = conjT.indices.minBy(j => mustViews(j).total)
      val driver = mustViews(driverIdx)
      val driverSlot = scoringIdx.getOrElse(conjT(driverIdx), -1)
      val otherMusts: Array[(PostingsView, Int)] = conjT.indices
        .filter(_ != driverIdx).map(j => (mustViews(j), scoringIdx.getOrElse(conjT(j), -1))).toArray
      // handles parked here during membership; pre is written only AFTER
      // the conjunction passes — a rejected candidate (the common case for
      // selective musts) pays exactly its failed binary searches, not an
      // O(|scoring|) slot clear
      val mustHandles = new Array[(Int, Int)](otherMusts.length)
      var bi = 0
      while (bi < driver.ids.length) {
        val arr = driver.ids(bi)
        var i = 0
        while (i < arr.length) {
          val d = arr(i)
          if (d >= lo && d < hi) {
            var ok = true
            var m = 0
            while (ok && m < otherMusts.length) {
              val h = otherMusts(m)._1.find(d)
              if (h == null) ok = false else mustHandles(m) = h
              m += 1
            }
            if (ok) {
              // range check BEFORE any payload-scoring work: the driver
              // handle's dl is the candidate's dl (every term agrees)
              val dlc = if (rangeActive) driver.dlAt(bi, i).toLong else -1L
              if (!rangeActive || inRange(dlc)) {
                java.util.Arrays.fill(pre.asInstanceOf[Array[AnyRef]], null)
                if (driverSlot >= 0) pre(driverSlot) = (bi, i)
                m = 0
                while (m < otherMusts.length) {
                  if (otherMusts(m)._2 >= 0) pre(otherMusts(m)._2) = mustHandles(m)
                  m += 1
                }
                scoreDoc(d, dlc)
              }
            }
          }
          i += 1
        }
        bi += 1
      }
    } else {
      // should-only (+ exclusions): candidates = dedup of all should ids —
      // one primitive collect + sort + adjacent-dup skip, zero boxing
      val ab = new scala.collection.mutable.ArrayBuilder.ofLong
      scoringViews.foreach { case (_, _, v) =>
        var bi = 0
        while (bi < v.ids.length) {
          val arr = v.ids(bi)
          var i = 0
          while (i < arr.length) {
            val d = arr(i)
            if (d >= lo && d < hi) ab += d
            i += 1
          }
          bi += 1
        }
      }
      val cand = ab.result()
      java.util.Arrays.sort(cand)
      var i = 0
      while (i < cand.length) {
        if (i == 0 || cand(i) != cand(i - 1)) scoreDoc(cand(i), -1L)
        i += 1
      }
    }
    heap.results
  }
}
