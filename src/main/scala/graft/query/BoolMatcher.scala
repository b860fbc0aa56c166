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
  * that survive must + must_not filtering (PostingsView). With no must
  * clause the candidate stream is the merged union of the should terms'
  * ids (ES `minimum_should_match = 1` default for a should-only bool).
  */
object BoolMatcher {
  /** Bucket-local top-k. `scoring` = (term, idf) for must ∪ should terms,
    * ASCENDING term order; `mustT`/`notT` are distinct term lists; every
    * term's blocks (sorted by firstDocId) that exist in this bucket are in
    * `termBlocks` — absent terms simply have no entry (a must term absent
    * from the bucket yields zero candidates; callers short-circuit the
    * whole query when a must term is absent from every segment).
    */
  def scoreBucket(termBlocks: Map[String, Array[PostingBlock]],
      scoring: Array[(String, Double)], mustT: Array[String], notT: Array[String],
      lo: Long, hi: Long, k: Int, avgDl: Double, p: Bm25Params): Array[SearchHit] = {
    val views = scala.collection.mutable.HashMap.empty[String, PostingsView]
    def viewOf(t: String): PostingsView =
      views.getOrElseUpdate(t, new PostingsView(termBlocks.getOrElse(t, Array.empty)))

    val mustViews = mustT.map(viewOf)
    if (mustT.nonEmpty && mustViews.exists(_.blocks.isEmpty)) return Array.empty
    val notViews = notT.map(viewOf)
    val scoringViews: Array[(String, Double, PostingsView)] =
      scoring.map { case (t, idf) => (t, idf, viewOf(t)) }

    val heap = new TopKHeap(k)

    @inline def excluded(d: Long): Boolean = {
      var i = 0
      while (i < notViews.length) {
        if (notViews(i).find(d) != null) return true
        i += 1
      }
      false
    }

    @inline def scoreDoc(d: Long): Unit = {
      if (!excluded(d)) {
        var s = 0.0
        var i = 0
        while (i < scoringViews.length) {
          val v = scoringViews(i)._3
          val h = v.find(d)
          if (h != null)
            s += scoringViews(i)._2 *
              Bm25.tfNorm(v.tfAt(h._1, h._2).toLong, v.dlAt(h._1, h._2).toLong, avgDl, p)
          i += 1
        }
        heap.offer(d, s)
      }
    }

    if (mustT.nonEmpty) {
      // conjunction drives: walk the rarest must term's candidates, filter
      // by the other musts before any payload decode
      val driver = mustViews.minBy(_.total)
      val otherMusts = mustViews.filter(_ ne driver)
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
              if (otherMusts(m).find(d) == null) ok = false
              m += 1
            }
            if (ok) scoreDoc(d)
          }
          i += 1
        }
        bi += 1
      }
    } else {
      // should-only: candidates = union of should ids (each doc visited
      // once — dedup via ascending merge over the per-term id streams)
      val seen = new java.util.TreeSet[java.lang.Long]()
      scoringViews.foreach { case (_, _, v) =>
        var bi = 0
        while (bi < v.ids.length) {
          val arr = v.ids(bi)
          var i = 0
          while (i < arr.length) {
            val d = arr(i)
            if (d >= lo && d < hi) seen.add(d)
            i += 1
          }
          bi += 1
        }
      }
      val it = seen.iterator()
      while (it.hasNext) scoreDoc(it.next())
    }
    heap.results
  }
}
