package graft.query

import graft.codec.PostingsCodec
import graft.index.PostingBlock

/** One term's postings inside one docId bucket, decoded on demand: docIds
  * eagerly (every caller intersects or merges on them), tf/dl/positions
  * lazily PER BLOCK, only when a candidate in that block survives whatever
  * filter runs first. Shared by the phrase path (PhraseMatcher — positions)
  * and the boolean path (BoolMatcher — tf/dl for scoring): both implement
  * the Lucene candidate-then-payload economics where .doc data is read
  * list-wide but per-occurrence payloads are touched only at candidates.
  *
  * `blocks` must be sorted by firstDocId and non-overlapping (guaranteed by
  * construction: salt buckets, slices, and segments all partition the docId
  * space monotonically).
  */
final class PostingsView(val blocks: Array[PostingBlock]) {
  val ids: Array[Array[Long]] = blocks.map(b =>
    PostingsCodec.decodeDocIds(b.firstDocId, b.count, b.docDeltas))
  val total: Long = blocks.map(_.count.toLong).sum

  private val tfsCache = new Array[Array[Int]](blocks.length)
  private val dlsCache = new Array[Array[Int]](blocks.length)
  private val posCache = new Array[Array[Array[Int]]](blocks.length)

  /** (blockIdx, idxInBlock) of docId d, or null if absent. */
  def find(d: Long): (Int, Int) = {
    var lo = 0
    var hi = blocks.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (blocks(mid).lastDocId < d) lo = mid + 1
      else if (blocks(mid).firstDocId > d) hi = mid - 1
      else {
        val a = ids(mid)
        val j = java.util.Arrays.binarySearch(a, d)
        return if (j >= 0) (mid, j) else null
      }
    }
    null
  }

  private def tfsOf(bi: Int): Array[Int] = {
    if (tfsCache(bi) == null)
      tfsCache(bi) = PostingsCodec.decodeTfs(blocks(bi).count, blocks(bi).tfs)
    tfsCache(bi)
  }

  def tfAt(bi: Int, idx: Int): Int = tfsOf(bi)(idx)

  def dlAt(bi: Int, idx: Int): Int = {
    if (dlsCache(bi) == null)
      dlsCache(bi) = PostingsCodec.decodeDls(blocks(bi).count, blocks(bi).dls)
    dlsCache(bi)(idx)
  }

  /** Positions of posting (bi, idx); decodes the whole block's pos payload
    * (and its tfs, needed for the split) on first touch.
    */
  def positionsOf(bi: Int, idx: Int): Array[Int] = {
    if (posCache(bi) == null)
      posCache(bi) = PostingsCodec.decodePositions(tfsOf(bi), blocks(bi).pos)
    posCache(bi)(idx)
  }
}
