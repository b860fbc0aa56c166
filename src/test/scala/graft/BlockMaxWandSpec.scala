package graft

import graft.codec.PostingsCodec
import graft.index.PostingBlock
import graft.query.{BlockMaxWand, Bm25, Bm25Params, SearchHit, TopKHeap}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Unit gate for the BMW scorer: exact equivalence with a brute-force scorer
  * over randomized synthetic postings, plus evidence that block skipping
  * actually engages (BASELINE.md rule 4).
  */
class BlockMaxWandSpec extends AnyFunSuite {
  val p: Bm25Params = Bm25.Default
  val avgDl = 50.0

  def mkBlocks(term: String, postings: Seq[(Long, Int, Int)], blockSize: Int = 8): Array[PostingBlock] = {
    postings.sortBy(_._1).grouped(blockSize).zipWithIndex.map { case (grp, bi) =>
      val ids = grp.map(_._1).toArray
      val tfs = grp.map(_._2).toArray
      val dls = grp.map(_._3).toArray
      val maxTfn = grp.map(e => Bm25.tfNorm(e._2.toLong, e._3.toLong, avgDl, p)).max
      PostingBlock(term, bi.toLong, ids.head, ids.last, ids.length, tfs.map(_.toLong).sum,
        maxTfn, tfs.max, dls.min,
        PostingsCodec.encodeDocIds(ids), PostingsCodec.encodeTfs(tfs), PostingsCodec.encodeDls(dls),
        Array.emptyByteArray)
    }.toArray
  }

  def brute(termPostings: Map[String, Seq[(Long, Int, Int)]], idf: Map[String, Double],
      lo: Long, hi: Long, k: Int): Array[SearchHit] = {
    val perDoc = mutable.HashMap.empty[Long, Double]
    for (t <- termPostings.keys.toSeq.sorted; (d, tf, dl) <- termPostings(t); if d >= lo && d < hi)
      perDoc.update(d, perDoc.getOrElse(d, 0.0) + idf(t) * Bm25.tfNorm(tf.toLong, dl.toLong, avgDl, p))
    perDoc.toArray.map { case (d, s) => SearchHit(d, s) }
      .sortBy(h => (-h.score, h.docId)).take(k)
  }

  def metaOf(termPostings: Map[String, Seq[(Long, Int, Int)]], idf: Map[String, Double],
      blocks: Map[String, Array[PostingBlock]]): Map[String, BlockMaxWand.TermMeta] =
    termPostings.keys.map { t =>
      t -> BlockMaxWand.TermMeta(t, idf(t), idf(t) * blocks(t).map(_.blockMaxTfn).max)
    }.toMap

  test("randomized: BMW == brute force, all k, with masking") {
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 40) {
      val nTerms = 1 + rng.nextInt(4)
      val termPostings: Map[String, Seq[(Long, Int, Int)]] = (0 until nTerms).map { ti =>
        val n = 1 + rng.nextInt(60)
        val ids = mutable.SortedSet.empty[Long]
        while (ids.size < n) ids += rng.nextInt(500).toLong
        s"t$ti" -> ids.toSeq.map(d => (d, 1 + rng.nextInt(5), 10 + rng.nextInt(90)))
      }.toMap
      val idf = termPostings.keys.map(t => t -> (0.5 + rng.nextDouble() * 5)).toMap
      val blocks = termPostings.map { case (t, ps) => t -> mkBlocks(t, ps, 1 + rng.nextInt(12)) }
      val (lo, hi) = if (rng.nextBoolean()) (0L, 500L) else (100L, 380L)
      for (k <- Seq(1, 3, 10, 1000)) {
        val meta = metaOf(termPostings, idf, blocks)
        val got = BlockMaxWand.scoreBucket(blocks, meta, lo, hi, k, avgDl, p)
        val want = brute(termPostings, idf, lo, hi, k)
        assert(got.map(_.docId).toSeq == want.map(_.docId).toSeq,
          s"trial=$trial k=$k lo=$lo hi=$hi: ${got.toSeq} vs ${want.toSeq}")
        got.zip(want).foreach { case (g, w) => assert(math.abs(g.score - w.score) <= 1e-12) }
      }
    }
  }

  test("block skipping engages on skewed impact distribution") {
    // common term: many low-impact blocks; rare term: one high-impact doc.
    val common = (0L until 2048L).map(d => (d, 1, 100)) // low tf, long docs
    val rare = Seq((1000L, 10, 10))                     // huge impact
    val termPostings = Map("common" -> common, "rare" -> rare)
    val idf = Map("common" -> 0.1, "rare" -> 8.0)
    val blocks = termPostings.map { case (t, ps) => t -> mkBlocks(t, ps, 128) }
    val meta = metaOf(termPostings, idf, blocks)
    val st = BlockMaxWand.BucketStats()
    val got = BlockMaxWand.scoreBucket(blocks, meta, 0L, 4096L, 1, avgDl, p, st)
    val want = brute(termPostings, idf, 0L, 4096L, 1)
    assert(got.map(_.docId).toSeq == want.map(_.docId).toSeq)
    assert(got.head.docId == 1000L)
    assert(st.scoredDocs < 2048, s"WAND should not score every doc (scored=${st.scoredDocs})")
  }

  test("TopKHeap tie-break: score desc then docId asc") {
    val h = new TopKHeap(3)
    h.offer(5L, 1.0); h.offer(1L, 1.0); h.offer(9L, 2.0); h.offer(3L, 1.0); h.offer(2L, 1.0)
    assert(h.results.toSeq == Seq(SearchHit(9L, 2.0), SearchHit(1L, 1.0), SearchHit(2L, 1.0)))
  }

  test("empty bucket and k=0 behave") {
    val got = BlockMaxWand.scoreBucket(Map.empty, Map.empty, 0, 100, 10, avgDl, p)
    assert(got.isEmpty)
  }
}
