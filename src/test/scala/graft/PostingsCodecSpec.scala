package graft

import graft.codec.PostingsCodec
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Compression round-trip gate (BASELINE.json:6). */
class PostingsCodecSpec extends AnyFunSuite with GenCheck {

  val sortedIds: Gen[Array[Long]] = for {
    n <- Gen.choose(1, 300)
    start <- Gen.choose(0L, 1L << 40)
    gaps <- Gen.listOfN(n - 1, Gen.frequency(
      8 -> Gen.choose(1L, 100L), 2 -> Gen.choose(1L, 1L << 33)))
  } yield gaps.scanLeft(start)(_ + _).toArray

  test("property: docId round-trip") {
    forAllG(sortedIds) { ids =>
      val bytes = PostingsCodec.encodeDocIds(ids)
      val back = PostingsCodec.decodeDocIds(ids(0), ids.length, bytes)
      assert(back.toSeq == ids.toSeq)
    }
  }

  test("property: tf round-trip") {
    forAllG(Gen.nonEmptyListOf(Gen.choose(1, 1 << 20))) { tfs =>
      val a = tfs.toArray
      assert(PostingsCodec.decodeTfs(a.length, PostingsCodec.encodeTfs(a)).toSeq == a.toSeq)
    }
  }

  test("property: dl round-trip") {
    forAllG(Gen.nonEmptyListOf(Gen.choose(1, 1 << 24))) { dls =>
      val a = dls.toArray
      assert(PostingsCodec.decodeDls(a.length, PostingsCodec.encodeDls(a)).toSeq == a.toSeq)
    }
  }

  test("singleton block encodes to zero delta bytes") {
    assert(PostingsCodec.encodeDocIds(Array(42L)).isEmpty)
    assert(PostingsCodec.decodeDocIds(42L, 1, Array.empty).toSeq == Seq(42L))
  }

  test("dense gaps bit-pack: 128 consecutive docIds fit in 18 bytes") {
    val ids = Array.tabulate(128)(i => 1000L + i)
    val bytes = PostingsCodec.encodeDocIds(ids)
    assert(bytes.length <= 18, s"FOR should pack gap-1=0 at width 1: ${bytes.length}")
    assert(PostingsCodec.decodeDocIds(1000L, 128, bytes).toSeq == ids.toSeq)
  }

  test("codec picks the smaller format and both round-trip") {
    val dense = Array.tabulate(100)(_.toLong)          // FOR wins
    val sparse = Array.tabulate(100)(i => if (i == 50) 1L << 40 else i.toLong) // one huge value
    for (v <- Seq(dense, sparse)) {
      val bytes = PostingsCodec.encodeValues(v)
      assert(PostingsCodec.decodeValues(v.length, bytes).toSeq == v.toSeq)
    }
    assert(PostingsCodec.encodeValues(dense)(0) == 1.toByte)  // FOR tag
  }

  test("max-delta edge (full Long range)") {
    val ids = Array(0L, Long.MaxValue)
    val bytes = PostingsCodec.encodeDocIds(ids)
    assert(PostingsCodec.decodeDocIds(0L, 2, bytes).toSeq == ids.toSeq)
  }

  test("non-increasing ids rejected") {
    intercept[IllegalArgumentException](PostingsCodec.encodeDocIds(Array(5L, 5L)))
    intercept[IllegalArgumentException](PostingsCodec.encodeDocIds(Array(5L, 4L)))
  }

  test("VLong round-trip at 7-bit boundaries") {
    for (v <- Seq(0L, 127L, 128L, 16383L, 16384L, Long.MaxValue)) {
      val out = scala.collection.mutable.ArrayBuilder.make[Byte]
      PostingsCodec.writeVLong(out, v)
      assert(PostingsCodec.readVLong(out.result(), 0)._1 == v)
    }
  }
}
