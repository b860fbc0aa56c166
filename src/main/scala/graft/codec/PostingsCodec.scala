package graft.codec

import scala.collection.mutable.ArrayBuilder

/** Delta + variable-byte postings codec, 128-document blocks
  * (SURVEY.md §2.3 B5; gate: decode∘encode = id under scalacheck,
  * BASELINE.json:6).
  *
  * Reference analog: Lucene's block postings format (docID deltas bit-packed
  * in blocks of 128 with a VInt tail). We use unsigned VByte (LEB128-style,
  * little-endian 7-bit groups, high bit = continuation) uniformly — simpler
  * than PForDelta, still ~1–2 bytes per gap for dense postings, and each
  * block row carries `firstDocId`/`lastDocId`/`count` so a block can be
  * skipped (Block-Max WAND) without touching the binary payload at all.
  *
  * Layout per block row (columns of the `postings` table, FIXTURES.md §4):
  *  - docDeltas: VByte of gaps `docId(i) - docId(i-1)` for i in [1, count);
  *    docId(0) == firstDocId is implicit (not encoded).
  *  - tfs: VByte of `tf(i) - 1` for i in [0, count) (tf >= 1 always).
  */
object PostingsCodec extends Serializable {
  val BlockSize = 128

  // ---- VByte primitives ------------------------------------------------

  def writeVLong(out: ArrayBuilder[Byte], v0: Long): Unit = {
    require(v0 >= 0, s"VByte value must be non-negative, got $v0")
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    out += v.toByte
  }

  /** Reads one VLong starting at pos; returns (value, nextPos). */
  def readVLong(bytes: Array[Byte], pos: Int): (Long, Int) = {
    var p = pos
    var shift = 0
    var v = 0L
    var b = bytes(p)
    while ((b & 0x80) != 0) {
      v |= (b & 0x7fL) << shift
      shift += 7
      p += 1
      b = bytes(p)
    }
    v |= (b & 0x7fL) << shift
    (v, p + 1)
  }

  // ---- Block encode/decode ----------------------------------------------

  /** Encode the docId gaps of one block. `docIds` must be strictly
    * increasing; docIds(0) is NOT encoded (stored as firstDocId).
    */
  def encodeDocIds(docIds: Array[Long]): Array[Byte] = {
    val out = ArrayBuilder.make[Byte]
    out.sizeHint(docIds.length * 2)
    var i = 1
    while (i < docIds.length) {
      val gap = docIds(i) - docIds(i - 1)
      require(gap > 0, s"docIds must be strictly increasing (gap=$gap at $i)")
      writeVLong(out, gap)
      i += 1
    }
    out.result()
  }

  def decodeDocIds(firstDocId: Long, count: Int, bytes: Array[Byte]): Array[Long] = {
    val ids = new Array[Long](count)
    if (count == 0) return ids
    ids(0) = firstDocId
    var p = 0
    var i = 1
    while (i < count) {
      val (gap, np) = readVLong(bytes, p)
      ids(i) = ids(i - 1) + gap
      p = np
      i += 1
    }
    ids
  }

  /** Encode term frequencies (each >= 1) as VByte of tf-1. */
  def encodeTfs(tfs: Array[Int]): Array[Byte] = {
    val out = ArrayBuilder.make[Byte]
    out.sizeHint(tfs.length)
    var i = 0
    while (i < tfs.length) {
      require(tfs(i) >= 1, s"tf must be >= 1, got ${tfs(i)}")
      writeVLong(out, (tfs(i) - 1).toLong)
      i += 1
    }
    out.result()
  }

  def decodeTfs(count: Int, bytes: Array[Byte]): Array[Int] = {
    val tfs = new Array[Int](count)
    var p = 0
    var i = 0
    while (i < count) {
      val (v, np) = readVLong(bytes, p)
      tfs(i) = v.toInt + 1
      p = np
      i += 1
    }
    tfs
  }

  /** Encode document lengths alongside tfs (needed for BM25 tfNorm at decode
    * time when rescoring; dl >= tf >= 1).
    */
  def encodeDls(dls: Array[Int]): Array[Byte] = {
    val out = ArrayBuilder.make[Byte]
    out.sizeHint(dls.length)
    var i = 0
    while (i < dls.length) {
      require(dls(i) >= 1, s"dl must be >= 1, got ${dls(i)}")
      writeVLong(out, (dls(i) - 1).toLong)
      i += 1
    }
    out.result()
  }

  def decodeDls(count: Int, bytes: Array[Byte]): Array[Int] = decodeTfs(count, bytes)
}
