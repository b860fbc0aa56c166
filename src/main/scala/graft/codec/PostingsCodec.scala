package graft.codec

import scala.collection.mutable.ArrayBuilder

/** Delta + variable-byte / frame-of-reference postings codec, 128-document
  * blocks (SURVEY.md §2.3 B5; gate: decode∘encode = id under scalacheck,
  * BASELINE.json:6).
  *
  * Reference analog: Lucene's block postings format (docID deltas bit-packed
  * in blocks of 128 with a VInt tail). Each encoded payload is
  * `[tag][body]`: tag 0 = unsigned VByte (LEB128) per value, tag 1 = FOR
  * (frame-of-reference) fixed-width bit packing `[width][packed]` — the
  * PForDelta family member without exception patching, which keeps decode
  * branch-free and the choice deterministic: the encoder picks whichever
  * body is smaller (ties -> VByte). Empty/singleton payloads encode to zero
  * bytes.
  *
  * Layout per block row (columns of the `postings` table, FIXTURES.md §4):
  *  - docDeltas: codec of gaps `docId(i) - docId(i-1) - 1` for i in
  *    [1, count); docId(0) == firstDocId is implicit (not encoded).
  *  - tfs: codec of `tf(i) - 1` (tf >= 1 always); dls likewise `dl(i) - 1`.
  */
object PostingsCodec extends Serializable {
  val BlockSize = 128

  private val TagVByte: Byte = 0
  private val TagFor: Byte = 1

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

  // ---- dual-format value-array codec ------------------------------------

  /** Encode non-negative values: [tag][body], empty for empty input. */
  def encodeValues(values: Array[Long]): Array[Byte] = {
    if (values.isEmpty) return Array.emptyByteArray
    var max = 0L
    var i = 0
    while (i < values.length) {
      require(values(i) >= 0, s"negative value ${values(i)}")
      if (values(i) > max) max = values(i)
      i += 1
    }
    val width = 64 - java.lang.Long.numberOfLeadingZeros(max | 1L)
    val forSize = 1 + (values.length * width + 7) / 8

    val vb = ArrayBuilder.make[Byte]
    vb.sizeHint(values.length * 2 + 1)
    vb += TagVByte
    i = 0
    while (i < values.length) { writeVLong(vb, values(i)); i += 1 }
    val vbBytes = vb.result()

    if (vbBytes.length - 1 <= forSize) vbBytes
    else {
      val out = new Array[Byte](1 + forSize)
      out(0) = TagFor
      out(1) = width.toByte
      var bitPos = 0
      i = 0
      while (i < values.length) {
        val v = values(i)
        var b = 0
        while (b < width) {
          if (((v >>> b) & 1L) != 0L) {
            val abs = bitPos + b
            out(2 + (abs >> 3)) = (out(2 + (abs >> 3)) | (1 << (abs & 7))).toByte
          }
          b += 1
        }
        bitPos += width
        i += 1
      }
      out
    }
  }

  def decodeValues(count: Int, bytes: Array[Byte]): Array[Long] = {
    val values = new Array[Long](count)
    if (count == 0) return values
    bytes(0) match {
      case TagVByte =>
        var p = 1
        var i = 0
        while (i < count) {
          val (v, np) = readVLong(bytes, p)
          values(i) = v
          p = np
          i += 1
        }
      case TagFor =>
        val width = bytes(1).toInt & 0xff
        var bitPos = 0
        var i = 0
        while (i < count) {
          var v = 0L
          var b = 0
          while (b < width) {
            val abs = bitPos + b
            if (((bytes(2 + (abs >> 3)) >> (abs & 7)) & 1) != 0) v |= (1L << b)
            b += 1
          }
          values(i) = v
          bitPos += width
          i += 1
        }
      case t => throw new IllegalArgumentException(s"unknown codec tag $t")
    }
    values
  }

  // ---- Block encode/decode ----------------------------------------------

  /** Encode the docId gaps of one block. `docIds` must be strictly
    * increasing; docIds(0) is NOT encoded (stored as firstDocId).
    */
  def encodeDocIds(docIds: Array[Long]): Array[Byte] = {
    if (docIds.length <= 1) return Array.emptyByteArray
    val gaps = new Array[Long](docIds.length - 1)
    var i = 1
    while (i < docIds.length) {
      val gap = docIds(i) - docIds(i - 1)
      require(gap > 0, s"docIds must be strictly increasing (gap=$gap at $i)")
      gaps(i - 1) = gap - 1
      i += 1
    }
    encodeValues(gaps)
  }

  def decodeDocIds(firstDocId: Long, count: Int, bytes: Array[Byte]): Array[Long] = {
    val ids = new Array[Long](count)
    if (count == 0) return ids
    ids(0) = firstDocId
    if (count == 1) return ids
    val gaps = decodeValues(count - 1, bytes)
    var i = 1
    while (i < count) {
      ids(i) = ids(i - 1) + gaps(i - 1) + 1
      i += 1
    }
    ids
  }

  /** Encode term frequencies (each >= 1) as codec of tf-1. */
  def encodeTfs(tfs: Array[Int]): Array[Byte] = {
    val v = new Array[Long](tfs.length)
    var i = 0
    while (i < tfs.length) {
      require(tfs(i) >= 1, s"tf must be >= 1, got ${tfs(i)}")
      v(i) = (tfs(i) - 1).toLong
      i += 1
    }
    encodeValues(v)
  }

  def decodeTfs(count: Int, bytes: Array[Byte]): Array[Int] = {
    val v = decodeValues(count, bytes)
    val tfs = new Array[Int](count)
    var i = 0
    while (i < count) { tfs(i) = v(i).toInt + 1; i += 1 }
    tfs
  }

  /** Document lengths alongside tfs (dl >= tf >= 1). */
  def encodeDls(dls: Array[Int]): Array[Byte] = encodeTfs(dls)

  def decodeDls(count: Int, bytes: Array[Byte]): Array[Int] = decodeTfs(count, bytes)

  // ---- Positions (v5) ----------------------------------------------------

  /** Encode one posting's term positions (strictly increasing, 0-based) as a
    * raw VByte stream: first position absolute, then successive gaps minus 1.
    * NO tag byte — per-posting streams are CONCATENATED into a block's `pos`
    * payload in docId order and split back by tf at decode (the analog of
    * Lucene's .pos file, except stored as a parquet column so queries that
    * don't select it never read it). The build normally produces this
    * encoding incrementally (CodeTokenizer.TfPosCounter); this form exists
    * for tests and tools.
    */
  def encodePositions(positions: Array[Int]): Array[Byte] = {
    val out = ArrayBuilder.make[Byte]
    var i = 0
    while (i < positions.length) {
      val v = if (i == 0) positions(0).toLong else (positions(i) - positions(i - 1) - 1).toLong
      writeVLong(out, v)
      i += 1
    }
    out.result()
  }

  /** Split a block's concatenated `pos` payload into per-posting position
    * arrays using the block's decoded tfs (posting i owns tfs(i) values).
    */
  def decodePositions(tfs: Array[Int], bytes: Array[Byte]): Array[Array[Int]] = {
    val out = new Array[Array[Int]](tfs.length)
    var p = 0
    var i = 0
    while (i < tfs.length) {
      val n = tfs(i)
      val ps = new Array[Int](n)
      var j = 0
      var last = -1
      while (j < n) {
        val (v, np) = readVLong(bytes, p)
        p = np
        last = if (j == 0) v.toInt else last + v.toInt + 1
        ps(j) = last
        j += 1
      }
      out(i) = ps
      i += 1
    }
    out
  }
}
