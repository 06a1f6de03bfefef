package graft.functions

/** Content-defined chunking kernel (gear rolling hash — the FastCDC /
  * LBFS family: Xia et al., USENIX ATC'16; Muthitacharoen et al.,
  * SOSP'01). A 100 TB crawl archive stores many near-identical page
  * versions; fixed-size blocks lose all sharing after one insertion
  * (every later block shifts), while content-defined boundaries re-sync
  * a few bytes past the edit, so the unchanged tail deduplicates again.
  *
  * The gear hash is self-windowing: each step shifts the state left one
  * bit, so only the last ~64 bytes influence a boundary decision —
  * resetting the state at each cut keeps chunk identity a pure function
  * of chunk content.
  */
object ChunkKit {

  private val Gear: Array[Long] =
    Array.tabulate(256)(b => ImageKit.mix64(0xC0FFEE_5EEDL + b))

  /** Chunk (offset, length) spans covering `bytes` exactly: a boundary
    * is cut where the gear hash has `maskBits` trailing zero bits
    * (expected chunk ~2^maskBits past minLen), never before minLen,
    * always by maxLen.
    */
  def boundaries(bytes: Array[Byte], minLen: Int = 64, maskBits: Int = 8,
                 maxLen: Int = 1024): IndexedSeq[(Int, Int)] = {
    val mask = (1L << maskBits) - 1L
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        out += ((start, len))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length) out += ((start, bytes.length - start))
    out.toIndexedSeq
  }

  def md5hex(bytes: Array[Byte], off: Int, len: Int): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.update(bytes, off, len)
    d.digest().map("%02x".format(_)).mkString
  }
}
