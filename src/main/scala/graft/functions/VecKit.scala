package graft.functions

/** Pure embedding-vector kernels shared by the codegen'd LshBucket
  * expression and the local test mirrors (same function on both sides, the
  * UrlKit pattern).
  */
object VecKit {

  /** Deterministic Rademacher hyperplane component for (plane, dim). */
  @inline def hyperplaneSign(plane: Int, d: Int): Double =
    if ((ImageKit.mix64(plane.toLong << 32 | (d.toLong & 0xffffffffL)) & 1L) == 0L) 1.0 else -1.0

  /** Sign-of-random-hyperplane bucket: bit p = sign(dot(vec, plane_p)). */
  def lshBucket(vec: Array[Float], nBits: Int): Int = {
    var bucket = 0
    var p = 0
    while (p < nBits) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) { dot += vec(d) * hyperplaneSign(p, d); d += 1 }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }
}
