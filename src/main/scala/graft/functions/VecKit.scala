package graft.functions

/** Pure embedding-vector kernels shared by the codegen'd LshBucket
  * expression and the local test mirrors (same function on both sides, the
  * UrlKit pattern).
  */
object VecKit {

  /** Deterministic Rademacher hyperplane component for (plane, dim). */
  @inline def hyperplaneSign(plane: Int, d: Int): Double =
    if ((ImageKit.mix64(plane.toLong << 32 | (d.toLong & 0xffffffffL)) & 1L) == 0L) 1.0 else -1.0

  /** argmax_i dot(v, c_i)/||c_i|| with FIRST-index tie-break — the IVF
    * assignment kernel. Bit-identical to the Column-HOF form it replaced
    * (same per-element double casts, same left-to-right accumulation,
    * same first-occurrence argmax as array_position(scores,
    * array_max(scores))), but a tight primitive loop: the interpreted
    * per-element lambdas over k x d (e.g. 224 centroids x 768 dims PER
    * ROW at sf0.1) made assignment — not probing — the emb04 wall.
    */
  def ivfAssign(vec: Seq[Float], cents: Array[Array[Float]], centNorms: Array[Double]): Int = {
    val v = vec.toArray
    var best = Double.NegativeInfinity
    var bi = 0
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var dot = 0.0
      var d = 0
      val n = math.min(v.length, c.length)
      while (d < n) { dot += v(d).toDouble * c(d).toDouble; d += 1 }
      val s = dot / centNorms(i)
      if (s > best) { best = s; bi = i }
      i += 1
    }
    bi
  }

  /** ||c|| with the exact accumulation order of the Column normCol form. */
  def norm(c: Array[Float]): Double = {
    var s = 0.0
    var d = 0
    while (d < c.length) { s += c(d).toDouble * c(d).toDouble; d += 1 }
    math.sqrt(s)
  }

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
