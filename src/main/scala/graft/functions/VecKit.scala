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

  // ---- dot / sum-of-squares kernels (the cosineCol hot path) ----------
  // Bit-identical to the zip_with+aggregate Column-HOF forms they replace
  // (same per-element double casts, same left-to-right accumulation, same
  // null semantics: length mismatch or any null element -> null), but a
  // tight primitive loop — the interpreted per-element lambdas over
  // 768-dim vectors made score evaluation, not the join, the wall of
  // every brute/probe ANN query (the emb04 ivfAssign lesson, applied to
  // the shared scoring kernel).

  import org.apache.spark.sql.catalyst.util.ArrayData

  /** dot(a,b) with zip_with+aggregate parity; null = HOF's null. */
  def dotAny(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** sum(x_i^2) with aggregate parity (normCol = sqrt of this). */
  def sumSqAny(a: ArrayData, aFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x
      i += 1
    }
    s
  }

  // ---- product quantization (Jégou/Douze/Schmid, TPAMI 2011 — public) ----
  // Codebook layout: cents(j)(c) = sub-centroid c of subspace j, where
  // subspace j covers dims [j*subDim, (j+1)*subDim) (last one ragged).

  /** PQ-encode: per subspace, the L2-nearest sub-centroid's index (one
    * byte per subspace; first index wins ties — deterministic).
    */
  def pqEncode(vec: Seq[Float], cents: Array[Array[Array[Float]]]): Array[Byte] = {
    val v = vec.toArray
    val m = cents.length
    val out = new Array[Byte](m)
    var j = 0
    var off = 0
    while (j < m) {
      val cs = cents(j)
      val subDim = if (cs.nonEmpty) cs(0).length else 0
      var best = Double.MaxValue
      var bi = 0
      var c = 0
      while (c < cs.length) {
        val cc = cs(c)
        var dist = 0.0
        var d = 0
        while (d < subDim && off + d < v.length) {
          val t = v(off + d).toDouble - cc(d).toDouble
          dist += t * t
          d += 1
        }
        if (dist < best) { best = dist; bi = c }
        c += 1
      }
      out(j) = bi.toByte
      off += subDim
      j += 1
    }
    out
  }

  /** ADC lookup table for one query: table(j)(c) = dot(q_subspace_j,
    * centroid c of subspace j). The approximate dot(q, v) of an encoded
    * vector is then the sum of one lookup per subspace ([[pqAdcScore]]).
    */
  def pqAdcTable(q: Seq[Float], cents: Array[Array[Array[Float]]]): Array[Array[Double]] = {
    val qa = q.toArray
    val m = cents.length
    val table = new Array[Array[Double]](m)
    var j = 0
    var off = 0
    while (j < m) {
      val cs = cents(j)
      val subDim = if (cs.nonEmpty) cs(0).length else 0
      val row = new Array[Double](cs.length)
      var c = 0
      while (c < cs.length) {
        val cc = cs(c)
        var dot = 0.0
        var d = 0
        while (d < subDim && off + d < qa.length) {
          dot += qa(off + d).toDouble * cc(d).toDouble
          d += 1
        }
        row(c) = dot
        c += 1
      }
      table(j) = row
      off += subDim
      j += 1
    }
    table
  }

  def pqAdcScore(code: Array[Byte], table: Array[Array[Double]]): Double = {
    var s = 0.0
    var j = 0
    while (j < code.length && j < table.length) {
      s += table(j)(code(j) & 0xff)
      j += 1
    }
    s
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
