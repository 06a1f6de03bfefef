package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Frontier candidate row carried through the politeness top-K. */
final case class Cand(priority: Double, url_hash: Long, url_canon: String, path: String)

/** Bounded top-K selection per group as a typed Aggregator (the
  * priority-queue of the north_rule, made map-side combinable).
  *
  * Order: (priority desc, url_hash asc) — same total order as the window
  * scheduler and the CrawlOracle, so results are identical; selection is
  * order-insensitive, hence deterministic at any parallelism.
  *
  * Why this beats a window for scheduling: a window over (host) must
  * shuffle EVERY frontier row to its host partition before ranking; this
  * aggregator keeps at most k rows per host per map partition (partial
  * aggregation), so the shuffle carries min(rows, maps*hosts*k) — at
  * 10^10-URL scale with per-epoch budgets of ~100, that is orders of
  * magnitude less data movement, and the per-host merge cost is bounded
  * by maps*k regardless of how hot the host is (skew-immune by
  * construction).
  *
  * Buffer = array sorted by the order above; reduce does binary search +
  * bounded insert (O(log k) compares for rejected rows — the common case);
  * merge is a k-bounded sorted-array merge.
  */
class TopKAgg(k: Int) extends Aggregator[Cand, Array[Cand], Array[Cand]] {

  @inline private def better(a: Cand, b: Cand): Boolean =
    a.priority > b.priority || (a.priority == b.priority && a.url_hash < b.url_hash)

  override def zero: Array[Cand] = Array.empty

  override def reduce(buf: Array[Cand], row: Cand): Array[Cand] = {
    val n = buf.length
    if (n == k && !better(row, buf(n - 1))) return buf // common case: reject
    // binary search insertion point
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(buf(mid), row)) lo = mid + 1 else hi = mid
    }
    val outLen = math.min(n + 1, k)
    val out = new Array[Cand](outLen)
    System.arraycopy(buf, 0, out, 0, lo)
    if (lo < outLen) {
      out(lo) = row
      System.arraycopy(buf, lo, out, lo + 1, outLen - lo - 1)
    }
    out
  }

  override def merge(a: Array[Cand], b: Array[Cand]): Array[Cand] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Cand](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      out(o) =
        if (j >= b.length || (i < a.length && better(a(i), b(j)))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Cand]): Array[Cand] = buf
  override def bufferEncoder: Encoder[Array[Cand]] = ExpressionEncoder[Array[Cand]]()
  override def outputEncoder: Encoder[Array[Cand]] = ExpressionEncoder[Array[Cand]]()
}
