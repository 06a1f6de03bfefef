package graft.operators

import graft.SparkTestBase.spark
import graft.functions.ImageKit
import org.scalatest.funsuite.AnyFunSuite

/** c57 blur audit: distributed variance-of-Laplacian == kernel mirror
  * bit-exactly; planted blurred twins always score below their sources and
  * the default threshold separates them.
  */
class BlurSpec extends AnyFunSuite {

  test("distributed lap-var == kernel mirror; blurred twins separate") {
    val n = 60
    val rows = ImageOps.blurCorpus(spark, n).collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
    val audit = ImageOps.blurAudit(ImageOps.blurCorpus(spark, n)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(audit.size == rows.length)
    // mirror: same decode + kernel per image
    rows.foreach { case (id, bytes) =>
      val (px, w, h) = ImageKit.decodeGray(bytes)
      val want = ImageKit.lapVarQ100(px, w, h)
      assert(audit(id)._1 == want, s"lap_var($id)")
    }
    // every blurred twin scores strictly below its source, with margin
    val twins = audit.keys.filter(_.endsWith("-blur"))
    assert(twins.nonEmpty)
    twins.foreach { tid =>
      val sid = tid.stripSuffix("-blur")
      val (tv, tSharp) = audit(tid)
      val (sv, sSharp) = audit(sid)
      assert(tv * 2 < sv, s"blur twin $tid not attenuated: $tv vs $sv")
      assert(!tSharp, s"blurred $tid passed the sharpness gate ($tv)")
      assert(sSharp, s"sharp $sid failed the sharpness gate ($sv)")
    }
  }

  test("degenerate images are total") {
    assert(ImageKit.lapVarQ100(Array.emptyIntArray, 0, 0) == 0L)
    assert(ImageKit.lapVarQ100(Array.fill(4)(7), 2, 2) == 0L)
    // flat image: zero variance
    assert(ImageKit.lapVarQ100(Array.fill(9 * 9)(128), 9, 9) == 0L)
  }
}
