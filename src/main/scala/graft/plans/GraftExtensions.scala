package graft.plans

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Library-grade registration of graft's Catalyst expressions via the
  * public extensions hook (SURVEY.md §4.3): a user adopts the whole scalar
  * surface with
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions())`) and
  * `canon_url` / `phash64` / `host_of` / ... resolve in plain
  * `spark.sql(...)` with no imports and no driver-side setup call. The
  * injected builders are the SAME table the runtime path
  * (GraftFunctions.ensureRegistered) uses, so the two routes can never
  * drift. No custom Rule/Strategy is injected — SURVEY.md §4.3.3 records
  * that decision: every graft operator has a stock logical form, so the
  * extension surface is functions only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getCanonicalName, name),
        builder))
    }
  }
}
