package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Flag-gated exact->approximate rewrite (`Rule[LogicalPlan]`,
  * injected by [[graft.GraftExtensions]]): when
  * `spark.graft.approxRewrite=true`, unweighted exact `percentile`
  * aggregates become t-digest `approx_percentile` at the default
  * accuracy — the documented trade at 100 TB, where an exact
  * percentile buffers every value per group while the sketch is
  * fixed-size and merges map-side.
  *
  * Deliberately narrow: weighted percentiles (a frequency column —
  * the engine's single-shuffle cycle-stats core) and `reverse`
  * percentiles have no sketch equivalent and are left exact, and only
  * DOUBLE value columns rewrite — `Percentile` always returns DOUBLE
  * while `ApproximatePercentile` returns the CHILD's type, so an
  * integer-column rewrite would silently change the aggregate's
  * dataType mid-plan (the parent still reads it as double). The flag
  * defaults to OFF so every oracle-exact query stays bit-exact unless
  * a session opts in.
  */
class ApproxRewrite extends Rule[LogicalPlan] {

  private def unitFrequency(p: Percentile): Boolean = p.third match {
    case Literal(v: Long, _) => v == 1L
    case Literal(v: Int, _) => v == 1
    case _ => false
  }

  /** Tolerant flag parse: a malformed value (e.g. "1", "yes") leaves
    * the rewrite OFF instead of throwing from inside the optimizer —
    * which would fail EVERY query in the session, not just skip an
    * optional optimization. Tolerant must not mean SILENT, though: a
    * user who opts in with a truthy-but-not-"true" spelling would
    * otherwise get unrewritten plans with no signal, so the first
    * unrecognized value logs one warning (once per JVM, not once per
    * optimized plan).
    */
  private def enabled: Boolean = {
    val raw = conf.getConfString(ApproxRewrite.Flag, "false").trim
    val on = raw.equalsIgnoreCase("true")
    if (!on && !raw.isEmpty && !raw.equalsIgnoreCase("false") &&
        ApproxRewrite.warnedValue.compareAndSet(null, raw))
      logWarning(s"${ApproxRewrite.Flag}='$raw' is not 'true'/'false'; " +
        "treating it as OFF — set it to exactly 'true' to enable the rewrite")
    on
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformAllExpressions {
      case p: Percentile
          if unitFrequency(p) && !p.reverse && p.first.dataType == DoubleType =>
        new ApproximatePercentile(
          p.first, p.second, Literal(ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY))
    }
}

object ApproxRewrite {
  val Flag = "spark.graft.approxRewrite"

  /** First unrecognized flag value seen, for the once-per-JVM warning
    * (visible to GraftExtensionsSpec).
    */
  private[graft] val warnedValue = new java.util.concurrent.atomic.AtomicReference[String](null)
}
