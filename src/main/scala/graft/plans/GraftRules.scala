package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.Fp16RoundArr

/** Optimizer rules for graft expressions (injected via
  * `spark.experimental.extraOptimizations` or GraftExtensions).
  *
  * Fp16Idempotence: fp16(fp16(x)) ⇒ fp16(x). Binary16 round-trip is
  * idempotent (every output value is exactly representable —
  * property-tested in PropertySpec), so stacked compression calls —
  * e.g. an fp16-stored corpus passed through an fp16-compressing
  * search path, mirroring the reference where both add_vectors and
  * search re-compress (vector_index.py:87-97, 124-126) — collapse to
  * one pass over the array.
  */
object Fp16Idempotence extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Fp16RoundArr(inner @ Fp16RoundArr(_)) => inner
    }
}

object GraftRules {
  def install(spark: SparkSession): Unit = {
    val add = Seq(Fp16Idempotence, VectorTopKRewrite)
    val cur = spark.experimental.extraOptimizations
    val missing = add.filterNot(cur.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations = cur ++ missing
    // VectorTopKRewrite plants VectorTopKJoinNode — the planner
    // strategy must be present for it to execute
    VectorTopK.install(spark)
  }
}
