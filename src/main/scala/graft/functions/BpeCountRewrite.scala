package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpExtractAll, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule (the `injectOptimizerRule` tier of the extension
  * surface): rewrites the naive BPE token-count spelling
  * `size(regexp_extract_all(x, BPE_PATTERN, 0))` — which materializes
  * every matched substring just to count them — into the native one-pass
  * [[BpeTokenCount]] expression. Users who write the obvious SQL get the
  * optimized plan automatically; FunctionsSpec proves the two spellings
  * agree, GraftExtensionsSpec proves the rewrite fires.
  */
object BpeCountRewrite extends Rule[LogicalPlan] {

  private val BpePatternLit = UTF8String.fromString(
    graft.ext.TextAnalysis.BpePattern)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(RegExpExtractAll(subject,
            Literal(p: UTF8String, StringType), Literal(0, _)), _)
          if p == BpePatternLit =>
        BpeTokenCount(subject)
    }
}
