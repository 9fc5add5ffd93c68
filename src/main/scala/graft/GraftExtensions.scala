package graft

import graft.functions.{BloomMightContain, CosineSim, FirstEqIndex, JaccardSim, TokenCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, Size, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Session-extension wiring for the engine's native expressions —
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions`) makes every session see:
  *
  *  - `graft_cosine` / `graft_jaccard` / `graft_token_count` as
  *    registered functions (SQL text and `call_function`), without the
  *    per-DataFrame `register` calls;
  *  - the [[TokenCountRewrite]] optimizer rule, which turns
  *    `size(split(text, ' '))` — an array materialization per row just
  *    to read its length — into the single-pass byte-count
  *    [[graft.functions.TokenCount]] expression.
  *
  * This is the (c)-tier extension point of the build contract: custom
  * Catalyst expressions + a `Rule[LogicalPlan]` registered through
  * `SparkSessionExtensions`, used by Bench/Verify sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def fn(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("graft_cosine", classOf[CosineSim],
      exprs => CosineSim(exprs(0), exprs(1))))
    ext.injectFunction(fn("graft_jaccard", classOf[JaccardSim],
      exprs => JaccardSim(exprs(0), exprs(1))))
    ext.injectFunction(fn("graft_token_count", classOf[TokenCount],
      exprs => TokenCount(exprs.head)))
    ext.injectFunction(fn("graft_first_eq", classOf[FirstEqIndex],
      exprs => FirstEqIndex(exprs(0), exprs(1))))
    ext.injectFunction(fn("graft_bloom_probe", classOf[BloomMightContain],
      exprs => BloomMightContain(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => TokenCountRewrite)
    // whole-operator extension: filter(row_number() <= k) over a window
    // becomes the bounded-heap TopKPerGroupExec (no per-partition sort)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

/** `size(split(text, ' ', -1))` ⇒ `TokenCount(text)` — same value
  * (tokens = 0x20 bytes + 1 under Java split-keep-trailing semantics),
  * no per-row array. Only fires on the exact single-space literal
  * pattern; any other separator keeps the built-in path. */
object TokenCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(StringSplit(str, Literal(sep: UTF8String, StringType),
          Literal(-1, IntegerType)), _) if sep.toString == " " =>
        TokenCount(str)
    }
}
