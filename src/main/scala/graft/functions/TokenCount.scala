package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of single-space-separated tokens in ONE pass over the bytes —
  * the codegen replacement for `size(split(text, ' '))`, which
  * materializes an array of UTF8String slices per row just to take its
  * length. Token counting is the inner loop of every corpus statistic
  * (tokenize_stats, quality signals, BPE estimates), so the array
  * allocation is pure waste: tokens = separators + 1.
  *
  * Semantics match Java's split with limit -1 on a single-char
  * separator (what Spark's `split(text, ' ')` compiles to): an empty
  * string has one token (the empty token), adjacent separators yield
  * empty tokens, and a trailing separator yields a trailing empty
  * token. Count = (number of 0x20 bytes) + 1 — correct under UTF-8
  * because multi-byte sequences never contain ASCII bytes. */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_count expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String]
    var n = 1
    var i = 0
    val nb = str.numBytes()
    while (i < nb) {
      if (str.getByte(i) == ' '.toByte) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = 1;
         |int $nb = $s.numBytes();
         |for (int $i = 0; $i < $nb; $i++) {
         |  if ($s.getByte($i) == (byte) 0x20) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(newChild)
}
