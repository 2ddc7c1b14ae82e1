package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-separated segment count — the exact value of
  * `size(split(text, ' '))` / DuckDB `len(string_split(text, ' '))`
  * (segments = 0x20 bytes + 1, empty segments included, `""` → 1) without
  * materializing the array: the built-in allocates every token substring
  * just to count them, and the corpus-token accounting queries
  * (`pipeline_pack_sequences`, `pipeline_domain_mix`) count tokens in every
  * document they scan. One branch-light pass over the raw UTF-8 bytes,
  * zero allocation, inside whole-stage codegen.
  *
  * Byte-scan correctness: UTF-8 is self-synchronizing — 0x20 never occurs
  * inside a multi-byte sequence — so counting 0x20 BYTES equals counting
  * space CHARACTERS. (And `lower()` is irrelevant to the count: no Unicode
  * lowercase mapping produces or consumes U+0020, which is why the call
  * sites dropped it.)
  */
case class SpaceSegCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_ntokens expects string, got $t")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var c = 1L
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
        long ${ev.value}_acc = 1L;
        int $n = $s.numBytes();
        for (int $i = 0; $i < $n; $i++) {
          if ($s.getByte($i) == 0x20) ${ev.value}_acc++;
        }
        ${ev.value} = ${ev.value}_acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SpaceSegCount =
    copy(child = newChild)
}

object StringKernels {
  /** `size(split(text, ' '))` as a zero-allocation codegen'd byte scan. */
  def spaceSegCount(text: Column): Column =
    Bridge.column(SpaceSegCount(Bridge.expression(text)))
}
