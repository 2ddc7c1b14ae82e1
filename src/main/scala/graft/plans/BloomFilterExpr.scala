package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Runtime row-level bloom prefilter: `mightContain(key)` against a
  * pre-built [[BloomFilter]] whose serialized bits ride along in the plan
  * as one constant reference object.
  *
  * This is the explicit form of the runtime-filter pattern Spark's AQE
  * injects for shuffle joins (`spark.sql.optimizer.runtime.bloomFilter.*`):
  * build a bloom over the small/filtered join side, then drop fact rows
  * that cannot match BEFORE they reach the join's shuffle. False positives
  * are resolved by the exact join that follows, so results are identical
  * to the unfiltered join; false negatives are impossible. At 100 TB the
  * win is shuffle volume: only plausibly-matching fact rows are hashed,
  * serialized, and spilled.
  *
  * Codegen'd (no UDF): the filter stays inside whole-stage codegen and the
  * per-row cost is the sketch's k hash probes on a primitive long.
  */
case class BloomMightContain(child: Expression, bloomBits: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects a BIGINT key, got ${child.dataType}")

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBits))

  override protected def nullSafeEval(key: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // One deserialized filter per JVM plan instance, shared across rows.
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, key => s"${ev.value} = $ref.mightContainLong($key);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
