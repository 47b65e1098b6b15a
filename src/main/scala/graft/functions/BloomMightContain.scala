package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(bloomBytes, value)` — membership probe of a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]] as a
  * codegen'd Catalyst expression. False means DEFINITELY absent; true
  * means present-or-false-positive (rate set at build time).
  *
  * This is the engine's set-membership pre-filter for the cases where
  * the filter set is far too large to broadcast as a hash set but its
  * Bloom digest is a few hundred MB (e.g. the fingerprint history of
  * an entire training corpus probed by each arriving batch —
  * [[graft.ops.Dedup.incrementalNewBloom]]): rows that fail the probe
  * skip the exact verification join entirely. Same shape as Spark's
  * own `BloomFilterMightContain` runtime-filter expression (which OSS
  * Spark does not expose as a SQL-registerable function; this one is
  * also DataFrame-callable via [[graft.functions.bloom_might_contain]]).
  *
  * The bloom side must be FOLDABLE (a literal / driver-built digest):
  * the filter is deserialized once per executor (transient lazy),
  * never per row, and ships with the task binary exactly once.
  */
case class BloomMightContain(bloom: Expression, value: Expression)
    extends BinaryExpression {

  override def left: Expression = bloom
  override def right: Expression = value

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (bloom.dataType != BinaryType)
      TypeCheckFailure(s"bloom side must be BINARY, got ${bloom.dataType}")
    else if (!bloom.foldable)
      TypeCheckFailure("bloom side must be foldable (a driver-built digest)")
    else if (value.dataType != StringType)
      TypeCheckFailure(s"value must be STRING, got ${value.dataType}")
    else TypeCheckSuccess
  }

  @transient private lazy val filter: BloomFilter = {
    val bytes = bloom.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Java-callable entry for generated code (and eval). */
  def test(v: UTF8String): Boolean = filter.mightContainBinary(v.getBytes)

  override def nullSafeEval(b: Any, v: Any): Any =
    test(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this,
      classOf[BloomMightContain].getName)
    // the bloom child is never evaluated per row — the deserialized
    // filter lives on the referenced expression instance
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.test($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(bloom = newLeft, value = newRight)

  override def prettyName: String = "bloom_might_contain"
}
