package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructType}

/** As-of lookup: given a change history as a ts-ascending-sorted
  * array<struct<ts: long, v: double>> and a query timestamp, return
  * the value of the LATEST change with change.ts <= query ts, or null
  * if the history is empty / entirely in the future.
  *
  * This is the per-row kernel of the broadcast as-of join
  * (graft.ops.Temporal.asofJoinBroadcast): a compiled O(log n) binary
  * search instead of the interpreted HOF chain
  * (filter(h, c -> c.ts <= t) + element_at(-1)) which is O(n) per row
  * and breaks whole-stage codegen.
  */
case class AsofLookup(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null result on a non-null, all-future history
  override def nullable: Boolean = true

  /** Enforce the (array<struct<long, double>>, long) signature at
    * analysis time: under codegen a mistyped child (int ts, float v)
    * would not crash but read garbage bytes from the UnsafeRow slots —
    * a silently wrong join. */
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(s: StructType, _), LongType)
        if s.length == 2 && s(0).dataType == LongType &&
          s(1).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"asof_lookup expects (array<struct<ts: bigint, v: double>>, " +
        s"bigint), got ($l, $r)")
  }

  override def nullSafeEval(arr: Any, ts: Any): Any =
    AsofLookup.lookup(arr.asInstanceOf[ArrayData],
      ts.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, ts) => {
      val found = ctx.freshName("asofFound")
      s"""
         |java.lang.Double $found =
         |  graft.functions.AsofLookup.lookup($arr, $ts);
         |${ev.isNull} = ($found == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : $found.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsofLookup =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "asof_lookup"
}

object AsofLookup {

  /** Java-callable entry for generated code: greatest index with
    * arr[i].ts <= ts via binary search (arr sorted ascending by ts).
    * A found element whose value field is null yields null, never a
    * fabricated 0.0 (getDouble on a null slot reads 0) — the operator
    * pre-filters null-valued changes, this guards direct expression
    * use. */
  def lookup(arr: ArrayData, ts: Long): java.lang.Double = {
    var lo = 0
    var hi = arr.numElements() - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getStruct(mid, 2).getLong(0) <= ts) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (ans < 0) return null
    val row = arr.getStruct(ans, 2)
    if (row.isNullAt(1)) null
    else java.lang.Double.valueOf(row.getDouble(1))
  }
}
