package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product over two `array<bigint>` columns.
  *
  * This is the hot inner loop of the ANN surface (`Ann.bruteTopK` /
  * `lshTopK` / `ivfTopK` / `nearDupPairs` score every candidate pair with
  * one dot product). The composed-builtin form,
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x)`,
  * is semantically identical but executes as two higher-order functions:
  * `ZipWith` materializes an intermediate array per pair and both HOFs are
  * `CodegenFallback` — they run interpreted and break the surrounding
  * whole-stage-codegen span. At 100 TB the candidate stream is the
  * dominant cost, so this is exactly the case the custom-Expression tier
  * exists for: a `BinaryExpression` with `doGenCode` that loops over the
  * two `ArrayData` directly — no intermediate allocation, no virtual
  * dispatch, fused into the enclosing codegen stage.
  *
  * Semantics match the composed form bit-for-bit: exact 64-bit integer
  * arithmetic; null if either array or any element is null, and null on
  * ragged (unequal-length) inputs — exactly what `zip_with`'s null-padding
  * produces in the composed form. (An earlier version summed over the
  * shorter length, which silently truncated dot products for a mixed-
  * dimension corpus; all legitimate inputs are equal-length quantized
  * vectors, so the null is a loud upstream-bug signal, not a data path.)
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qdot expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "qdot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("qdotN")
      val i = ctx.freshName("qdotI")
      val acc = ctx.freshName("qdotAcc")
      s"""
         |final int $n = $x.numElements();
         |long $acc = 0L;
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {

  /** Column-API entry point — usable on any session, no registry needed. */
  def qdot(a: Column, b: Column): Column =
    Bridge.column(QuantizedDot(Bridge.expression(a), Bridge.expression(b)))

  /** Registry descriptor for `SparkSessionExtensions.injectFunction` /
    * runtime registration — makes `qdot(a, b)` available to `expr()` and
    * `spark.sql(...)`.
    */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("qdot"),
    new ExpressionInfo(classOf[QuantizedDot].getName, "qdot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"qdot expects 2 arguments, got ${children.size}")
      QuantizedDot(children(0), children(1))
    })
}
