package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SimHash over a shingle-hash array: bit k of the result is set when the
  * +1/−1 votes of bit k across all hashes sum positive.
  *
  * The composed form (`aggregate(sequence(0, nBits-1), ..., aggregate(
  * shash, ...))`) re-walks the ENTIRE hash array once per output bit —
  * nBits interpreted passes per row (nested HOFs are CodegenFallback).
  * This native expression makes ONE pass: each hash updates all nBits
  * vote counters, then the bit pattern assembles from the counter signs —
  * O(n·nBits) arithmetic without per-bit array re-walks, interpreter
  * dispatch, or intermediate allocation, fused into whole-stage codegen.
  *
  * Arithmetic matches the composed form exactly (vote = +1 iff
  * `(h >> k) % 2 == 1`, arithmetic shift and signed modulo, so even
  * negative inputs agree); empty array → 0 (no positive votes), null
  * array or element → null.
  */
case class SimHash(child: Expression, nBits: Int) extends UnaryExpression {

  require(nBits >= 1 && nBits <= 64, "SimHash needs 1..64 bits")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val shash = input.asInstanceOf[ArrayData]
    val n = shash.numElements()
    val cnt = new Array[Int](nBits)
    var j = 0
    while (j < n) {
      if (shash.isNullAt(j)) return null
      val h = shash.getLong(j)
      var k = 0
      while (k < nBits) {
        cnt(k) += (if ((h >> k) % 2 == 1) 1 else -1)
        k += 1
      }
      j += 1
    }
    var out = 0L
    var k = 0
    while (k < nBits) {
      if (cnt(k) > 0) out |= 1L << k
      k += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("shN")
      val cnt = ctx.freshName("shCnt")
      val j = ctx.freshName("shJ")
      val k = ctx.freshName("shK")
      val h = ctx.freshName("shH")
      val out = ctx.freshName("shOut")
      s"""
         |final int $n = $x.numElements();
         |int[] $cnt = new int[$nBits];
         |for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
         |  if ($x.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final long $h = $x.getLong($j);
         |  for (int $k = 0; $k < $nBits; $k++) {
         |    $cnt[$k] += ((($h >> $k) % 2L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $out = 0L;
         |for (int $k = 0; $k < $nBits; $k++) {
         |  if ($cnt[$k] > 0) { $out |= 1L << $k; }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {

  /** Column-API entry point: bit width is a plan-time value. */
  def simhash64(shash: Column, nBits: Int): Column =
    Bridge.column(SimHash(Bridge.expression(shash), nBits))
}
