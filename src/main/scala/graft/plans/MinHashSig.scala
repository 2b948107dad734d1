package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over a shingle-hash array: for permutation i,
  * `min over h of (a_i * (h mod P) + b_i) mod P`.
  *
  * The composed form builds `array(array_min(transform(shash, ...)), ...)`
  * — nPerm intermediate arrays PER ROW (one per permutation), each walked
  * by an interpreted `array_min`, all outside whole-stage codegen. This
  * native expression runs the perms × shingles double loop over the
  * input `ArrayData` directly with the permutation constants held in two
  * plan-time long[] references — zero intermediate allocation beyond the
  * nPerm-long output, identical integer arithmetic (so the DuckDB oracle
  * still matches bit-for-bit).
  *
  * Signature construction is the narrow per-row stage of MinHash-LSH
  * near-dup detection; at 100 TB it runs once per document and dominates
  * the pre-shuffle cost, which is exactly where a fused loop pays.
  */
// Seq (not Array) constants: Array equality is reference-based, which
// would make equals/hashCode — and thus semanticEquals, canonicalization
// and common-subexpression elimination — treat identical signature
// expressions as distinct. The hot loop reads the Array copies below.
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty,
    "MinHashSig needs matching non-empty permutation constant arrays")

  private lazy val asArr: Array[Long] = as.toArray
  private lazy val bsArr: Array[Long] = bs.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val shash = input.asInstanceOf[ArrayData]
    val n = shash.numElements()
    if (n == 0) return null
    val nPerm = as.length
    val out = new Array[Long](nPerm)
    var i = 0
    while (i < nPerm) {
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        if (shash.isNullAt(j)) return null
        val v = (asArr(i) * (shash.getLong(j) % p) + bsArr(i)) % p
        if (v < best) best = v
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", asArr, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bsArr, "long[]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("mhN")
      val out = ctx.freshName("mhOut")
      val i = ctx.freshName("mhI")
      val j = ctx.freshName("mhJ")
      val best = ctx.freshName("mhBest")
      val hv = ctx.freshName("mhH")
      val v = ctx.freshName("mhV")
      s"""
         |final int $n = $x.numElements();
         |if ($n == 0) { ${ev.isNull} = true; }
         |long[] $out = new long[${as.length}];
         |for (int $i = 0; $i < ${as.length} && !${ev.isNull}; $i++) {
         |  long $best = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($x.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    long $hv = $x.getLong($j) % ${p}L;
         |    long $v = ($asRef[$i] * $hv + $bsRef[$i]) % ${p}L;
         |    if ($v < $best) { $best = $v; }
         |  }
         |  $out[$i] = $best;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Column-API entry point: permutation constants are plan-time values. */
  def minhashSig(shash: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    Bridge.column(MinHashSig(Bridge.expression(shash), as, bs, p))
}
