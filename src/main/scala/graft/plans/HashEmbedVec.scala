package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Feature-hashing embedding vector over a token-hash array: component
  * d is `Σ over h of ((h·(2d+1) + 7919·d) mod P mod 2001 − 1000)` with
  * P = 10^9+7 and `h` the already-mod-P-reduced 60-bit token hash.
  *
  * The composed form — `transform(sequence(0, dim−1), d ->
  * aggregate(hs, ...))` — runs dim × tokens interpreted lambda steps
  * per row with per-step boxing (measured ~12 s for 13.5k chunks × 16
  * dims at sf0.1). This native expression is the fused dims × tokens
  * double loop over the input `ArrayData` — identical integer
  * arithmetic, so the DuckDB oracle still matches bit-for-bit, and the
  * projection stays inside whole-stage codegen at parquet-scan speed.
  * An empty token array embeds to the zero vector (norm² = 0), same as
  * the folded form. NULL handling is STRICTER than the folded form: a
  * NULL element nulls the whole result (the folded transform/aggregate
  * would yield per-component NULLs) — hashEmbed's `hs` is built by
  * `transform` over non-null tokens and can never contain NULLs, so
  * the difference is unobservable from the public operator.
  */
case class HashEmbedVec(child: Expression, dim: Int)
    extends UnaryExpression {

  require(dim > 0 && dim <= 64, s"hash_embed_vec needs 0 < dim <= 64, got $dim")

  private val P = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hash_embed_vec expects array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hash_embed_vec"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](dim)
    var d = 0
    while (d < dim) {
      var acc = 0L
      var j = 0
      while (j < n) {
        if (hs.isNullAt(j)) return null
        acc += (hs.getLong(j) * (2L * d + 1L) + 7919L * d) % P % 2001L - 1000L
        j += 1
      }
      out(d) = acc
      d += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("heN")
      val out = ctx.freshName("heOut")
      val d = ctx.freshName("heD")
      val j = ctx.freshName("heJ")
      val acc = ctx.freshName("heAcc")
      s"""
         |final int $n = $x.numElements();
         |long[] $out = new long[$dim];
         |for (int $d = 0; $d < $dim && !${ev.isNull}; $d++) {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($x.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    $acc += ($x.getLong($j) * (2L * $d + 1L) + 7919L * $d)
         |      % ${P}L % 2001L - 1000L;
         |  }
         |  $out[$d] = $acc;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashEmbedVec =
    copy(child = newChild)
}

object HashEmbedVec {

  /** Column-API entry point; `hs` must carry mod-P-reduced hashes. */
  def hashEmbedVec(hs: Column, dim: Int): Column =
    Bridge.column(HashEmbedVec(Bridge.expression(hs), dim))
}
