package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact Jaccard similarity of two `array<string>` SETS (elements assumed
  * distinct within each array, as `array_distinct`'d shingle sets are) in
  * one hash-probe pass.
  *
  * This is the per-candidate-pair cost of every near-dup verification
  * join (`TextOps.minhashNearDups`, `blockedNgramJaccard`). The composed
  * form, `size(array_intersect(a,b)) / size(array_union(a,b))`, walks
  * both arrays twice and MATERIALIZES two intermediate arrays per pair
  * just to take their sizes. Set semantics give `|a ∪ b| = |a| + |b| -
  * |a ∩ b|`, so one hash set over the smaller side + one probe pass over
  * the larger computes both counts with no intermediate array.
  *
  * Determinism: two exact integer counts → one IEEE double division —
  * bit-identical to the oracle's `len(list_intersect)/len(list_distinct(
  * list_concat))` arithmetic. Null array or null element → null; empty
  * union → null (call sites filter empty shingle sets first).
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim expects (array<string>, array<string>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val (small, big) = if (x.numElements() <= y.numElements()) (x, y) else (y, x)
    val ns = small.numElements()
    val nb = big.numElements()
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var i = 0
    while (i < ns) {
      if (small.isNullAt(i)) return null
      set.add(small.getUTF8String(i))
      i += 1
    }
    var hits = 0
    i = 0
    while (i < nb) {
      if (big.isNullAt(i)) return null
      if (set.contains(big.getUTF8String(i))) hits += 1
      i += 1
    }
    val union = ns + nb - hits
    if (union == 0) null else hits.toDouble / union.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val small = ctx.freshName("jsSmall")
      val big = ctx.freshName("jsBig")
      val ns = ctx.freshName("jsNs")
      val nb = ctx.freshName("jsNb")
      val set = ctx.freshName("jsSet")
      val hits = ctx.freshName("jsHits")
      val union = ctx.freshName("jsUnion")
      val i = ctx.freshName("jsI")
      val arrCls = classOf[ArrayData].getName
      // Janino: raw types, explicit break-out flag instead of labeled breaks
      s"""
         |$arrCls $small = $a.numElements() <= $b.numElements() ? $a : $b;
         |$arrCls $big = $a.numElements() <= $b.numElements() ? $b : $a;
         |final int $ns = $small.numElements();
         |final int $nb = $big.numElements();
         |java.util.HashSet $set = new java.util.HashSet($ns * 2);
         |int $hits = 0;
         |for (int $i = 0; $i < $ns && !${ev.isNull}; $i++) {
         |  if ($small.isNullAt($i)) { ${ev.isNull} = true; }
         |  else { $set.add($small.getUTF8String($i)); }
         |}
         |for (int $i = 0; $i < $nb && !${ev.isNull}; $i++) {
         |  if ($big.isNullAt($i)) { ${ev.isNull} = true; }
         |  else if ($set.contains($big.getUTF8String($i))) { $hits++; }
         |}
         |final int $union = $ns + $nb - $hits;
         |if ($union == 0) { ${ev.isNull} = true; }
         |if (!${ev.isNull}) { ${ev.value} = ((double) $hits) / ((double) $union); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {

  /** Column-API entry point. */
  def jaccardSim(a: Column, b: Column): Column =
    Bridge.column(JaccardSim(Bridge.expression(a), Bridge.expression(b)))

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaccard_sim"),
    new ExpressionInfo(classOf[JaccardSim].getName, "jaccard_sim"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"jaccard_sim expects 2 arguments, got ${children.size}")
      JaccardSim(children(0), children(1))
    })
}
