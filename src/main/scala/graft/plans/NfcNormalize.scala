package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) — the text-cleanup
  * step an LLM curation pipeline runs before ANY hashing or dedup:
  * decomposed sequences (`e` + U+0301 combining acute) and precomposed
  * characters (`é`) are the SAME text but hash differently, so without
  * normalization a crawl that mixes encodings defeats exact dedup,
  * MinHash shingles, and every content key. Spark has no built-in;
  * this wraps `java.text.Normalizer` (Form.NFC — the form DuckDB's
  * `nfc_normalize` implements, giving the oracle an independent
  * implementation of the same Unicode spec to agree with).
  *
  * The JDK call does the real work; codegen keeps the expression inside
  * whole-stage codegen (no interpreted-dispatch row boundary), same as
  * Spark's own locale/regex builtins. Null in → null out.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${other.sql}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($x.toString(),
         |    java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  def nfc(s: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(s)))

  /** Registry descriptor — makes `nfc_normalize(s)` available to
    * `expr()` and `spark.sql(...)` (same name as DuckDB's builtin).
    */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        s"nfc_normalize expects 1 argument, got ${children.size}")
      NfcNormalize(children(0))
    })
}
