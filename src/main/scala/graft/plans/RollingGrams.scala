package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Positional k-gram keys over a word-hash array via a dual-modulus
  * Rabin–Karp rolling hash: element i is
  * `h1(i) * P2 + h2(i)` where `hm(i) = Σ_j (w[i+j] mod Pm) · Bm^(k-1-j)
  * mod Pm` — ~62 bits of key space from two independent 31-bit
  * polynomial hashes, all in overflow-safe long arithmetic.
  *
  * Why this beats hashing gram STRINGS (`md5(concat_ws(' ', slice(...)))`
  * per position): the string form re-copies ~k words of text per
  * position — O(n·k) char traffic plus n md5 invocations over long
  * buffers per document — while the rolling recurrence
  * `h(i+1) = (h(i) − w[i]·B^(k-1))·B + w[i+k] mod P` updates each
  * modulus in O(1) per position after the first window: O(n) long ops
  * per document, no intermediate strings, fused into whole-stage codegen.
  * Words are md5-hashed ONCE each (short strings), not once per
  * covering gram.
  *
  * Fewer than `k` words → empty array (a document with no k-grams);
  * null array or element → null. Constants are fixed engine-wide
  * (primes just under 2³¹, bases under 2²⁰) so any two sessions — and
  * the DuckDB oracle, which replays the Σ form with interpolated
  * `Bm^e mod Pm` power tables — derive identical keys.
  */
case class RollingGrams(child: Expression, k: Int) extends UnaryExpression {
  import RollingGrams._

  require(k >= 1 && k <= 64, "RollingGrams needs window 1..64")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rolling_grams expects array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_grams"

  // B^(k-1) mod P for the subtract-leading-term step of the recurrence
  private lazy val bk1 = powMod(B1, k - 1, P1)
  private lazy val bk2 = powMod(B2, k - 1, P2)

  override protected def nullSafeEval(input: Any): Any = {
    val wh = input.asInstanceOf[ArrayData]
    val n = wh.numElements()
    val m = n - k + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](m)
    var h1 = 0L; var h2 = 0L
    var j = 0
    while (j < n) {
      if (wh.isNullAt(j)) return null
      val w = wh.getLong(j)
      if (j >= k) { // retire the word leaving the window
        val wOld = wh.getLong(j - k)
        // ((x % P) + P) % P: normalize into [0, P) so negative word
        // hashes can't drive h negative and diverge from the oracle's
        // Σ-form replay (all current callers feed non-negative h64s,
        // but the expression accepts any array<bigint>)
        h1 = (h1 - ((wOld % P1) + P1) % P1 * bk1 % P1 + P1) % P1
        h2 = (h2 - ((wOld % P2) + P2) % P2 * bk2 % P2 + P2) % P2
      }
      h1 = (h1 * B1 + ((w % P1) + P1) % P1) % P1
      h2 = (h2 * B2 + ((w % P2) + P2) % P2) % P2
      if (j >= k - 1) out(j - k + 1) = h1 * P2 + h2
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("rgN")
      val m = ctx.freshName("rgM")
      val out = ctx.freshName("rgOut")
      val h1 = ctx.freshName("rgH1")
      val h2 = ctx.freshName("rgH2")
      val j = ctx.freshName("rgJ")
      val w = ctx.freshName("rgW")
      val wOld = ctx.freshName("rgWOld")
      s"""
         |final int $n = $x.numElements();
         |final int $m = $n - $k + 1;
         |long[] $out = new long[$m > 0 ? $m : 0];
         |long $h1 = 0L; long $h2 = 0L;
         |for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
         |  if ($x.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final long $w = $x.getLong($j);
         |  if ($j >= $k) {
         |    final long $wOld = $x.getLong($j - $k);
         |    $h1 = ($h1 - (($wOld % ${P1}L) + ${P1}L) % ${P1}L * ${bk1}L % ${P1}L + ${P1}L) % ${P1}L;
         |    $h2 = ($h2 - (($wOld % ${P2}L) + ${P2}L) % ${P2}L * ${bk2}L % ${P2}L + ${P2}L) % ${P2}L;
         |  }
         |  $h1 = ($h1 * ${B1}L + (($w % ${P1}L) + ${P1}L) % ${P1}L) % ${P1}L;
         |  $h2 = ($h2 * ${B2}L + (($w % ${P2}L) + ${P2}L) % ${P2}L) % ${P2}L;
         |  if ($j >= $k - 1) { $out[$j - $k + 1] = $h1 * ${P2}L + $h2; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingGrams =
    copy(child = newChild)
}

object RollingGrams {

  /** Fixed engine-wide constants: the two largest primes below 2³¹ keep
    * every intermediate under 2⁶³ (see scaladoc), the bases are primes
    * under 2²⁰ so `h·B` stays below 2⁵¹ before the additive term.
    */
  val P1 = 2147483629L
  val P2 = 2147483587L
  val B1 = 1000003L
  val B2 = 999983L

  def powMod(b: Long, e: Int, p: Long): Long = {
    var r = 1L; var i = 0
    while (i < e) { r = r * (b % p) % p; i += 1 }
    r
  }

  /** `Bm^(k-1-j) mod Pm` for j in 0..k-1 — the power table the DuckDB
    * oracle's Σ-form replay interpolates as a literal list.
    */
  def powTable(b: Long, k: Int, p: Long): Seq[Long] =
    (0 until k).map(j => powMod(b, k - 1 - j, p))

  /** Column-API entry point: window size is a plan-time value. */
  def rollingGrams(wordHashes: Column, k: Int): Column =
    Bridge.column(RollingGrams(Bridge.expression(wordHashes), k))
}
