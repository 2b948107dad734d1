package graft.llm

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-pass shifted Gram contract ([[Pca.fitShifted]]):
  *
  *  1. SHIFT INVARIANCE — on the real sf corpus the shifted model's ncov
  *     grid and power-iterated direction equal the one-pass fit's exactly
  *     (N·G' − S'_j·S'_k = N·G − S_j·S_k for any constant shift).
  *  2. WRAP SELF-CANCELLATION (a FALSIFICATION of the round-12 doc's
  *     overflow claim, pinned on purpose): the one-pass pipeline is ring
  *     operations only (+, −, ×), so it is exact mod 2⁶⁴ — per-row
  *     products may wrap signed 64-bit and the final ncov still comes out
  *     EXACT whenever the true centered value fits a long. The test
  *     drives raw coordinates past the single-product wrap point and
  *     asserts BOTH forms match BigInt ground truth. "One-pass overflows
  *     at N ≈ 30M because N·B > 3·10⁹" was therefore wrong.
  *  3. THE GENUINE OVERFLOW REGIME — when the true N²-scale ncov itself
  *     exceeds 2⁶³, NO 64-bit arithmetic can carry it, shifted or not.
  *     What survives is the shifted GRAM G' (true magnitude ≈ N·σ², a
  *     factor N smaller): the test constructs a corpus where BigInt truth
  *     shows ncov > Long.MaxValue while G' still fits and
  *     [[Pca.fitShifted]] reproduces it exactly — with
  *     [[Pca.componentFromShiftedGram]] eigensolving on G' (the rank-1
  *     residual correction S'·S'ᵀ is bounded by N² ≪ N·G' entries).
  *     That is the real 100 TB story.
  */
class ShiftedPcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"
  def corpus = Ann.withQuantized(Tables(spark, dir, "embeddings"), "embedding")

  test("shifted fit ncov + component equal the one-pass fit on the sf corpus; " +
    "means are the truncating quotients and residual sums are < N") {
    val one = Pca.fit(corpus, d = 64)
    val sh = Pca.fitShifted(corpus, d = 64)
    assert(sh.model.n == one.n)
    // means replay: truncation-toward-zero quotient of the one-pass sums
    (0 until 64).foreach { j =>
      val s = one.sums(j)
      val m = if (s < 0) -((-s) / one.n) else s / one.n
      assert(sh.means(j) == m, s"mean($j)")
      // residual sum after shifting: S'_j = S_j − N·m_j, |S'| < N
      assert(sh.model.sums(j) == s - one.n * m, s"residual($j)")
      assert(math.abs(sh.model.sums(j)) < one.n, s"residual bound($j)")
    }
    (0 until 64).foreach { j =>
      (j until 64).foreach { k =>
        assert(sh.model.ncov(j, k) == one.ncov(j, k), s"ncov($j,$k)")
      }
    }
    // identical ncov ⇒ identical scaled covariance ⇒ identical sweeps
    assert(sh.model.w == one.w)
  }

  test("wrap self-cancellation: per-row products wrap 64-bit yet BOTH the " +
    "one-pass and the shifted ncov match BigInt ground truth exactly") {
    // C² ≈ 1.02e19 > Long.MaxValue ≈ 9.22e18: a SINGLE raw product wraps —
    // and it does not matter, because the pipeline is ring ops only and
    // the true centered value fits a long. This pins the falsification of
    // the round-12 "one-pass overflows past N·B ≈ 3e9" claim.
    val C = 3200000000L
    val noise = Seq(
      Seq(3L, -2L), Seq(-5L, 4L), Seq(1L, 1L), Seq(0L, -3L),
      Seq(4L, 2L), Seq(-1L, 5L), Seq(2L, -4L), Seq(-3L, 0L))
    val rows = noise.zipWithIndex.map { case (nz, i) =>
      (i.toLong, nz.map(_ + C))
    }
    val df = rows.toDF("vec_id", "vq")
    val n = rows.size
    // sanity: the raw per-row product really is past the wrap point
    assert(BigInt(C) * BigInt(C) > BigInt(Long.MaxValue))
    // ground truth in BigInt, then down to Long (centered values are tiny)
    val big = rows.map(_._2.map(BigInt(_)))
    val sums = Seq(0, 1).map(j => big.map(_(j)).sum)
    def truthNcov(j: Int, k: Int): Long = {
      val g = big.map(r => r(j) * r(k)).sum
      val v = BigInt(n) * g - sums(j) * sums(k)
      assert(v.isValidLong, "truth must fit a long once centered")
      v.toLong
    }
    val sh = Pca.fitShifted(df, d = 2, iters = 0)
    val one = Pca.fit(df, d = 2, iters = 0)
    for { j <- 0 until 2; k <- j until 2 } {
      assert(sh.model.ncov(j, k) == truthNcov(j, k), s"shifted ncov($j,$k)")
      assert(one.ncov(j, k) == truthNcov(j, k), s"one-pass ncov($j,$k)")
    }
    // the shifted path additionally keeps every stored magnitude small
    assert(sh.model.gramUpper.forall(g => math.abs(g) < 1000000L))
    // ...while the one-pass stored gram is wrapped garbage en route
    // (exactness lives only in the mod-2^64 composition): the stored
    // (0,0) entry — gramUpper(0) for d=2 — must differ from the BigInt
    // Σ x₀² it notionally accumulates, i.e. it REALLY wrapped
    assert(BigInt(one.gramUpper(0)) != big.map(r => r(0) * r(0)).sum,
      "one-pass gram(0,0) did not wrap — fixture no longer exercises the regime")
  }

  test("genuine overflow regime: true ncov exceeds 2^63 (unrepresentable " +
    "in ANY 64-bit form) while the shifted Gram G' still fits and is exact") {
    // spread σ ≈ 3e7 around offset 5e9, n = 1000:
    //   true ncov  ~ n²·σ² ≈ 1e6 · 9e14 = 9e20  > 2^63  (gone)
    //   true G'    ~ n ·σ² ≈ 1e3 · 9e14 = 9e17  < 2^63  (survives)
    val rnd = new scala.util.Random(41)
    val C = 5000000000L
    val n = 1000
    val rows = (0 until n).map { i =>
      (i.toLong, Seq(C + rnd.nextLong() % 30000000L,
        -C + rnd.nextLong() % 30000000L))
    }
    val big = rows.map(_._2.map(BigInt(_)))
    val sums = Seq(0, 1).map(j => big.map(_(j)).sum)
    def truthNcovBig(j: Int, k: Int): BigInt =
      BigInt(n) * big.map(r => r(j) * r(k)).sum - sums(j) * sums(k)
    // the regime premise: the N²-scale value genuinely does not fit
    assert((0 until 2).exists(j => !truthNcovBig(j, j).isValidLong),
      "test corpus no longer reaches the ncov-overflow regime")
    val df = rows.toDF("vec_id", "vq")
    val sh = Pca.fitShifted(df, d = 2, iters = 0)
    // BigInt replay of the two-pass pipeline: integer means, shifted grid
    val means = Seq(0, 1).map { j =>
      val s = sums(j); val nn = BigInt(n)
      (if (s < 0) -((-s) / nn) else s / nn).toLong
    }
    assert(sh.means == means)
    val shiftedBig = big.map(r => Seq(r(0) - means(0), r(1) - means(1)))
    for { j <- 0 until 2; k <- j until 2 } {
      val gTrue = shiftedBig.map(r => r(j) * r(k)).sum
      assert(gTrue.isValidLong, s"G'($j,$k) must fit — regime invariant")
      assert(BigInt(sh.model.gram(j, k)) == gTrue, s"G'($j,$k)")
    }
    // the G'-eigensolve is the production escape: rank-1 residual term
    // |S'_j·S'_k| < n² is negligible against the G' entries here
    val w = Pca.componentFromShiftedGram(sh)
    assert(w.length == 2 && w.exists(_ != 0L))
    assert(sh.model.sums.forall(s => math.abs(s) < n.toLong))
  }

  test("G'-eigensolve quality: the component from the shifted Gram alone " +
    "reaches >= 0.9 of the dominant eigenvalue's Rayleigh quotient") {
    // G' = (ncov + S'·S'ᵀ)/N up to the rank-1 residual; its power
    // iterate must be essentially as good a direction for the TRUE
    // covariance as the ncov-iterated one — the claim that makes the
    // billion-row path a drop-in replacement
    val sh = Pca.fitShifted(corpus, d = 64)
    val w = Pca.componentFromShiftedGram(sh)
    val d = 64
    val c = Array.tabulate(d, d)((j, k) => sh.model.ncov(j, k).toDouble)
    def rayleigh(v: Array[Double]): Double = {
      val cv = Array.tabulate(d)(j => (0 until d).map(k => c(j)(k) * v(k)).sum)
      v.zip(cv).map { case (a, b) => a * b }.sum / v.map(x => x * x).sum
    }
    var v = Array.fill(d)(1.0)
    (1 to 400).foreach { _ =>
      val nv = Array.tabulate(d)(j => (0 until d).map(k => c(j)(k) * v(k)).sum)
      val mx = nv.map(math.abs).max
      v = nv.map(_ / mx)
    }
    val l1 = rayleigh(v)
    val r = rayleigh(w.map(_.toDouble).toArray)
    assert(r >= 0.9 * l1, s"G' Rayleigh $r < 0.9 * $l1")
  }

  test("property sweep: random offsets and spreads — shifted ncov equals " +
    "one-pass ncov whenever the one-pass form is in its safe regime") {
    val rnd = new scala.util.Random(23)
    (0 until 3).foreach { trial =>
      val d = 3 + rnd.nextInt(4)
      val n = 8 + rnd.nextInt(12)
      val offs = Seq.fill(d)(rnd.nextLong() % 5000L)
      val rows = (0 until n).map { i =>
        (i.toLong, (0 until d).map(j => offs(j) + rnd.nextLong() % 200L))
      }
      val df = rows.toDF("vec_id", "vq")
      val one = Pca.fit(df, d = d, iters = 2)
      val sh = Pca.fitShifted(df, d = d, iters = 2)
      (0 until d).foreach { j =>
        (j until d).foreach { k =>
          assert(sh.model.ncov(j, k) == one.ncov(j, k),
            s"trial $trial ncov($j,$k)")
        }
      }
      assert(sh.model.w == one.w, s"trial $trial w")
    }
  }
}
