package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA over the quantized embedding grid, built the way the
  * public Spark MLlib design does it (RowMatrix.computePrincipalComponents:
  * aggregate the d×d Gram distributively, eigensolve the constant-size
  * result on the driver) — but with an exact-integer contract end to end,
  * so an independent engine can replay every step bit-for-bit:
  *
  *  - ONE corpus pass computes the upper-triangle Gram `G[j][k] = Σ x_j·x_k`,
  *    the coordinate sums `S_j` and the row count `N` in a single mergeable
  *    [[Aggregator]] buffer (d(d+1)/2 + d + 1 longs — constant-size state,
  *    map-side partial aggregation, no shuffle of expanded pairs). At
  *    d = 64 that is 2,145 longs per partial; a 1000-executor scan merges
  *    them in one tree reduction.
  *  - Mean-centering stays integer: `ncov[j][k] = N·G[j][k] − S_j·S_k`
  *    is N² times the biased covariance, exactly. Overflow analysis
  *    (CORRECTED in round 13 — ShiftedPcaSpec pins both halves): the
  *    whole pipeline is ring operations (+, −, ×), so intermediate
  *    64-bit wrap SELF-CANCELS — the result is exact mod 2⁶⁴, hence
  *    exact outright whenever the TRUE centered value fits a signed
  *    long. The earlier "overflows past N·B ≈ 3·10⁹" reading was wrong.
  *    The binding constraint is the VALUE bound |ncov| ≤ N²·σ²·grid²
  *    (σ = centered spread): past N²·σ² ≈ 2⁶³ the N²-scale quantity is
  *    unrepresentable in any 64-bit form. There a production run uses
  *    [[fitShifted]] (pass 1: integer means m_j = S_j quot N; pass 2:
  *    Gram of the shifted grid x − m) and eigensolves on the N-scale
  *    shifted Gram G' via [[componentFromShiftedGram]] — G' is a factor
  *    N smaller and the dropped rank-1 residual term is < N² per entry.
  *  - The dominant eigenvector comes from FIXED-COUNT power iteration in
  *    saturating integer arithmetic: the covariance is rescaled once to
  *    |c| ≤ 10⁶ and the iterate to |w| ≤ 10⁵ after every mat-vec, both via
  *    sign·(|v| quot scale) (truncation toward zero — Spark `div` and the
  *    oracle's sign-wrapped `//` agree on negatives only in this form).
  *    Every intermediate is then ≤ 64·10⁶·10⁶ < 2⁶³. On a near-isotropic
  *    spectrum the iterate's Rayleigh quotient converges long before the
  *    eigenvector direction does (λ1/λ2 → 1), so the model's quality
  *    contract is Rayleigh ≥ 0.9·λ1 (pinned by PcaSpec), not alignment.
  *  - The d×d solve itself is driver-side over the COLLECTED one-row
  *    aggregate — the same aggregate-sized-collect class as the PQ
  *    codebooks: its size is d(d+1)/2 + d + 1 regardless of corpus rows.
  *
  * Projection (`project`) is map-side only: the integer eigenvector is a
  * broadcast literal, each row computes one d-length integer dot — the
  * corpus never shuffles.
  */
object Pca {

  /** One-pass Gram + sums + count. Buffer layout: `[0, tri)` the
    * upper-triangle products in (j outer, k ≥ j inner) order,
    * `[tri, tri+d)` the coordinate sums, `[tri+d]` the row count.
    */
  private final class GramAgg(d: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    private val tri = d * (d + 1) / 2
    def zero: Array[Long] = new Array[Long](tri + d + 1)
    def reduce(b: Array[Long], row: Seq[Long]): Array[Long] = {
      val a = row.toArray
      var idx = 0
      var j = 0
      while (j < d) {
        val vj = a(j)
        var k = j
        while (k < d) { b(idx) += vj * a(k); idx += 1; k += 1 }
        b(tri + j) += vj
        j += 1
      }
      b(tri + d) += 1L
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: ExpressionEncoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    def outputEncoder: ExpressionEncoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Fitted model: everything is exact integers on the ×100 grid. `w` is
    * the power-iterated dominant direction, |w| ≤ 10⁵.
    */
  final case class PcaModel(d: Int, n: Long, sums: Seq[Long],
      gramUpper: Seq[Long], w: Seq[Long]) {
    private val tri = d * (d + 1) / 2
    /** Full (j)(k) integer Gram. */
    def gram(j: Int, k: Int): Long = {
      val (a, b) = if (j <= k) (j, k) else (k, j)
      gramUpper(a * d - a * (a - 1) / 2 + (b - a))
    }
    /** N²-scaled biased covariance, exact: `N·G − S_j·S_k`. */
    def ncov(j: Int, k: Int): Long = n * gram(j, k) - sums(j) * sums(k)
    require(gramUpper.length == tri, s"gram length ${gramUpper.length}")
  }

  /** Truncation-toward-zero scaled division shared with the oracle replay:
    * `sign(v) · (|v| quot (max|values| quot target + 1))`.
    */
  private def rescale(v: Array[Long], target: Long): Array[Long] = {
    var mx = 0L
    v.foreach(x => mx = math.max(mx, math.abs(x)))
    val sc = mx / target + 1
    v.map(x => if (x < 0) -((-x) / sc) else x / sc)
  }

  /** Aggregate Gram/sums/count in one corpus pass, then run `iters`
    * integer power-iteration sweeps on the driver (the buffer is
    * constant-size — see the class doc for why this collect is sound).
    * `corpus` must carry the quantized `vq` column ([[Ann.withQuantized]]).
    */
  def fit(corpus: DataFrame, d: Int = 64, iters: Int = 12): PcaModel = {
    val agg = udaf(new GramAgg(d))
    val buf = corpus.agg(agg(col("vq")).as("buf"))
      .head().getSeq[Long](0)
    val tri = d * (d + 1) / 2
    val model0 = PcaModel(d, buf(tri + d), buf.slice(tri, tri + d),
      buf.slice(0, tri), Nil)
    // scaled covariance |c| <= 1e6, then w0 = diagonal (PSD: non-negative,
    // generically non-orthogonal to the dominant eigenvector)
    val flat = Array.tabulate(d * d)(i => model0.ncov(i / d, i % d))
    model0.copy(w = powerIterate(flat, d, iters).toSeq)
  }

  /** The fixed-count integer power iteration over a flattened d×d matrix:
    * one |c| ≤ 10⁶ rescale, diagonal start, `iters` mat-vec sweeps each
    * followed by a |w| ≤ 10⁵ rescale (all truncation toward zero).
    */
  private def powerIterate(flat: Array[Long], d: Int, iters: Int): Array[Long] = {
    val cs = rescale(flat, 1000000L)
    var w = Array.tabulate(d)(j => cs(j * d + j))
    var t = 0
    while (t < iters) {
      val m = Array.tabulate(d) { j =>
        var acc = 0L
        var k = 0
        while (k < d) { acc += cs(j * d + k) * w(k); k += 1 }
        acc
      }
      w = rescale(m, 100000L)
      t += 1
    }
    w
  }

  /** Coordinate sums + count in one pass — the cheap first pass of the
    * shifted (two-pass) fit. Buffer: `[0, d)` sums, `[d]` count.
    */
  private final class SumsAgg(d: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    def zero: Array[Long] = new Array[Long](d + 1)
    def reduce(b: Array[Long], row: Seq[Long]): Array[Long] = {
      var j = 0
      while (j < d) { b(j) += row(j); j += 1 }
      b(d) += 1L
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: ExpressionEncoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    def outputEncoder: ExpressionEncoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Two-pass shifted fit: `means` is the integer per-coordinate mean
    * (truncation toward zero, matching the oracle's sign-wrapped `//`);
    * `model` is the ordinary [[PcaModel]] fitted over the SHIFTED grid
    * `x − m` — its `gramUpper` is the shifted Gram, its `sums` are the
    * division residuals (|S'_j| < N), and its `ncov` equals the one-pass
    * `ncov` EXACTLY (the centered covariance is shift-invariant:
    * N·G' − S'_j·S'_k = N·G − S_j·S_k for any constant shift — expand
    * G' = G − m_k·S_j − m_j·S_k + N·m_j·m_k, S' = S − N·m and the cross
    * terms cancel). ShiftedPcaSpec pins the identity on real data AND in
    * a synthetic regime where the one-pass products wrap 64-bit.
    */
  final case class ShiftedPcaModel(means: Seq[Long], model: PcaModel)

  /** The production-scale fit: pass 1 aggregates integer means (d + 1
    * longs of state — trivially mergeable), pass 2 runs the SAME
    * [[GramAgg]] over the mean-shifted grid. Why it matters at 100 TB:
    * NOT wrap protection for ncov (ring ops make the one-pass form exact
    * mod 2⁶⁴, so it survives intermediate wraps — see the class doc and
    * ShiftedPcaSpec's falsification test), but REPRESENTABILITY of the
    * stored moments: past N²·σ² ≈ 2⁶³ the N²-scale ncov does not exist
    * in 64 bits at all, while the shifted Gram G' (≈ N·σ²·grid², factor
    * N smaller) still does — [[componentFromShiftedGram]] eigensolves on
    * it directly. Cost: one extra (cheap, sums-only) scan. In the shared
    * regime the power iteration yields the identical component because
    * ncov is identical (shift invariance).
    */
  def fitShifted(corpus: DataFrame, d: Int = 64, iters: Int = 12): ShiftedPcaModel = {
    val sumsAgg = udaf(new SumsAgg(d))
    val sbuf = corpus.agg(sumsAgg(col("vq")).as("buf"))
      .head().getSeq[Long](0)
    val n = sbuf(d)
    require(n > 0, "fitShifted: empty corpus")
    // truncation-toward-zero integer means (Scala Long `/` truncates;
    // the oracle uses the sign-wrapped `//` form so DuckDB agrees)
    val means = Array.tabulate(d) { j =>
      val s = sbuf(j); if (s < 0) -((-s) / n) else s / n
    }
    val shifted = corpus.withColumn("vq",
      zip_with(col("vq"), typedLit(means.toSeq), (x, m) => x - m))
    ShiftedPcaModel(means.toSeq, fit(shifted, d, iters))
  }

  /** Dominant direction from the SHIFTED Gram G' alone — the billion-row
    * production escape. The exact N²-scale covariance is
    * `N·G' − S'·S'ᵀ`; past N²·σ² ≈ 2⁶³ that value is unrepresentable in
    * ANY 64-bit arithmetic, but G' itself (true magnitude ≈ N·σ²·grid²,
    * a factor N smaller) still fits. Eigensolving on G' drops only the
    * rank-1 residual term, whose entries are bounded by N² (integer-mean
    * shifting leaves |S'_j| < N) — negligible against G' whenever
    * σ²·grid² ≫ 1, i.e. any non-degenerate embedding corpus. Same
    * integer power-iteration machinery, same rescale law.
    */
  def componentFromShiftedGram(sh: ShiftedPcaModel, iters: Int = 12): Seq[Long] = {
    val d = sh.model.d
    val flat = Array.tabulate(d * d)(i => sh.model.gram(i / d, i % d))
    powerIterate(flat, d, iters).toSeq
  }

  /** Merge two fitted models over disjoint corpus slices: Gram, sums and
    * count are all plain sums, so the merged moments equal a single fit
    * over the union — the incremental-maintenance law that lets a daily
    * ingest update the covariance without rescanning history. The
    * eigenvector is NOT merged (re-run the iteration on the merged
    * moments when a fresh direction is needed); `w` is dropped.
    */
  def merge(a: PcaModel, b: PcaModel): PcaModel = {
    require(a.d == b.d, s"dimension mismatch ${a.d} vs ${b.d}")
    PcaModel(a.d, a.n + b.n,
      a.sums.zip(b.sums).map { case (x, y) => x + y },
      a.gramUpper.zip(b.gramUpper).map { case (x, y) => x + y }, Nil)
  }

  /** The (j, k, g, ncov) upper-triangle rows of the fitted Gram/covariance
    * as a local frame — j ≤ k, 0-based.
    */
  def gramRows(spark: SparkSession, model: PcaModel): DataFrame = {
    import spark.implicits._
    (for { j <- 0 until model.d; k <- j until model.d }
      yield (j.toLong, k.toLong, model.gram(j, k), model.ncov(j, k)))
      .toDF("j", "k", "g", "ncov")
  }

  /** The fitted integer eigenvector as (pos, w) rows. */
  def componentRows(spark: SparkSession, model: PcaModel): DataFrame =
    componentRows(spark, model.w)

  /** Any integer direction as (pos, w) rows (e.g. the
    * [[componentFromShiftedGram]] result).
    */
  def componentRows(spark: SparkSession, w: Seq[Long]): DataFrame = {
    import spark.implicits._
    w.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("pos", "w")
  }

  /** Map-side projection onto the integer component: `y = Σ_j vq_j·w_j`
    * (a broadcast-literal d-length integer dot per row — no shuffle).
    */
  def project(corpus: DataFrame, model: PcaModel): DataFrame =
    corpus.withColumn("y",
      graft.plans.QuantizedDot.qdot(col("vq"), typedLit(model.w)))
}
