package graft.llm

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PCA contract: the one-pass Gram aggregator, the exact-integer power
  * iteration, and the projection all replay in straight-line Scala, and
  * the fitted direction's Rayleigh quotient reaches ≥ 0.9·λ1 (the honest
  * quality bar on a near-isotropic spectrum, where eigenvector ALIGNMENT
  * converges at the λ2/λ1 rate and is unreachable in fixed sweeps).
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"
  def emb = Tables(spark, dir, "embeddings")

  private def grid(): Array[Array[Long]] =
    Ann.withQuantized(emb, "embedding").select(col("vq"))
      .collect().map(_.getSeq[Long](0).toArray)

  private def rescale(v: Array[Long], target: Long): Array[Long] = {
    val mx = v.map(math.abs).max
    val sc = mx / target + 1
    v.map(x => if (x < 0) -((-x) / sc) else x / sc)
  }

  /** Straight-line replay of fit()'s integer pipeline. */
  private def replayFit(x: Array[Array[Long]], iters: Int)
      : (Array[Array[Long]], Array[Long], Array[Long]) = {
    val d = x.head.length
    val n = x.length.toLong
    val gram = Array.ofDim[Long](d, d)
    val sums = new Array[Long](d)
    x.foreach { row =>
      var j = 0
      while (j < d) {
        var k = 0
        while (k < d) { gram(j)(k) += row(j) * row(k); k += 1 }
        sums(j) += row(j)
        j += 1
      }
    }
    val ncov = Array.tabulate(d, d)((j, k) => n * gram(j)(k) - sums(j) * sums(k))
    val cs = rescale(Array.tabulate(d * d)(i => ncov(i / d)(i % d)), 1000000L)
    var w = Array.tabulate(d)(j => cs(j * d + j))
    (1 to iters).foreach { _ =>
      w = rescale(Array.tabulate(d) { j =>
        (0 until d).map(k => cs(j * d + k) * w(k)).sum
      }, 100000L)
    }
    (ncov, sums, w)
  }

  test("gram aggregator + power iteration + projection replay in " +
    "straight-line Scala; gram is symmetric-consistent") {
    val corpus = Ann.withQuantized(emb, "embedding")
    val model = Pca.fit(corpus, d = 64)
    val x = grid()
    val (ncov, sums, w) = replayFit(x, 12)
    assert(model.n == x.length.toLong)
    assert(model.sums == sums.toSeq)
    (0 until 64).foreach { j =>
      (j until 64).foreach { k =>
        assert(model.ncov(j, k) == ncov(j)(k), s"ncov($j,$k)")
        assert(model.ncov(k, j) == ncov(j)(k), s"symmetric($j,$k)")
      }
    }
    assert(model.w == w.toSeq)
    // projection: one integer dot per row
    val proj = Pca.project(corpus, model)
      .select(col("vec_id"), col("y")).as[(Long, Long)].collect().toMap
    val byId = Ann.withQuantized(emb, "embedding")
      .select(col("vec_id"), col("vq")).as[(Long, Seq[Long])].collect()
    byId.foreach { case (id, vq) =>
      assert(proj(id) == vq.indices.map(j => vq(j) * w(j)).sum, s"y($id)")
    }
  }

  test("quality: Rayleigh quotient is non-decreasing across sweep counts " +
    "and reaches >= 0.9 of the dominant eigenvalue") {
    val x = grid()
    val d = x.head.length
    val (ncov, _, _) = replayFit(x, 1)
    val c = ncov.map(_.map(_.toDouble))
    def rayleigh(w: Array[Long]): Double = {
      val wd = w.map(_.toDouble)
      val cw = Array.tabulate(d)(j => (0 until d).map(k => c(j)(k) * wd(k)).sum)
      wd.zip(cw).map { case (a, b) => a * b }.sum /
        wd.map(v => v * v).sum
    }
    // reference lambda1: long double-precision power iteration
    var v = Array.fill(d)(1.0)
    (1 to 400).foreach { _ =>
      val nv = Array.tabulate(d)(j => (0 until d).map(k => c(j)(k) * v(k)).sum)
      val mx = nv.map(math.abs).max
      v = nv.map(_ / mx)
    }
    val l1 = {
      val cv = Array.tabulate(d)(j => (0 until d).map(k => c(j)(k) * v(k)).sum)
      v.zip(cv).map { case (a, b) => a * b }.sum / v.map(x => x * x).sum
    }
    val rs = Seq(1, 2, 4, 8, 12).map(i => rayleigh(replayFit(x, i)._3))
    rs.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"rayleigh not monotone: $rs")
    }
    assert(rs.last >= 0.9 * l1, s"rayleigh ${rs.last} < 0.9 * $l1")
  }

  test("merge associativity: fit on a union equals the elementwise sum " +
    "of per-half fits (the mergeable-aggregator contract)") {
    val corpus = Ann.withQuantized(emb, "embedding")
    val whole = Pca.fit(corpus, d = 64, iters = 1)
    val a = Pca.fit(corpus.filter(col("vec_id") % 2 === 0), d = 64, iters = 1)
    val b = Pca.fit(corpus.filter(col("vec_id") % 2 === 1), d = 64, iters = 1)
    assert(whole.n == a.n + b.n)
    assert(whole.sums == a.sums.zip(b.sums).map { case (x, y) => x + y })
    assert(whole.gramUpper ==
      a.gramUpper.zip(b.gramUpper).map { case (x, y) => x + y })
  }

  test("property sweep: random corpora with a constant dim and negative " +
    "extremes — centering zeroes the flat dim's covariance row") {
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { trial =>
      val d = 4 + rnd.nextInt(5)
      val n = 10 + rnd.nextInt(20)
      val rows = (0 until n).map { i =>
        (i.toLong, (0 until d).map { j =>
          if (j == 0) 13L // constant dim: ncov row 0 must be all zero
          else rnd.nextLong() % 300L
        })
      }
      val df = rows.toDF("vec_id", "vq")
      val model = Pca.fit(df, d = d, iters = 4)
      val x = rows.map(_._2.toArray).toArray
      val (ncov, _, w) = replayFit(x, 4)
      (0 until d).foreach { k =>
        assert(model.ncov(0, k) == 0L, s"trial $trial flat-dim cov($k)")
        assert(ncov(0)(k) == 0L)
      }
      assert(model.w == w.toSeq, s"trial $trial w")
    }
  }
}
