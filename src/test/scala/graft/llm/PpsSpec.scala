package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def weighted(n: Int) =
    (0 until n).map(i => (i.toLong, (i % 13 + 1).toLong)).toDF("id", "w")

  test("exactly n pointer hits in total, every selected doc has >= 1") {
    for (n <- Seq(1L, 7L, 50L, 200L)) {
      val out = Sampling.ppsSample(weighted(500), "id", "w", n, "s1")
      assert(out.agg(sum("n_hits")).as[Long].head() == n, s"n=$n")
      assert(out.filter(col("selected") && col("n_hits") < 1).count() == 0)
    }
  }

  test("a heavy doc (weight >= W/n) is always selected, with multiplicity") {
    val df = ((0L until 99L).map(i => (i, 1L)) :+ (99L, 200L)).toDF("id", "w")
    // W = 299, n = 10, step ~ 29: doc 99 spans ~6 pointers
    val out = Sampling.ppsSample(df, "id", "w", 10L, "s2")
    val heavy = out.filter(col("id") === 99L).select("n_hits").as[Long].head()
    assert(heavy >= 6L)
    assert(out.agg(sum("n_hits")).as[Long].head() == 10L)
  }

  test("deterministic under repartitioning; salt changes the sample") {
    val df = weighted(400)
    val a = Sampling.ppsSample(df, "id", "w", 20L, "sA")
    val b = Sampling.ppsSample(df.repartition(11), "id", "w", 20L, "sA")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val c = Sampling.ppsSample(df, "id", "w", 20L, "sB-different")
    val aSel = a.filter(col("selected")).select("id").as[Long].collect().toSet
    val cSel = c.filter(col("selected")).select("id").as[Long].collect().toSet
    assert(aSel != cSel) // overwhelmingly likely for a different salt
  }

  test("non-positive weights carry no mass and never select") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, -4L), (4L, 5L)).toDF("id", "w")
    val out = Sampling.ppsSample(df, "id", "w", 4L, "s3")
    assert(out.count() == 2) // rows 2 and 3 excluded entirely
    assert(out.agg(sum("n_hits")).as[Long].head() == 4L)
  }
}
