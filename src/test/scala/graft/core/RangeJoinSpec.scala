package graft.core

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  def intervals = Seq(
    (1L, 0L, 100L), (2L, 50L, 60L), (3L, 90L, 250L), (4L, 300L, 300L),
    (5L, 400L, 350L)).toDF("iid", "lo", "hi")
  def points = Seq(0L, 49L, 50L, 59L, 60L, 99L, 100L, 249L, 250L, 299L,
    300L, 350L).toDF("p")

  test("bucketized join equals crossJoin+filter; half-open boundaries") {
    val naive = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "iid", "lo", "hi")
    val fast = RangeJoin.pointInInterval(points, "p", intervals,
      "lo", "hi", bucketWidth = 7L).select("p", "iid", "lo", "hi")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    // point at hi excluded, at lo included; empty/inverted intervals gone
    assert(fast.filter(col("iid").isin(4L, 5L)).count() == 0)
  }

  test("result is invariant under bucket width") {
    val w7 = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 7L)
      .select("p", "iid")
    for (w <- Seq(1L, 13L, 100L, 1000000L)) {
      val other = RangeJoin.pointInInterval(points, "p", intervals,
        "lo", "hi", w).select("p", "iid")
      assert(w7.exceptAll(other).isEmpty && other.exceptAll(w7).isEmpty,
        s"width $w diverged")
    }
  }

  test("negative coordinates bucket correctly (floor-div, not truncate)") {
    // interval straddling 0 and intervals fully below 0: truncating div
    // would put lo=-5 and pt=-3 in different cells and drop the match
    val neg = Seq((10L, -5L, 5L), (11L, -20L, -10L), (12L, -100L, -90L))
      .toDF("iid", "lo", "hi")
    val pts = Seq(-15L, -5L, -3L, -1L, 0L, 3L, -95L, -90L).toDF("p")
    val naive = pts.crossJoin(neg)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "iid")
    for (w <- Seq(3L, 7L, 50L)) {
      val fast = RangeJoin.pointInInterval(pts, "p", neg, "lo", "hi", w)
        .select("p", "iid")
      assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
        s"width $w diverged on negative coords")
    }
  }

  test("plan shape: an equi hash join on the cell, never a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must stay an equi join on the grid cell:\n$plan")
    assert(plan.contains("HashJoin"), s"expected a hash join:\n$plan")
  }

  test("events-vs-derived-windows matches inequality join at sf0.001") {
    val e = Tables(spark, dir, "events")
      .select(expr("ts_ns div 1000").as("ts_us"), col("event_id"))
    val t0 = e.agg(min(col("ts_us")).as("t0")).head().getLong(0)
    val win = (0L until 48L).map(i =>
      (i, t0 + i * 3600000000L, t0 + i * 3600000000L + 1200000000L))
      .toDF("wid", "lo", "hi")
    val naive = e.crossJoin(win)
      .filter(col("ts_us") >= col("lo") && col("ts_us") < col("hi"))
      .groupBy("wid").agg(count(lit(1)).as("n"))
    val fast = RangeJoin.pointInInterval(e, "ts_us", win, "lo", "hi",
      600000000L).groupBy("wid").agg(count(lit(1)).as("n"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }
}
