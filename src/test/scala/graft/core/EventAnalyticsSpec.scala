package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("funnel: strict ordering, per-user stage, out-of-order excluded") {
    val ev = Seq(
      // user 1 completes in order
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      // user 2: purchase BEFORE click → stage 2 only
      (2L, 100L, "view"), (2L, 150L, "purchase"), (2L, 200L, "click"),
      // user 3: click only, never viewed → not in funnel at all
      (3L, 100L, "click"),
      // user 4: view at same ts as click → strict > excludes the click
      (4L, 100L, "view"), (4L, 100L, "click"))
      .toDF("user_id", "ts_us", "event_type")
    val out = EventAnalytics.funnel(ev, "user_id", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("stage"), r.isNullAt(2), r.isNullAt(3))).toMap
    assert(out(1L) === ((3L, false, false)))
    assert(out(2L) === ((2L, false, true)))
    assert(!out.contains(3L))
    assert(out(4L) === ((1L, true, true)))
  }

  test("retention: cohort by first day, offsets count distinct users") {
    val us = 86400000000L
    val ev = Seq(
      (1L, 0L), (1L, 1L * us), (1L, 1L * us + 5L), // day 0 cohort, active d0,d1
      (2L, 0L), (2L, 2L * us),                     // day 0 cohort, active d0,d2
      (3L, 1L * us))                               // day 1 cohort
      .toDF("user_id", "ts_us")
    val out = EventAnalytics.retention(ev, "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0L, 0L)) === 2L) // both day-0 users at offset 0
    assert(out((0L, 1L)) === 1L) // duplicate same-day events count once
    assert(out((0L, 2L)) === 1L)
    assert(out((1L, 0L)) === 1L)
    assert(out.size === 4)
  }

  test("sigma outliers: hand-computed 2-sigma verdicts, no floats") {
    // group a: nine 10s and one 100 — mean 19, sigma 27, dev 81 > 2*27
    val a = (Seq.fill(9)(10L) :+ 100L).map(("a", _))
    // group b: constant — zero variance, dev_n = 0, 0 > 0 is false
    val b = Seq.fill(4)(("b", 7L))
    val counts = (a ++ b).toDF("g", "x")
    val out = EventAnalytics.sigmaOutliers(counts, "g", "x", 2)
      .select("g", "x", "dev_n", "anomalous")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(out.filter(_._4) == Seq(("a", 100L, 810L, true)))
    assert(out.count(r => r._1 == "a" && !r._4) == 9)
    assert(out.filter(_._1 == "b").forall(r => r._3 == 0L && !r._4))
  }

  test("sigma outliers: the 4-plus-1 shape sits EXACTLY at 2 sigma (strict)") {
    // four equal values + one outlier is always exactly 2 sigma away,
    // so the strict inequality must NOT flag it — pins the boundary
    val counts = (Seq.fill(4)(10L) :+ 60L).map(("g", _)).toDF("g", "x")
    val out = EventAnalytics.sigmaOutliers(counts, "g", "x", 2)
    assert(out.filter(col("anomalous")).count() == 0)
  }

  test("sigma outliers: x·n past 2^63 rides decimal, verdicts stay exact") {
    // ten members at x = 9.5e17: x·n = 9.5e18 > 2^63 wraps a plain long
    // multiply and would corrupt every verdict, while the decimal
    // algebra still fits (n·ΣX² ≈ 9e37 < 10^38); the one deviant
    // member must be the only flag
    val big = 950000000000000000L
    val counts = ((Seq.fill(9)(big) :+ (big + 1000000L)).map(("g", _)))
      .toDF("g", "x")
    val out = EventAnalytics.sigmaOutliers(counts, "g", "x", 2)
      .select("x", "dev_n", "anomalous")
      .as[(Long, Long, Boolean)].collect().toSeq
    // dev_n for the deviant: x·n − S = (big+1e6)·10 − (9·big + big+1e6)
    // = 9·1e6; for the others: −1e6 each
    assert(out.filter(_._3) == Seq((big + 1000000L, 9000000L, true)))
    assert(out.count(r => r._1 == big && r._2 == -1000000L && !r._3) == 9)
  }
}
