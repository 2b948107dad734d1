package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("splits on gap strictly greater than gapUs; ties break by event id") {
    // user 1: events at 0s, 10s, 10s+gap (boundary — SAME session,
    // gap must be strictly exceeded), then +gap+1us (new session)
    val gap = 60000000L // 60 s
    val ev = Seq(
      (1L, 1L, 0L, 1.25),
      (1L, 2L, 10000000L, 2.50),
      (1L, 3L, 10000000L + gap, 0.25),
      (1L, 4L, 10000000L + gap + gap + 1L, 4.00),
      (2L, 5L, 5L, 10.00))
      .toDF("user_id", "event_id", "ts_us", "value")
    val out = Sessionize.sessionize(ev, "user_id", "event_id", "value", gap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))).toMap
    // user 1 session 1: events 1,2,3 (boundary kept), total 4.0
    assert(out((1L, 1L)) === ((3L, 0L, 10000000L + gap, 10000000L + gap, 4.0)))
    // user 1 session 2: event 4 alone
    assert(out((1L, 2L))._1 === 1L)
    assert(out((2L, 1L)) === ((1L, 5L, 5L, 0L, 10.0)))
    // partitioning invariance
    val again = Sessionize.sessionize(ev.repartition(5), "user_id",
      "event_id", "value", gap).collect()
    assert(again.length === out.size)
  }
}
