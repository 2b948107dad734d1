package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IntervalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scd2 collapses runs and closes versions at the next run start") {
    val log = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "a", 2L), // dup collapses
      (1L, 30L, "b", 3L), (1L, 40L, "a", 4L), // a reappears = new run
      (2L, 10L, "x", 5L))
      .toDF("k", "ts", "state", "id")
    val out = Intervals.scd2(log, "k", "ts", "state", "id")
      .orderBy("k", "version_n")
      .select("k", "state", "valid_from", "valid_to", "version_n")
      .as[(Long, String, Long, Option[Long], Long)].collect().toSeq
    assert(out == Seq(
      (1L, "a", 10L, Some(30L), 1L),
      (1L, "b", 30L, Some(40L), 2L),
      (1L, "a", 40L, None, 3L),
      (2L, "x", 10L, None, 1L)))
  }

  test("scd2 breaks same-instant ties by the tie column") {
    val log = Seq((1L, 10L, "a", 2L), (1L, 10L, "b", 1L))
      .toDF("k", "ts", "state", "id")
    val out = Intervals.scd2(log, "k", "ts", "state", "id")
      .orderBy("version_n").select("state", "version_n")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("b", 1L), ("a", 2L))) // id=1 first
  }

  test("scd2 treats NULL as a real state value") {
    val log = Seq(
      (1L, 10L, Some("a"), 1L), (1L, 20L, None, 2L),
      (1L, 30L, None, 3L), (1L, 40L, Some("a"), 4L))
      .toDF("k", "ts", "state", "id")
    val out = Intervals.scd2(log, "k", "ts", "state", "id")
      .orderBy("version_n").select("state", "valid_from")
      .as[(Option[String], Long)].collect().toSeq
    // a / NULL-run (collapsed) / a again
    assert(out == Seq((Some("a"), 10L), (None, 20L), (Some("a"), 40L)))
  }

  test("interval merge: overlap, touch, nested, and gaps — half-open") {
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 8L),   // nested inside [0,10)
      (1L, 10L, 15L),                // touches 10: [lo,hi) chains -> same island? lo==max_hi -> NOT > -> merges
      (1L, 20L, 30L), (1L, 22L, 40L), // overlap extends
      (1L, 50L, 60L),                // gap -> new island
      (2L, 0L, 1L))
      .toDF("k", "lo", "hi")
    val out = Intervals.mergeIntervals(iv, "k", "lo", "hi")
      .orderBy("k", "island")
      .select("k", "island", "lo", "hi", "n_merged")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 0L, 15L, 3L),
      (1L, 2L, 20L, 40L, 2L),
      (1L, 3L, 50L, 60L, 1L),
      (2L, 1L, 0L, 1L, 1L)))
  }

  test("interval merge: running max catches a long span hiding early") {
    // [0,100) opens; later short intervals all sit inside it — a
    // lag-only detector would split at [20,25) vs prev hi 15
    val iv = Seq((1L, 0L, 100L), (1L, 10L, 15L), (1L, 20L, 25L),
      (1L, 99L, 120L), (1L, 121L, 130L)).toDF("k", "lo", "hi")
    val out = Intervals.mergeIntervals(iv, "k", "lo", "hi")
      .orderBy("island").select("island", "lo", "hi", "n_merged")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L, 120L, 4L), (2L, 121L, 130L, 1L)))
  }

  test("results are invariant under input partitioning") {
    val iv = (0 until 500).map { i =>
      (i.toLong % 7, (i.toLong * 13) % 400, (i.toLong * 13) % 400 + 20L)
    }.toDF("k", "lo", "hi")
    val a = Intervals.mergeIntervals(iv, "k", "lo", "hi")
    val b = Intervals.mergeIntervals(iv.repartition(13), "k", "lo", "hi")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
