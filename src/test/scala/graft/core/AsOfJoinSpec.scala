package graft.core

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("union-window as-of join equals the naive inequality-join form") {
    val e = Tables(spark, dir, "events")
      .withColumn("ts_us", expr("ts_ns div 1000"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts_us").as("v_ts"),
        col("event_id").as("view_event_id"))
    val fast = AsOfJoin.asOfJoin(purchases,
      views.select(col("v_user").as("user_id"), col("v_ts").as("ts_us"),
        col("view_event_id")),
      "user_id", "ts_us", "ts_us", Seq("view_event_id"))
    // naive: every (purchase, prior-view) pair, keep the (ts, payload)-max
    val naive = purchases
      .join(views, col("user_id") === col("v_user") &&
        col("v_ts") <= col("ts_us"), "left")
      .groupBy(col("event_id"), col("user_id"), col("ts_us"))
      .agg(max(struct(col("v_ts"), col("view_event_id"))).as("m"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("m.v_ts").as("asof_ts"), col("m.view_event_id"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("tie rules: equal-ts right matches unless strict") {
    val left = Seq((1L, 100L, "l1")).toDF("k", "ts", "lv")
    val right = Seq((1L, 100L, "same"), (1L, 50L, "older")).toDF("k", "ts", "rv")
    val loose = AsOfJoin.asOfJoin(left, right, "k", "ts", "ts", Seq("rv"))
      .select("rv").as[String].collect()
    val strict = AsOfJoin.asOfJoin(left, right, "k", "ts", "ts", Seq("rv"),
      strict = true).select("rv").as[String].collect()
    assert(loose.toSeq == Seq("same"))
    assert(strict.toSeq == Seq("older"))
  }

  test("duplicate right rows on one instant collapse to the struct-max payload") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 5L, "a"), (1L, 5L, "z"), (1L, 5L, "m"))
      .toDF("k", "ts", "rv")
    val out = AsOfJoin.asOfJoin(left, right, "k", "ts", "ts", Seq("rv"))
    assert(out.select("rv").as[String].collect().toSeq == Seq("z"))
  }

  test("left rows with no prior right keep null payload") {
    val left = Seq((1L, 10L), (2L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 20L, "future")).toDF("k", "ts", "rv")
    val out = AsOfJoin.asOfJoin(left, right, "k", "ts", "ts", Seq("rv"))
    assert(out.count() == 2)
    assert(out.filter(col("asof_ts").isNull).count() == 2)
  }

  test("NULL keys never match — SQL equi-join semantics, both sides") {
    val left = Seq((Option(1L), 10L), (Option.empty[Long], 10L))
      .toDF("k", "ts")
    val right = Seq((Option(1L), 5L, "a"), (Option.empty[Long], 5L, "ghost"))
      .toDF("k", "ts", "rv")
    val out = AsOfJoin.asOfJoin(left, right, "k", "ts", "ts", Seq("rv"))
    assert(out.count() == 2) // left-join: the NULL-key left row survives
    val nullRow = out.filter(col("k").isNull)
    assert(nullRow.filter(col("rv").isNotNull).count() == 0,
      "a NULL-key left row must not receive the NULL-key right payload")
    assert(out.filter(col("k") === 1L).select("rv").as[String].head() == "a")
  }

  test("plan shape: exactly ONE Exchange — the key partition, nothing else") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 5L, "a")).toDF("k", "ts", "rv")
    val plan = AsOfJoin.asOfJoin(left, right, "k", "ts", "ts", Seq("rv"))
      .queryExecution.executedPlan.toString
    val exchanges = "(?m)^\\s*[+:*-]*\\s*Exchange ".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected the single key shuffle, got $exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"as-of must not plan a join:\n$plan")
  }

  test("result is invariant under input partitioning") {
    val left = Tables(spark, dir, "events")
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val right = Tables(spark, dir, "events")
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id").as("vid"))
    val a = AsOfJoin.asOfJoin(left, right, "user_id", "ts_us", "ts_us", Seq("vid"))
    val b = AsOfJoin.asOfJoin(left.repartition(13), right.repartition(7),
      "user_id", "ts_us", "ts_us", Seq("vid"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
