package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the scan-efficiency contract the whole engine leans on: filters
  * REACH the parquet reader (PushedFilters) and projections PRUNE the
  * read schema (ReadSchema) — the difference between scanning 2 columns
  * and scanning 16 at 100 TB. Plan-string pinned so a refactor that
  * breaks pushdown (a UDF in the predicate, a schema-widening helper)
  * fails loudly instead of silently scanning everything.
  */
class ScanPushdownSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val dir = "/root/testdata/sf0.001"

  test("filters push down to the parquet scan") {
    val plan = Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 30.0 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), s"no pushdown section:\n$plan")
    // the plan string elides the tail of long filter lists ("EqualTo(l_r…")
    // — assert on entries that appear before the truncation point
    assert(plan.contains("GreaterThanOrEqual(l_quantity,30.0)"),
      s"quantity filter not pushed:\n$plan")
    assert(plan.contains("IsNotNull(l_returnflag)"),
      s"returnflag filter not pushed:\n$plan")
  }

  test("projection prunes the read schema to the selected columns") {
    val plan = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_quantity"), s"missing columns: $readSchema")
    // none of the wide columns survive into the scan
    for (c <- Seq("l_comment", "l_shipdate", "l_extendedprice"))
      assert(!readSchema.contains(c), s"$c not pruned: $readSchema")
  }

  test("documents text column is pruned when a query only needs ids") {
    val plan = Tables(spark, dir, "documents").select("doc_id", "source")
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema:")).getOrElse("")
    assert(!readSchema.contains("text"), s"text not pruned: $readSchema")
  }
}
