package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"

  /** Run `f` with AQE off (plain FileSourceScanExec trees for
    * partition-pruning assertions), restoring whatever value the shared
    * session HAD — the loan pattern both pruned-scan specs previously
    * copy-pasted (and drifted on).
    */
  def withAqeDisabled[T](f: => T): T = {
    val before = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f
    finally before match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}

class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs non-empty on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every query has matching column names with its oracle alias contract") {
    // Sanity: each oracleSql key exists in queries.
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracleSql key $k missing from queries")
    }
  }

  test("q1_agg aggregates are exact decimals cast to double") {
    val df = SparkEntry.queries("q1_agg")(spark, TestSpark.sf)
    val schema = df.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("revenue") == "double")
    assert(schema("n_orders") == "long")
  }
}
