package graft.core

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("salted join result equals the plain join") {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    val plain = li.join(o, Seq("l_orderkey")).groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    val salted = Skew.saltedJoin(li, o, "l_orderkey", saltFactor = 8)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salted collect_set equals direct collect_set") {
    val li = Tables(spark, dir, "lineitem")
    val direct = li.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("s"))
      .select(col("l_orderkey"), col("s"))
    val salted = Skew.saltedCollectSet(li, "l_orderkey", "l_partkey", 8)
      .select(col("l_orderkey"), sort_array(col("l_partkey_set")).as("s"))
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }
}
