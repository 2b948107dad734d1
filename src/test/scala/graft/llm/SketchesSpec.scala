package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def values(group: String, n: Int, salt: String) =
    (0 until n).map(i => (group, s"$salt-$i")).toDF("g", "v")

  test("estimate lands within the 512-register error envelope above 2.5m") {
    // 3σ of the raw estimator's 1.04/√512 ≈ 4.6% standard error ≈ 14%
    for (n <- Seq(2000, 20000)) {
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(values("a", n, "x"), "g", "v"), "g")
        .select("hll_estimate").as[Double].head()
      assert(math.abs(est - n) / n < 0.14, s"n=$n est=$est")
    }
  }

  test("small range flags itself and occupancy is the near-exact reading") {
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(values("a", 100, "s"), "g", "v"), "g")
      .select("small_range", "n_occupied").as[(Boolean, Long)].head()
    assert(est._1) // raw estimator reads ~alpha*m here, flagged
    assert(math.abs(est._2 - 100L) <= 15L) // collisions < 10% at n << m
  }

  test("merged registers equal the sketch of the union (mergeability)") {
    val a = values("a", 5000, "left")
    val b = values("b", 5000, "right") // overlap via same salt tail
    val regsSplit = Sketches.hllRegisters(a.unionByName(b), "g", "v")
    val merged = Sketches.hllMerge(regsSplit, "g", "u")
      .select("bucket", "reg")
    val direct = Sketches.hllRegisters(
      a.unionByName(b).withColumn("g", lit("u")), "g", "v")
      .select("bucket", "reg")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("registers are deterministic under repartitioning") {
    val df = values("a", 3000, "p")
    val r1 = Sketches.hllRegisters(df, "g", "v").select("bucket", "reg")
    val r2 = Sketches.hllRegisters(df.repartition(17), "g", "v")
      .select("bucket", "reg")
    assert(r1.exceptAll(r2).isEmpty && r2.exceptAll(r1).isEmpty)
  }

  test("ranks stay in [1, 52] and buckets in [0, 512)") {
    val regs = Sketches.hllRegisters(values("a", 10000, "q"), "g", "v")
    assert(regs.filter(col("reg") < 1 || col("reg") > 52).count() == 0)
    assert(regs.filter(col("bucket") < 0 || col("bucket") >= 512).count() == 0)
  }
}
