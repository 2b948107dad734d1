package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def z(x: Long, y: Long): Long =
    Seq((x, y)).toDF("x", "y")
      .select(Layout.zValue16(col("x"), col("y")).as("z"))
      .as[Long].head()

  test("interleave matches hand-computed Morton codes") {
    assert(z(0L, 0L) == 0L)
    assert(z(1L, 0L) == 1L) // x occupies even bits
    assert(z(0L, 1L) == 2L) // y occupies odd bits
    assert(z(3L, 0L) == 5L) // 0b11 -> 0b0101
    assert(z(0L, 3L) == 10L) // 0b11 -> 0b1010
    assert(z(65535L, 65535L) == 0xFFFFFFFFL) // full 32 bits set
    // 0b101 x / 0b011 y -> bits x:0,2,4 even slots, y:0,1 odd slots
    assert(z(5L, 3L) == ((1L << 0) | (1L << 4) | (1L << 1) | (1L << 3)))
  }

  test("out-of-range dimensions fail loudly instead of aliasing") {
    val bad = Seq((65536L, 0L)).toDF("x", "y")
    assertThrows[Exception] {
      bad.select(Layout.zValue16(col("x"), col("y"))).collect()
    }
  }

  test("cells bound both dimensions: span < 2^(16-prefixBits) everywhere") {
    // adversarial spread: values crossing every octave in both dims
    val d = (0 until 4000).map { i =>
      (((i.toLong * 2654435761L) % 65536L + 65536L) % 65536L,
        ((i.toLong * 40503L) % 65536L + 65536L) % 65536L)
    }.toDF("x", "y")
    for (k <- Seq(3, 5, 8)) {
      val stats = Layout.zLayoutStats(d, "x", "y", k)
      assert(stats.filter(!col("bounded")).count() == 0, s"prefixBits=$k")
      val side = 1L << (16 - k)
      val worst = stats.agg(max(greatest(col("x_span"), col("y_span"))))
        .as[Long].head()
      assert(worst < side)
    }
  }

  test("z cells refine: a 2k-bit cell nests inside its k-bit parent") {
    val d = (0 until 500).map(i =>
      ((i.toLong * 123L) % 65536L, (i.toLong * 457L) % 65536L)).toDF("x", "y")
    val both = d.select(Layout.zCell(col("x"), col("y"), 4).as("p"),
      Layout.zCell(col("x"), col("y"), 8).as("c"))
    // child cell id right-shifted by the extra bits IS the parent id
    assert(both.filter(expr("p != shiftright(c, 8)")).count() == 0)
  }

  test("zValue16 stays inside whole-stage codegen") {
    // local Seq relations collapse to LocalTableScan (never codegen'd);
    // a range source exercises the real projection path
    val d = spark.range(100)
      .select((col("id") % 65536L).as("x"), (col("id") % 1024L).as("y"))
    val plan = d.select(Layout.zValue16(col("x"), col("y")).as("z"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix is the WholeStageCodegen marker in simple-mode
    // plan strings; an interpreted projection would print bare `Project`
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
  }
}
