package graft.plans

import graft.TestSpark
import graft.llm.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale-safe bounded top-k aggregate against a straight-line
  * Scala replay of its contract (rank by (h64(id), id) per domain, keep
  * the first `cap`): on a deliberately SKEWED fixture (one domain holding
  * ~90% of rows — exactly the shape that would make a per-domain sort
  * window a straggler at scale) the aggregate must reproduce the replay's
  * keep set and ranks exactly, with NULL rank beyond the cap.
  */
class TopKPairsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def skewed = {
    // 2000 rows: ids 0..1799 land on hot.example.com, the rest spread
    // over 5 cold domains — hot ≫ cold, the perDomainCap stress shape
    (0L until 2000L).map { id =>
      val dom = if (id < 1800) "hot.example.com" else s"cold${id % 5}.net"
      (id, dom)
    }.toDF("doc_id", "domain")
  }

  test("perDomainCapAgg ≡ straight-line (h64, id) rank replay, skewed") {
    val cap = 25
    // force many input partitions so partial buffers merge across tasks
    // (exercises serialize/deserialize + merge, not just one update loop)
    val df = skewed.repartition(16)
    // independent expectation: per-domain sort by (h64(id), id) in plain
    // Scala, rank 1..cap kept, NULL rank beyond
    val hashed = df
      .select(col("doc_id"), col("domain"),
        TextOps.h64c(col("doc_id").cast("string")).as("h"))
      .as[(Long, String, Long)].collect()
    val w = hashed.groupBy(_._2).toSeq.flatMap { case (dom, rows) =>
      rows.sortBy(r => (r._3, r._1)).zipWithIndex.map { case ((id, _, _), i) =>
        val rank = if (i < cap) Some(i + 1L) else None
        (id, dom, rank, i < cap)
      }
    }.sortBy(_._1)
    val agg = TextOps.perDomainCapAgg(df, "doc_id", "domain", cap)
      .select(col("doc_id"), col("domain"), col("domain_rank"), col("kept"))
    val a = agg.as[(Long, String, Option[Long], Boolean)].collect().sortBy(_._1)
    assert(a.length == 2000)
    assert(a.toSeq == w)
    // the cap must actually bind on the hot domain
    assert(a.count(r => r._2 == "hot.example.com" && r._4) == cap)
    assert(a.count(r => r._2 == "hot.example.com" && !r._4) == 1800 - cap)
    // plan shape: the scale-safe form must contain NO Window operator —
    // ranks come from the bounded partial aggregate + posexplode; a
    // regression back to a per-domain sort window re-creates exactly the
    // hot-domain straggler this operator exists to avoid
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"perDomainCapAgg plan regressed to a window:\n$plan")
  }

  test("cap larger than every group keeps everything, ranked") {
    val df = skewed.filter(col("doc_id") >= 1800) // only cold domains, ≤ 40 each
    val agg = TextOps.perDomainCapAgg(df, "doc_id", "domain", 100)
    assert(agg.filter(!col("kept")).count() == 0)
    assert(agg.filter(col("domain_rank").isNull).count() == 0)
    // ranks are 1..n within each domain
    val perDom = agg.groupBy(col("domain"))
      .agg(count(lit(1)).as("n"), max(col("domain_rank")).as("mx"),
        min(col("domain_rank")).as("mn"))
      .as[(String, Long, Long, Long)].collect()
    assert(perDom.forall(r => r._3 == r._2 && r._4 == 1L))
  }

  test("topkPairs keeps the k smallest (ord, id) with exact tie-break") {
    // duplicate ord values force the id tie-break; k cuts inside a tie run
    val df = Seq(
      (10L, 5L), (10L, 3L), (10L, 4L), (7L, 9L), (7L, 1L), (99L, 0L)
    ).toDF("o", "i").withColumn("g", lit("all"))
    val got = df.groupBy(col("g"))
      .agg(TopKPairs.topkPairs(col("o"), col("i"), 4).as("top"))
      .select(explode(col("top")))
      .select(col("col.ord"), col("col.id"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((7L, 1L), (7L, 9L), (10L, 3L), (10L, 4L)))
  }

  test("null ord or id rows are skipped, not kept or crashed on") {
    val df = Seq(
      (Some(1L), Some(1L)), (None, Some(2L)), (Some(2L), None), (Some(3L), Some(3L))
    ).toDF("o", "i").withColumn("g", lit("all"))
    val got = df.groupBy(col("g"))
      .agg(TopKPairs.topkPairs(col("o"), col("i"), 10).as("top"))
      .select(size(col("top"))).as[Int].head()
    assert(got == 2)
  }
}
