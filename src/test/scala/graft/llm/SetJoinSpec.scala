package graft.llm

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SetJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force reference: every pair, exact rational threshold. */
  private def brute(df: org.apache.spark.sql.DataFrame, tNum: Long,
      tDen: Long) = {
    val d = df.withColumn("ws", TextOps.words("text"))
      .withColumn("sh0", TextOps.shingles(3))
      .filter(size(col("sh0")) > 0)
      // same hashed-set universe as the operator (distinct AFTER hashing)
      .withColumn("sh",
        array_distinct(expr(s"transform(sh0, s -> ${TextOps.h64("s")})")))
      .select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("s"))
    d.select(col("doc_id").as("id_a"), col("sh").as("ta"), col("s").as("sa"))
      .crossJoin(d.select(col("doc_id").as("id_b"), col("sh").as("tb"),
        col("s").as("sb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .filter(col("inter") * tDen >=
        (col("sa") + col("sb") - col("inter")) * tNum)
      .select(col("id_a"), col("id_b"))
  }

  test("prefix-filtered join finds exactly the brute-force pair set") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    for ((tn, td) <- Seq((1L, 2L), (3L, 4L))) {
      val fast = TextOps.prefixFilterNearDups(docs, "doc_id", "text",
        3, tn, td).select("id_a", "id_b")
      val ref = brute(docs, tn, td)
      assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty,
        s"threshold $tn/$td diverged")
    }
  }

  test("a pair at exactly the threshold is kept (rational boundary)") {
    // sets of 4 shingles sharing 2: J = 2/6 = 1/3 exactly
    val docs = Seq(
      (1L, "a b c d e f"), // shingles: abc bcd cde def
      (2L, "c d e f g h")  // shingles: cde def efg fgh  -> share cde, def
    ).toDF("doc_id", "text")
    val out = TextOps.prefixFilterNearDups(docs, "doc_id", "text", 3, 1L, 3L)
    assert(out.count() == 1)
    assert(out.select("jaccard").as[Double].head() == 1.0 / 3.0)
    // one notch tighter and the pair must vanish
    assert(TextOps.prefixFilterNearDups(docs, "doc_id", "text",
      3, 34L, 100L).count() == 0)
  }

  test("disjoint documents generate no candidates at all") {
    val docs = Seq((1L, "q w e r t y"), (2L, "z x c v b n")).toDF("doc_id", "text")
    assert(TextOps.prefixFilterNearDups(docs, "doc_id", "text", 3, 1L, 2L)
      .count() == 0)
  }
}
