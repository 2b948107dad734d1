package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PmiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a glued pair tops the ranking with the hand-computed ratio") {
    // "new york" always adjacent; filler words are independent
    val docs = (0L until 40L).map { i =>
      (i, s"new york w${i % 5} w${i % 3} the the")
    }.toDF("doc_id", "text")
    val out = TextOps.pmiCollocations(docs, "doc_id", "text",
      minCount = 3L, topK = 5)
    val top = out.head()
    assert(top.getAs[String]("w1") == "new" && top.getAs[String]("w2") == "york")
    // c12=40, c1(new)=40, c1(york)=40, N=240: (40*240*1e6) div 1600
    assert(top.getAs[Long]("pmi_ratio_micro") == 40L * 240L * 1000000L / 1600L)
  }

  test("minCount prunes rare pairs") {
    val docs = Seq((1L, "rare pair"), (2L, "rare pair"), (3L, "other text"))
      .toDF("doc_id", "text")
    val out = TextOps.pmiCollocations(docs, "doc_id", "text",
      minCount = 3L, topK = 10)
    assert(out.count() == 0) // every pair occurs <= 2 times
  }

  test("single-word and empty docs contribute no pairs but count unigrams") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b a b a b")).toDF("doc_id", "text")
    val out = TextOps.pmiCollocations(docs, "doc_id", "text", 1L, 10)
    // pairs: (a,b) x3, (b,a) x2 — N counts 'solo' too (N=7)
    val ab = out.filter(col("w1") === "a" && col("w2") === "b").head()
    assert(ab.getAs[Long]("c12") == 3L)
    assert(ab.getAs[Long]("pmi_ratio_micro") == 3L * 7L * 1000000L / 9L)
  }

  test("cooccur: hand-computed doc counts, apriori prune, presence not frequency") {
    // 10 docs: 'alpha beta' co-occur in all 10 (beta repeated — presence
    // counts once); 'gamma' in 4 docs (below minDf 5, pruned even though
    // pairs with it would clear minSup... they can't — apriori); 'delta'
    // in 5 docs alongside alpha
    val docs = (0L until 10L).map { i =>
      val g = if (i < 4) " gamma" else ""
      val d = if (i % 2 == 0L) " delta" else ""
      (i, s"alpha beta beta$g$d")
    }.toDF("doc_id", "text")
    val out = TextOps.cooccurPairs(docs, "doc_id", "text",
      minDf = 5L, minSup = 5L, topK = 10)
      .orderBy("w1", "w2")
      .select("w1", "w2", "n12", "df1", "df2", "lift_micro")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("alpha", "beta", 10L, 10L, 10L, 1000000L), // lift exactly 1.0
      ("alpha", "delta", 5L, 10L, 5L, 1000000L),
      ("beta", "delta", 5L, 10L, 5L, 1000000L)))
    // gamma appears in no pair: pruned at the frequent-token gate
    assert(!out.exists(r => r._1 == "gamma" || r._2 == "gamma"))
  }
}
