package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the sparse-retrieval / corpus-LM family (`Retrieval`):
  * chunk coverage and layout, BM25 ranking monotonicity, RRF fusion
  * arithmetic, bigram-LM score ordering.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("chunk covers every token exactly once at stride == window") {
    val d = docs((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
    val out = Retrieval.chunk(d, "doc_id", "text", window = 4, stride = 4)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getAs[String]("chunk_text")).mkString(" ") ===
      (1 to 10).map(i => s"t$i").mkString(" "))
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq === Seq(4L, 4L, 2L))
    assert(out.map(_.getAs[Long]("start_token")).toSeq === Seq(0L, 4L, 8L))
  }

  test("chunk overlaps by window - stride and short docs yield one chunk") {
    val d = docs((1L, "a b c d e f"), (2L, "x y"))
    val out = Retrieval.chunk(d, "doc_id", "text", window = 4, stride = 2)
    val c1 = out.filter($"doc_id" === 1).orderBy("chunk_id")
      .select("chunk_text").as[String].collect()
    // starts 0,2,4 — consecutive chunks share window-stride = 2 tokens
    assert(c1 === Array("a b c d", "c d e f", "e f"))
    val c2 = out.filter($"doc_id" === 2).select("chunk_text").as[String]
      .collect()
    assert(c2 === Array("x y"))
  }

  test("chunk plan is shuffle-free (map-side transform + explode only)") {
    val docs = graft.Tables(spark, graft.TestSpark.sf, "documents")
    val plan = Retrieval.chunk(docs, "doc_id", "text", 32, 24)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"chunking must not shuffle, plan:\n$plan")
  }

  test("bm25 ranks higher tf first among same-length docs, rare term wins") {
    val d = docs(
      (1L, "apple banana cherry date"),
      (2L, "apple apple cherry date"),
      (3L, "fig grape melon peach"),
      (4L, "fig kiwi melon peach"))
    val q = Seq((100L, "apple"), (200L, "kiwi")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(d, "doc_id", "text", q, "qid", "qtext", 4)
      .collect().groupBy(_.getAs[Long]("query_id"))
    // doc 2 has tf=2 for "apple" vs doc 1 tf=1, same length → ranks first
    val apple = out(100L).sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(apple === Seq(2L, 1L))
    // "kiwi" appears only in doc 4 (df=1, rarest) → only doc 4 ranks
    assert(out(200L).map(_.getAs[Long]("doc_id")).toSeq === Seq(4L))
  }

  test("bm25 excludeIdEq drops the query's own document") {
    val d = docs((1L, "alpha beta"), (2L, "alpha gamma"))
    val q = Seq((1L, "alpha")).toDF("qid", "qtext")
    val kept = Retrieval.bm25TopK(d, "doc_id", "text", q, "qid", "qtext", 5,
      excludeIdEq = true).select("doc_id").as[Long].collect()
    assert(kept.toSeq === Seq(2L))
  }

  test("rrf fusion: doc on both lists beats single-list docs; exact values") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "nid", "rank")
    val b = Seq((1L, 10L, 2L), (1L, 12L, 1L)).toDF("qid", "nid", "rank")
    val out = Retrieval.rrfFuse(a, b, k = 3).orderBy("rank")
      .select("doc_id", "rrf_micro").as[(Long, Long)].collect()
    // doc 10: 1e6/61 + 1e6/62 = 16393 + 16129; docs 12/11 single-list
    assert(out.toSeq === Seq(
      (10L, 1000000L / 61 + 1000000L / 62),
      (12L, 1000000L / 61),
      (11L, 1000000L / 62)))
  }

  test("hashEmbed: deterministic, partitioning-invariant, shuffle-free") {
    val d = docs((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon"))
    val out = Retrieval.hashEmbed(d, "doc_id", "text", dim = 8)
      .collect().map(r => r.getAs[Long]("nid") ->
        (r.getAs[scala.collection.Seq[Long]]("vq").toSeq, r.getAs[Long]("norm2"))).toMap
    // identical text → identical vector; components bounded by ±1000/token
    assert(out(1L) === out(2L))
    assert(out(1L)._1.size === 8)
    assert(out(1L)._1.forall(v => math.abs(v) <= 3000))
    assert(out(1L)._1 !== out(3L)._1)
    // norm2 is the exact sum of squares
    assert(out(3L)._2 === out(3L)._1.map(v => v * v).sum)
    // repartitioning changes nothing (pure per-row function)
    val again = Retrieval.hashEmbed(d.repartition(7), "doc_id", "text", 8)
      .collect().map(r => r.getAs[Long]("nid") ->
        r.getAs[scala.collection.Seq[Long]]("vq").toSeq).toMap
    assert(again(1L) === out(1L)._1)
    // map-side only: no Exchange in the executed plan
    val plan = Retrieval.hashEmbed(d, "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"embedding must not shuffle:\n$plan")
  }

  test("bigram LM scores a common-bigram doc above a rare-bigram doc") {
    val common = "the cat sat the cat sat the cat sat"
    val d = docs(
      (1L, common), (2L, common), (3L, common),
      (4L, "zeb qix vum wog")) // bigrams seen once each
    val out = Retrieval.bigramLmScore(d, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("mean_prob_ppb"), r.getAs[String]("bucket"))).toMap
    assert(out(1L)._1 > out(4L)._1)
    assert(out(1L)._2 === "head" && out(4L)._2 === "tail")
    // docs with identical text score identically
    assert(out(1L) === out(2L))
  }

  test("bigram LM drops docs with fewer than two tokens") {
    val d = docs((1L, "solo"), (2L, "two words here"))
    val ids = Retrieval.bigramLmScore(d, "doc_id", "text")
      .select("doc_id").as[Long].collect()
    assert(ids.toSeq === Seq(2L))
  }
}
