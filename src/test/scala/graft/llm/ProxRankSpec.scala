package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the proximity-boosted BM25 composition
  * ([[Retrieval.proximityRerank]]): the ranking law the composition
  * exists for (a doc whose query words co-occur inside the window
  * outranks an equal-BM25 doc whose matches are scattered), the
  * degeneration to plain BM25 at boost 0, the boost arithmetic
  * consistency of every output row, and candidate-set containment.
  * Exact values are oracle-gated (`llm_prox_rank`).
  */
class ProxRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("proximity-matched doc outranks an equal-BM25 scattered doc") {
    val spark2 = spark
    import spark2.implicits._
    // docs 1 and 2 are BM25-identical for query "aa bb": same tf (1, 1),
    // same length (5), same df contribution — only the word ADJACENCY
    // differs. With window = 4, doc 1 holds a window containing both
    // words; doc 2 (aa at 0, bb at 4) cannot (a 4-token span covering
    // positions 0 and 4 does not exist).
    val docs = Seq(
      (1L, "aa bb f1 f2 f3"),
      (2L, "aa g1 g2 g3 bb"),
      (3L, "h1 h2 h3 h4 h5"),
      (4L, "aa h1 h2 h3 h4")).toDF("doc_id", "text")
    val queries = Seq((100L, "aa bb")).toDF("qid", "qtext")
    val inv = Retrieval.buildInvIndex(docs, "doc_id", "text")
    val pos = Retrieval.buildPosIndex(docs, "doc_id", "text")
    val out = Retrieval.proximityRerank(queries, "qid", "qtext", inv, pos,
        kCand = 10, k = 4, window = 4, boostMicro = 100000L,
        excludeIdEq = false)
      .collect().sortBy(_.getLong(1))
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // doc 1 first (boosted), doc 2 second (plain score); equal plain
    // scores is the fixture's load-bearing premise
    assert(out(0)._2 == 1L && out(1)._2 == 2L,
      s"proximity should break the tie toward doc 1: ${out.toSeq}")
    assert(out(0)._3 == out(1)._3, "fixture drifted: BM25 scores must tie")
    assert(out(0)._4 == 1L && out(1)._4 == 0L,
      s"window counts should be (1, 0): ${out.toSeq}")
    assert(out(0)._5 == out(0)._3 + 100000L, "boost arithmetic")
  }

  test("boost 0 degenerates to plain BM25; rows stay boost-consistent") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val queries = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        expr("array_join(slice(filter(split(lower(text), ' '), " +
          "w -> length(w) > 0), 1, 5), ' ')").as("qtext"))
    val inv = Retrieval.buildInvIndex(docs, "doc_id", "text")
    val pos = Retrieval.buildPosIndex(docs, "doc_id", "text")
    // kCand ≥ k and boost 0: the re-rank is the identity on the BM25
    // order (same (−score, nid) law through the same bounded tail)
    val zero = Retrieval.proximityRerank(queries, "qid", "qtext", inv, pos,
        kCand = 20, k = 5, window = 8, boostMicro = 0L, excludeIdEq = true)
      .select(col("query_id"), col("rank"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = Retrieval.bm25TopK(queries, "qid", "qtext", inv, k = 5,
        excludeIdEq = true)
      .select(col("query_id"), col("rank"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(zero.nonEmpty && zero == plain)
    // boosted run: ranks contiguous per query, boost arithmetic exact,
    // every ranked doc drawn from the BM25 top-kCand candidate set
    val boosted = Retrieval.proximityRerank(queries, "qid", "qtext", inv,
      pos, kCand = 20, k = 5, window = 8, boostMicro = 100000L,
      excludeIdEq = true).collect()
    assert(boosted.nonEmpty)
    boosted.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted.toSeq
      assert(ranks == (1L to rs.length).toSeq, s"query $q ranks: $ranks")
    }
    assert(boosted.forall(r =>
      r.getLong(5) == r.getLong(3) + 100000L * r.getLong(4)))
    val cand = Retrieval.bm25TopK(queries, "qid", "qtext", inv, k = 20,
        excludeIdEq = true)
      .select(col("query_id"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(boosted.forall(r => cand((r.getLong(0), r.getLong(2)))),
      "a ranked doc was not a BM25 candidate")
  }
}
