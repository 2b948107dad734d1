package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins multi-snippet extraction ([[Retrieval.extractSnippetsMulti]]):
  * the greedy non-overlap law (chosen starts of one (query, doc) pair
  * are pairwise ≥ window apart; snippet ranks ordered by the same
  * (count DESC, start ASC) law greedily), rank-1 agreement with the
  * single-snippet [[Retrieval.extractSnippets]], match-offset payload
  * validity (0-based, inside the window, pointing at query words), and
  * that docs with fewer candidates emit fewer rows — never padding.
  * Exact values are oracle-gated (`llm_snippets_multi`).
  */
class SnippetsMultiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("non-overlap, rank-1 agreement, and offset validity on the corpus") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val queries = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        expr("array_join(slice(filter(split(lower(text), ' '), " +
          "w -> length(w) > 0), 1, 5), ' ')").as("qtext"))
    val index = Retrieval.buildInvIndex(docs, "doc_id", "text")
    val top = Retrieval.bm25TopK(queries, "qid", "qtext", index, k = 5,
        excludeIdEq = true)
      .select(col("query_id"), col("doc_id"))
    val W = 8
    val multi = Retrieval.extractSnippetsMulti(top, queries, "qid", "qtext",
      docs, "doc_id", "text", window = W, nSnippets = 3).collect()
    assert(multi.nonEmpty)
    val byPair = multi.groupBy(r => (r.getLong(0), r.getLong(1)))
    byPair.foreach { case ((q, d), rs) =>
      val byRank = rs.sortBy(_.getLong(2))
      // ranks contiguous from 1 (a missing middle rank would mean the
      // greedy chain skipped a step)
      assert(byRank.map(_.getLong(2)).toSeq ==
        (1L to rs.length).toSeq, s"($q, $d) ranks")
      val starts = byRank.map(_.getLong(3))
      // pairwise non-overlap
      for (i <- starts.indices; j <- 0 until i)
        assert(math.abs(starts(i) - starts(j)) >= W,
          s"($q, $d): snippets $i/$j overlap: ${starts.toSeq}")
      // greedy law: a later pick never has MORE hits than an earlier one
      val counts = byRank.map(_.getLong(4))
      assert(counts.toSeq == counts.sortBy(-_).toSeq,
        s"($q, $d): counts not non-increasing: ${counts.toSeq}")
    }
    // rank-1 rows reproduce the single-snippet extractor exactly
    val single = Retrieval.extractSnippets(top, queries, "qid", "qtext",
        docs, "doc_id", "text", window = W).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val rank1 = multi.filter(_.getLong(2) == 1L)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      .toSet
    assert(rank1 == single, "rank-1 snippets diverge from extractSnippets")
    // offsets: 0-based, inside the window, non-empty, strictly ascending,
    // and each offset points at a query word of that query
    val qwords = queries.select(col("qid"), explode(expr(
        "filter(split(lower(qtext), ' '), w -> length(w) > 0)")).as("w"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet)
      .toMap
    multi.foreach { r =>
      val offs = r.getString(5).split(",").map(_.toLong).toSeq
      assert(offs.nonEmpty && offs == offs.sorted && offs.distinct == offs)
      assert(offs.forall(o => o >= 0 && o < W), s"offset out of window: $r")
      val snip = r.getString(6).split(" ")
      offs.foreach { o =>
        assert(qwords(r.getLong(0)).contains(snip(o.toInt)),
          s"offset $o of ($r) does not point at a query word")
      }
    }
  }

  test("a short doc with one candidate window emits one snippet, not three") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "aa bb"), (2L, "cc dd ee")).toDF("doc_id", "text")
    val queries = Seq((10L, "aa bb")).toDF("qid", "qtext")
    val pairs = Seq((10L, 1L)).toDF("query_id", "doc_id")
    val out = Retrieval.extractSnippetsMulti(pairs, queries, "qid", "qtext",
      docs, "doc_id", "text", window = 4, nSnippets = 3).collect()
    // every candidate start of the 2-token doc is within 4 tokens of the
    // best one — the greedy chain exhausts after one pick
    assert(out.length == 1 && out(0).getLong(2) == 1L)
    assert(out(0).getLong(4) == 2L && out(0).getString(5) == "0,1")
  }
}
