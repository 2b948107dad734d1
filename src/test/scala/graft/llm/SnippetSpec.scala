package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins snippet extraction: the (most distinct query words, smallest
  * start) window law, the head clamp, end-of-document truncation, and
  * exactly one snippet per ranked (query, doc) pair.
  */
class SnippetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def snip(docs: Seq[(Long, String)], results: Seq[(Long, Long)],
      qtext: String, w: Int) = {
    val spark2 = spark
    import spark2.implicits._
    Retrieval.extractSnippets(
        results.toDF("query_id", "doc_id"),
        Seq((100L, qtext)).toDF("qid", "qtext"), "qid", "qtext",
        docs.toDF("doc_id", "text"), "doc_id", "text", w)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toList.sortBy(_._1)
  }

  test("best window: most distinct query words, ties to smallest start") {
    // a@2,7,9  b@4,8 (0-based): the first 2-word window starts at s=2
    // ("a y b"); later 2-word windows (s=6,7,8) lose the tie
    assert(snip(Seq((1L, "x x a y b x x a b a")), Seq((100L, 1L)),
      "a b", 3) == List((1L, 2L, 2L, "a y b")))
    // widen to W=4: s=1 now covers a@2,b@4 — smaller start wins again
    assert(snip(Seq((1L, "x x a y b x x a b a")), Seq((100L, 1L)),
      "a b", 4) == List((1L, 1L, 2L, "x a y b")))
  }

  test("head clamp and end-of-doc truncation") {
    // hit at position 0 with W=5: the clamp pins the start at 0 and the
    // snippet truncates at the document's single token
    assert(snip(Seq((1L, "a")), Seq((100L, 1L)), "a", 5) ==
      List((1L, 0L, 1L, "a")))
    // match at the very end: window extends past the doc, slice truncates
    assert(snip(Seq((1L, "x y z a")), Seq((100L, 1L)), "a", 3) ==
      List((1L, 1L, 1L, "y z a")))
  }

  test("best window ≡ brute-force reference on random docs " +
    "(r19 token-array vote pin)") {
    // the r19 rewrite computes hit positions from the token array and
    // dedupes start votes via the interval union; this property pins the
    // full (most distinct query words, smallest start) law against an
    // independent per-doc scan: best = argmax over s ≥ 0 of
    // (|qwords ∩ doc[s..s+W−1]| DESC, s ASC), restricted to docs that
    // hold ≥ 1 query word (the ranked-pair contract)
    val rnd = new scala.util.Random(190220L)
    val alphabet = Vector("a", "b", "c", "d", "e")
    for (_ <- 1 to 6) {
      val w = 1 + rnd.nextInt(6)
      val docs = (1L to 6L).map { id =>
        id -> Vector.fill(1 + rnd.nextInt(24))(
          alphabet(rnd.nextInt(alphabet.size)))
      }
      val qwords = rnd.shuffle(alphabet).take(1 + rnd.nextInt(3))
      val withHit = docs.filter { case (_, ts) => ts.exists(qwords.contains) }
      if (withHit.nonEmpty) {
        val expected = withHit.map { case (id, ts) =>
          val (bestC, bestS) = (0 until ts.length).map { s =>
            (qwords.count(ts.slice(s, s + w).contains), s)
          }.maxBy { case (c, s) => (c, -s) }
          (id, bestS.toLong, bestC.toLong,
            ts.slice(bestS, bestS + w).mkString(" "))
        }.toList.sortBy(_._1)
        val got = snip(docs.map { case (id, ts) => (id, ts.mkString(" ")) },
          withHit.map { case (id, _) => (100L, id) },
          qwords.mkString(" "), w)
        assert(got == expected,
          s"W=$w q=${qwords.mkString(" ")} docs=${docs.map(_._2.mkString(" "))}")
      }
    }
  }

  test("one snippet per ranked pair on the real corpus, offsets in range") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val queries = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        expr("array_join(slice(filter(split(lower(text), ' '), " +
          "w -> length(w) > 0), 1, 5), ' ')").as("qtext"))
    val top = Retrieval.bm25TopK(docs, "doc_id", "text", queries, "qid",
      "qtext", k = 5, excludeIdEq = true)
    val out = Retrieval.extractSnippets(
      top.select(col("query_id"), col("doc_id")), queries, "qid", "qtext",
      docs, "doc_id", "text", window = 8)
    val n = top.count()
    assert(n > 0 && out.count() == n,
      "every BM25 result doc holds >= 1 query word, so exactly one snippet each")
    val bad = out.filter(col("snippet_start") < 0 ||
      col("n_query_words") < 1 || length(col("snippet")) === 0).count()
    assert(bad == 0L)
  }
}
