package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the COMPOSED index-lifecycle chain (build → additive update →
  * tombstone delete spanning base and batch → re-add of a deleted
  * subset → probe) against a from-scratch build over the net corpus —
  * the pairwise laws (update ≡ rebuild, delete ≡ survivors, delete →
  * re-add restores) are pinned individually in Bm25IndexSpec /
  * Bm25DeleteSpec; interaction bugs (df drift under interleaving,
  * stats skew across fold/subtract boundaries) only surface composed.
  * The oracle row (`llm_index_lifecycle`) hash-checks the probe; this
  * spec checks every COMPONENT and the interleaved-idempotency law the
  * row can't see.
  */
class IndexLifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def setOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("build→update→delete→re-add ≡ scratch build over the net corpus") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val idx1 = Retrieval.updateInvIndex(
      Retrieval.buildInvIndex(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"),
      docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
    val idx2 = Retrieval.deleteFromInvIndex(idx1,
      docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
    val idx3 = Retrieval.updateInvIndex(idx2,
      docs.filter(col("doc_id") % 21 === 0), "doc_id", "text")
    val net = Retrieval.buildInvIndex(
      docs.filter(col("doc_id") % 7 =!= 0 || col("doc_id") % 21 === 0),
      "doc_id", "text")
    assert(setOf(idx3.postings) == setOf(net.postings))
    assert(setOf(idx3.dl) == setOf(net.dl))
    assert(setOf(idx3.dfTable) == setOf(net.dfTable))
    assert(setOf(idx3.stats) == setOf(net.stats))
    assert(setOf(idx3.maxImpact) == setOf(net.maxImpact))
    assert(setOf(idx3.fwd) == setOf(net.fwd))
    assert(setOf(idx3.postings).nonEmpty)
    // probe bit-equality through the chain (the oracle row's claim,
    // repeated here so a failure localizes without the driver)
    val queries = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        expr("array_join(slice(filter(split(lower(text), ' '), " +
          "w -> length(w) > 0), 1, 5), ' ')").as("qtext"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val chain = rows(Retrieval.bm25TopK(queries, "qid", "qtext", idx3,
      k = 5, excludeIdEq = true))
    assert(chain.nonEmpty && chain == rows(Retrieval.bm25TopK(queries,
      "qid", "qtext", net, k = 5, excludeIdEq = true)))
    // interleaved idempotency: deleting the STILL-deleted ids again
    // (% 7 == 0 minus the re-added % 21 == 0) out of idx3 is a no-op —
    // their components are already gone, and the re-added ids must not
    // be touched by a tombstone batch that does not name them
    val again = Retrieval.deleteFromInvIndex(idx3,
      docs.filter(col("doc_id") % 7 === 0 && col("doc_id") % 21 =!= 0),
      "doc_id", "text")
    assert(setOf(again.stats) == setOf(idx3.stats))
    assert(setOf(again.dfTable) == setOf(idx3.dfTable))
  }
}
