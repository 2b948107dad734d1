package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the ANN tombstone delete: the deleted index is EXACTLY the
  * survivors probed against the unchanged frozen quantizers (no deleted
  * vector can rank; scores of survivors move only through the candidate
  * set, never through re-encoding), deletes are idempotent, and the SQ
  * leg carries the same contract.
  */
class AnnDeleteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("IVF-PQ delete: no deleted id ranks; survivors score unchanged") {
    val corpus = graft.EntryHelpers.annCorpus(spark, TestSpark.sf)
    val queries = graft.EntryHelpers.annQueries(spark, TestSpark.sf)
    val index = Ann.buildIvfPqIndex(corpus, step = 25, iters = 2)
    val tomb = corpus.filter(col("nid") % 9 === 0).select(col("nid"))
    val deleted = Ann.deleteFromIvfPqIndex(index, tomb)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val got = rows(Ann.ivfPqSearch(queries, deleted, k = 3, nProbe = 2))
    assert(got.nonEmpty)
    assert(!got.exists(_._3 % 9 == 0), "a deleted vector ranked")
    // frozen-artifact law: the deleted index ≡ an index whose tables were
    // filtered by hand against the SAME quantizers
    val manual = index.copy(
      cells = index.cells.filter(col("nid") % 9 =!= 0),
      pq = index.pq.copy(codes = index.pq.codes.filter(col("nid") % 9 =!= 0)))
    assert(rows(Ann.ivfPqSearch(queries, manual, k = 3, nProbe = 2)) == got)
    // idempotent: deleting again (plus never-indexed ids) changes nothing
    val spark2 = spark
    import spark2.implicits._
    val again = Ann.deleteFromIvfPqIndex(deleted,
      tomb.unionByName(Seq(999999001L).toDF("nid")))
    assert(rows(Ann.ivfPqSearch(queries, again, k = 3, nProbe = 2)) == got)
  }

  test("SQ delete: code table drops rows, bounds frozen") {
    val corpus = graft.EntryHelpers.annCorpus(spark, TestSpark.sf)
    val index = Ann.buildSqIndex(corpus)
    val tomb = corpus.filter(col("nid") % 9 === 0).select(col("nid"))
    val deleted = Ann.deleteFromSqIndex(index, tomb)
    assert(deleted.codes.filter(col("nid") % 9 === 0).count() == 0L)
    assert(deleted.codes.count() ==
      index.codes.filter(col("nid") % 9 =!= 0).count())
    // the one-row bounds frame is untouched (no retrain on delete)
    assert(deleted.bounds.collect().toSeq == index.bounds.collect().toSeq)
  }
}
