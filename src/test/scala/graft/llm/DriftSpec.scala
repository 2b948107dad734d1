package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the standing-index drift gate: an iid (in-sample) batch must NOT
  * trip any check while a deliberately shifted batch (3·vq + 41 vectors,
  * reversed-token documents) trips every one — with the SAME thresholds,
  * chosen midway between the two observed drifts, so the test fails if
  * either side of the separation collapses. Also pins the report's exact
  * metric inventory and basic integer invariants.
  */
class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtures() = {
    val corpus = graft.EntryHelpers.annCorpus(spark, TestSpark.sf)
    val ivf = Ann.buildIvfPqIndex(corpus, step = 25, iters = 2)
    val sq = Ann.buildSqIndex(corpus)
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val inv = Retrieval.buildInvIndex(docs, "doc_id", "text")
    (corpus, ivf, sq, inv, docs)
  }

  test("iid batch stays under gate; shifted batch trips every check") {
    val (corpus, ivf, sq, inv, docs) = fixtures()
    val iidVecs = corpus.filter(col("nid") % 7 === 0)
    val shiftVecs = iidVecs
      .select(col("nid"), expr("transform(vq, v -> v * 3 + 41)").as("vq"))
      .withColumn("norm2", expr("aggregate(vq, 0L, (acc, v) -> acc + v * v)"))
    val iidDocs = docs.filter(col("doc_id") % 53 === 0).select(col("text"))
    val shiftDocs = docs.filter(col("doc_id") % 53 === 0)
      .select(expr("array_join(transform(filter(split(lower(text), ' '), " +
        "w -> length(w) > 0), w -> reverse(w)), ' ')").as("text"))

    def scalars(batch: org.apache.spark.sql.DataFrame,
        bdocs: org.apache.spark.sql.DataFrame): Map[String, Long] =
      Drift.report(ivf, sq, inv, corpus, batch, bdocs, "text")
        .filter(col("key") === -1L).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap

    val iid = scalars(iidVecs, iidDocs)
    val sh = scalars(shiftVecs, shiftDocs)
    // orient every check as "drift" the way the gate does
    def drift(m: Map[String, Long]) = Map(
      "ivf_tv_bp" -> m("ivf_tv_bp"),
      "sq_sat_delta_bp" -> (m("sq_sat_bp_batch") - m("sq_sat_bp_base")),
      "pq_recon_delta_micro" ->
        (m("pq_recon_micro_base") - m("pq_recon_micro_batch")),
      "bm25_oov_bp" -> m("bm25_oov_bp"))
    val di = drift(iid)
    val ds = drift(sh)
    di.keys.foreach { k =>
      assert(ds(k) > di(k),
        s"$k failed to separate: iid=${di(k)} shifted=${ds(k)}")
    }
    // midpoint thresholds: iid must pass, shifted must trip — on EVERY check
    def mid(k: String) = (di(k) + ds(k)) / 2
    def gateMap(batch: org.apache.spark.sql.DataFrame,
        bdocs: org.apache.spark.sql.DataFrame): Map[String, Boolean] =
      Drift.gate(Drift.report(ivf, sq, inv, corpus, batch, bdocs, "text"),
          mid("ivf_tv_bp"), mid("sq_sat_delta_bp"),
          mid("pq_recon_delta_micro"), mid("bm25_oov_bp"))
        .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    val gIid = gateMap(iidVecs, iidDocs)
    val gSh = gateMap(shiftVecs, shiftDocs)
    assert(gIid.size == 4 && gIid.values.forall(_ == false),
      s"iid batch tripped the gate: $gIid")
    assert(gSh.size == 4 && gSh.values.forall(_ == true),
      s"shifted batch failed to trip every check: $gSh")
    // the iid doc batch is a verbatim corpus subset: zero OOV exactly
    assert(iid("bm25_oov_bp") == 0L)
  }

  test("report inventory and integer invariants") {
    val (corpus, ivf, sq, inv, docs) = fixtures()
    val batch = corpus.filter(col("nid") % 7 === 0)
      .select(col("nid"), expr("transform(vq, v -> v * 3 + 41)").as("vq"))
      .withColumn("norm2", expr("aggregate(vq, 0L, (acc, v) -> acc + v * v)"))
    val bdocs = docs.filter(col("doc_id") % 53 === 0).select(col("text"))
    val rep = Drift.report(ivf, sq, inv, corpus, batch, bdocs, "text")
      .collect()
    val metrics = rep.map(_.getString(0)).toSet
    assert(metrics == Set("ivf_cell_bp_base", "ivf_cell_bp_batch",
      "ivf_tv_bp", "sq_sat_bp_base", "sq_sat_bp_batch",
      "pq_recon_micro_base", "pq_recon_micro_batch", "bm25_oov_bp"))
    // bp metrics live in [0, 10000]; the per-cell families cover the
    // same cell set on both sides (full-outer with 0 fill)
    val bps = rep.filter(r => r.getString(0).contains("_bp") &&
      r.getString(0) != "ivf_tv_bp")
    assert(bps.forall(r => r.getLong(2) >= 0L && r.getLong(2) <= 10000L))
    def cellsOf(m: String) = rep.filter(_.getString(0) == m)
      .map(_.getLong(1)).toSet
    assert(cellsOf("ivf_cell_bp_base") == cellsOf("ivf_cell_bp_batch"))
    // shares sum to ≤ 10000 (integer-floor division loses remainders)
    def shareSum(m: String) = rep.filter(_.getString(0) == m)
      .map(_.getLong(2)).sum
    assert(shareSum("ivf_cell_bp_base") <= 10000L)
    assert(shareSum("ivf_cell_bp_batch") <= 10000L)
  }

  test("gate fails fast on a report missing a scalar metric") {
    val (corpus, ivf, sq, inv, docs) = fixtures()
    val batch = corpus.filter(col("nid") % 7 === 0)
    val bdocs = docs.filter(col("doc_id") % 53 === 0).select(col("text"))
    val rep = Drift.report(ivf, sq, inv, corpus, batch, bdocs, "text")
    val ex = intercept[IllegalArgumentException] {
      Drift.gate(rep.filter(col("metric") =!= "ivf_tv_bp"), 1L, 1L, 1L, 1L)
    }
    assert(ex.getMessage.contains("ivf_tv_bp"),
      s"missing-metric message should name the metric: ${ex.getMessage}")
  }

  test("sqOovGate raises on a report missing one of its metric rows") {
    val (corpus, _, sq, inv, docs) = fixtures()
    val batch = corpus.filter(col("nid") % 7 === 0)
    val bdocs = docs.filter(col("doc_id") % 53 === 0).select(col("text"))
    val rep = Drift.sqSaturation(sq, batch)
      .unionByName(Drift.bm25OovBp(inv, bdocs, "text"))
    // intact report: both legs present, exactly two gate rows
    assert(Drift.sqOovGate(rep, 500L, 500L).count() == 2L)
    // a filtered report previously emitted a SHORTER gate table that read
    // as nothing-triggered; now the missing leg raises at execution with
    // the metric's name in the message
    val ex = intercept[Exception] {
      Drift.sqOovGate(rep.filter(col("metric") =!= "bm25_oov_bp"),
        500L, 500L).collect()
    }
    assert(ex.getMessage.contains("bm25_oov_bp"),
      s"missing-leg error should name the metric: ${ex.getMessage}")
  }

  test("retrain closes the loop: tripped SQ/OOV legs recover after rebuild") {
    val (corpus, _, sq, inv, docs) = fixtures()
    def vbatch(m: Int, off: Long) = corpus.filter(col("nid") % 7 === m)
      .select((col("nid") + off).as("nid"),
        expr("transform(vq, v -> v * 3 + 41)").as("vq"))
      .withColumn("norm2", expr("aggregate(vq, 0L, (acc, v) -> acc + v * v)"))
    def dbatch(m: Int, off: Long) = docs.filter(col("doc_id") % 53 === m)
      .select((col("doc_id") + off).as("doc_id"),
        expr("array_join(transform(filter(split(lower(text), ' '), " +
          "w -> length(w) > 0), w -> reverse(w)), ' ')").as("text"))
    val (b1, d1) = (vbatch(0, 10000000L), dbatch(0, 10000000L))
    val (b2, d2) = (vbatch(1, 20000000L), dbatch(1, 20000000L))
    def gmap(s: Ann.SqIndex, i: Retrieval.InvIndex,
        b: org.apache.spark.sql.DataFrame,
        d: org.apache.spark.sql.DataFrame): Map[String, Boolean] =
      Drift.sqOovGate(Drift.sqSaturation(s, b)
          .unionByName(Drift.bm25OovBp(i, d, "text")), 500L, 500L)
        .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    val g1 = gmap(sq, inv, b1, d1)
    assert(g1 == Map("sq_sat_delta_bp" -> true, "bm25_oov_bp" -> true),
      s"phase 1 should trip both legs: $g1")
    // retrain exactly what tripped: SQ bounds over base ∪ batch₁, the
    // vocabulary folded forward with the batch₁ docs — then a SECOND
    // batch from the same shifted distribution passes
    val sq2 = Ann.buildSqIndex(corpus.unionByName(b1))
    val inv2 = Retrieval.updateInvIndex(inv, d1, "doc_id", "text")
    val g2 = gmap(sq2, inv2, b2, d2)
    assert(g2 == Map("sq_sat_delta_bp" -> false, "bm25_oov_bp" -> false),
      s"phase 2 should recover both legs: $g2")
  }
}
