package graft.llm

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the k-bounded [[graft.plans.TopKScored]] ranking tail (the shared
  * tail of every cosine ANN tier since round 14) against the window form it
  * replaced: `row_number().over(partitionBy(qid).orderBy(score.desc,
  * nid.asc)) <= k` must be ROW-identical to the aggregate — including exact
  * double tie runs that k cuts inside, duplicate scores across partitions
  * (so partial buffers merge mid-tie), and a skewed hot query. The window
  * form is the independent truth here precisely because it is the
  * semantics the oracle SQL replays.
  */
class AnnTopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Adversarial (qid, nid, score) fixture: one hot query with 10× the
    * candidates, scores drawn from a SMALL set of exact doubles so long
    * tie runs form, and k chosen to cut inside a tie run.
    */
  private def fixture = {
    val rows = for {
      q <- 0L until 6L
      n <- 0L until (if (q == 0) 2000L else 200L)
    } yield {
      // 8 distinct exact-double scores → ~250-long tie runs on the hot key
      val s = ((q * 7 + n * 13) % 8).toDouble / 8.0
      (q, n, s)
    }
    rows.toDF("qid", "nid", "cos")
  }

  private def windowTruth(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        col("cos"))
  }

  private def aggForm(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("qid"))
      .agg(graft.plans.TopKScored.topkScored(col("cos"), col("nid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("p.id").as("nid"), col("p.score").as("cos"))

  test("TopKScored tail ≡ window rank, ties cut mid-run, many partitions") {
    val df = fixture.repartition(16) // force cross-task partial merges
    for (k <- Seq(1, 3, 25, 300)) {
      val w = windowTruth(df, k)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
      val a = aggForm(df, k)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
      assert(a.toSeq == w.toSeq, s"k=$k diverged")
    }
  }

  test("negative/NaN-free ordering law: Double.compare semantics on mixed signs") {
    // mixed-sign exact doubles including 0.0 — the law is (score DESC, id ASC)
    val df = Seq(
      (1L, 10L, -0.5), (1L, 11L, 0.0), (1L, 12L, 0.5), (1L, 13L, 0.5),
      (1L, 14L, -0.5), (1L, 15L, 1.0)
    ).toDF("qid", "nid", "cos")
    val got = aggForm(df, 4).as[(Long, Long, Long, Double)].collect()
      .sortBy(_._2).toSeq
    assert(got == Seq(
      (1L, 1L, 15L, 1.0), (1L, 2L, 12L, 0.5), (1L, 3L, 13L, 0.5),
      (1L, 4L, 11L, 0.0)))
  }

  test("−0.0 ties +0.0 exactly like Spark's window sort (id tiebreak, not sign)") {
    // Spark's SQLOrderingUtil.compareDoubles treats −0.0 == 0.0; a plain
    // java.lang.Double.compare would order −0.0 < 0.0 and return the
    // +0.0 rows first regardless of id — k = 3 cuts inside the zero run
    // so a sign-ordered implementation returns a DIFFERENT row set
    val df = Seq(
      (1L, 10L, -0.0), (1L, 11L, 0.0), (1L, 12L, 0.0), (1L, 13L, -0.0),
      (1L, 14L, 1.0), (1L, 15L, -1.0)
    ).toDF("qid", "nid", "cos").repartition(4)
    for (k <- Seq(3, 4)) {
      val w = windowTruth(df, k)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
      val a = aggForm(df, k)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
      // compare ranks and ids; scores via raw bits so −0.0 ≠ 0.0 here —
      // the WINNING rows' stored values must round-trip bit-exactly too
      def key(r: (Long, Long, Long, Double)) =
        (r._1, r._2, r._3, java.lang.Double.doubleToRawLongBits(r._4))
      assert(a.map(key) == w.map(key), s"k=$k diverged on the ±0.0 run")
    }
  }

  test("NO cosine/Hamming tier plans a Window operator (bounded aggregates only)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = Ann.withQuantized(emb, "embedding")
    val corpus = e.select(col("vec_id").as("nid"), col("vq"), col("norm2"))
    val queries = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("vq"), col("norm2"))
    val qb = Ann.withBucket(queries, Ann.DefaultPairs)
    val cb = Ann.withBucket(corpus, Ann.DefaultPairs)
    val cent = Ann.ivfCentroids(corpus, step = 50)
    val sq = Ann.buildSqIndex(corpus)
    // every corpus-ranking tier: a Window anywhere in these plans is the
    // hot-query single-task sort the round-14 migration removed (the
    // ivfAssign nProbe>1 probe window inside ivfTopK is query-side-small
    // by contract — exercised via the UNTRAINED seed path nProbe=1 here
    // so the lint stays strict about the corpus side)
    val tiers: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "brute" -> Ann.bruteTopK(queries, corpus, 3),
      "lsh" -> Ann.lshTopK(qb, cb, 3),
      "lsh_multiprobe" -> Ann.lshMultiProbeTopK(qb, cb, 3, bits = 6),
      "ivf_p1" -> Ann.ivfTopK(queries, corpus, cent, k = 3, nProbe = 1),
      "sq" -> Ann.sqSearch(queries, sq, 3),
      "rp" -> Ann.rpTopK(queries, corpus, dOut = 16, k = 3),
      "hamming" -> Ann.hammingTopK(queries, corpus, 3),
      "hamming_words" -> Ann.hammingTopKWords(queries, corpus, 64, 3),
      "hamming_rerank" -> Ann.hammingRerank(queries, corpus, 3, 16),
      "rerank_exact" -> Ann.rerankExact(queries, corpus,
        Ann.hammingTopK(queries, corpus, 4).select(col("qid"), col("nid")), 3),
      "rrf_fuse" -> { // the llm_hybrid_search fusion tail (11th tier)
        val side = Ann.bruteTopK(queries, corpus, 3)
          .select(col("qid"), col("nid"), col("rank"))
        Retrieval.rrfFuse(side, side, 3)
      })
    tiers.foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name ranking regressed to a window sort:\n${plan.take(2000)}")
      assert(plan.contains("topk_scored") || plan.contains("topk_pairs"),
        s"$name lost the bounded aggregate tail")
    }
  }
}
