package graft

import org.scalatest.funsuite.AnyFunSuite

/** Join-strategy lint over the relational/histogram analytics rows: none
  * of them may plan a BroadcastNestedLoopJoin or CartesianProduct. BNLJ
  * is O(left × right) scans — exactly how `llm_score_calibrate`'s pooled
  * interval lookup went quadratic before the bucketized RangeJoin rewrite
  * (the 500k-doc lane caught it at runtime; this spec catches the CLASS
  * statically). The ANN brute/MMR family is deliberately out of scope:
  * there a broadcast-queries non-equi join IS the design (fixed-count
  * query batch × corpus = linear), so a blanket lint would false-positive.
  */
class PlanShapeLintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val dir = "/root/testdata/sf0.001"

  // rows whose scale contract is "histograms rank, rows never pair":
  // any nested-loop join in them is a defect, never a design choice
  val linted = Seq(
    "llm_score_calibrate", "llm_kanon_audit", "llm_mad_outliers",
    "llm_mad_by_source", "llm_token_fertility", "llm_lang_confusion",
    "llm_quality_cut", "llm_token_budget", "llm_epoch_plan",
    "llm_domain_budget", "llm_corpus_profile", "llm_url_ops",
    // round-13 histogram-family rows: the llr table and the cut
    // threshold are broadcast one-row/B-row aggregates — every
    // corpus-sized join must stay key-equi
    "llm_importance_weights", "llm_importance_cut", "llm_calibrate_ks")

  test("histogram-family rows plan no CONDITIONED nested-loop or " +
    "cartesian joins (Cross-type one-row scalar attaches are linear)") {
    val offenders = linted.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      spark.catalog.clearCache()
      plan.linesIterator.collect {
        // a Cross BNLJ is the broadcast-scalar attach (O(left × 1));
        // a JOIN-TYPED one carries a predicate evaluated per pair —
        // the O(left × right) class the calibrate lane run caught
        case l if l.contains("BroadcastNestedLoopJoin") &&
          !l.contains("Cross") => s"$name: ${l.trim.take(80)}"
        case l if l.contains("CartesianProduct") =>
          s"$name: ${l.trim.take(80)}"
      }.toSeq
    }
    assert(offenders.isEmpty, s"nested-loop joins in linted rows: $offenders")
  }

  test("every crossJoin in src/main carries a broadcast hint (uniformity)") {
    // source-level sweep: all ~45 crossJoin sites in the engine are
    // one-row/broadcast-sized scalar attaches by design; the hint makes
    // that intent explicit so AQE never has to rescue a copy-pasted
    // site where the small side isn't small. A hint may sit on either
    // operand (broadcast(x).crossJoin(y) hints the receiver), so the
    // lint accepts "broadcast" anywhere in a window around the call.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val s = new String(java.nio.file.Files.readAllBytes(p))
        ".crossJoin\\(".r.findAllMatchIn(s).flatMap { m =>
          val window = s.substring(math.max(0, m.start - 160),
            math.min(s.length, m.end + 260))
          if (window.contains("broadcast")) None
          else {
            val line = s.substring(0, m.start).count(_ == '\n') + 1
            Some(s"$p:$line")
          }
        }
      }.toList
    assert(offenders.isEmpty,
      s"crossJoin without a broadcast hint nearby: $offenders")
  }

  test("negative self-check: an interval predicate without bucketization " +
    "DOES plan a BroadcastNestedLoopJoin (the lint can fire)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pts = (1L to 100L).toDF("p")
    val iv = Seq((1L, 10L), (10L, 50L)).toDF("lo", "hi")
    val plan = pts.join(broadcast(iv), col("p") >= col("lo") && col("p") < col("hi"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
