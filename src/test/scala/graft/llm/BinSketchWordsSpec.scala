package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the d = 64 contract of [[Ann.binSketch]] (round-13 verdict: a
  * wider corpus silently sketched only its first 64 dims) and the
  * generalized [[Ann.binSketchWords]]/[[Ann.hammingTopKWords]] path:
  *  - binSketch on d ≠ 64 must FAIL LOUDLY, not truncate;
  *  - binSketchWords at d = 64 must equal binSketch's (blo, bhi) exactly;
  *  - binSketchWords at d = 96 must sketch ALL dims — flipping dim 95's
  *    sign must change the sketch (the truncation bug's counterexample);
  *  - hammingTopKWords at d = 64 must equal hammingTopK row-for-row.
  */
class BinSketchWordsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(d: Int, n: Int) =
    (0L until n.toLong).map { i =>
      (i, (0 until d).map(j => ((i * 31 + j * 7) % 11) - 5L))
    }.toDF("nid", "vq")

  test("binSketch raises loudly on d = 96 instead of truncating") {
    val df = vecs(96, 4)
    val ex = intercept[Exception] {
      Ann.binSketch(df).select(col("blo")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m =>
      m.contains("binSketch requires d = 64") && m.contains("96")),
      s"wrong failure: ${msgs(ex)}")
  }

  test("binSketchWords(d=64) ≡ binSketch's (blo, bhi) word pair") {
    val df = vecs(64, 50)
    val two = Ann.binSketch(df).select(col("nid"), col("blo"), col("bhi"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val gen = Ann.binSketchWords(df, 64)
      .select(col("nid"), col("bsk")(0), col("bsk")(1))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(gen == two)
  }

  test("binSketchWords(d=96) packs 3 words and SEES dimension 95") {
    val df = vecs(96, 8)
    val base = Ann.binSketchWords(df, 96)
      .select(col("nid"), col("bsk")).as[(Long, Seq[Long])].collect()
      .sortBy(_._1)
    assert(base.forall(_._2.length == 3))
    // straight-line truth: word w bit j = [vq(32w+j) > 0]
    val truth = vecs(96, 8).as[(Long, Seq[Long])].collect().sortBy(_._1)
      .map { case (id, v) =>
        (id, (0 until 3).map { w =>
          (0 until math.min(32, 96 - w * 32)).map { j =>
            if (v(w * 32 + j) > 0) 1L << j else 0L
          }.sum
        })
      }
    assert(base.map(r => (r._1, r._2.toSeq)).toSeq == truth.toSeq)
    // flip dim 95's sign on one row → its tail word must change
    val flipped = Ann.binSketchWords(
      df.withColumn("vq", expr(
        "transform(vq, (x, i) -> CASE WHEN i = 95 THEN -x ELSE x END)")), 96)
      .select(col("nid"), col("bsk")).as[(Long, Seq[Long])].collect()
      .sortBy(_._1)
    val changed = base.zip(flipped).count { case ((_, b), (_, f)) =>
      b(2) != f(2)
    }
    // every row whose dim 95 is nonzero flips its indicator
    assert(changed > 0, "dimension 95 is invisible to the sketch — truncation")
  }

  test("hammingTopKWords(d=64) ≡ hammingTopK row-for-row") {
    val df = vecs(64, 200)
    val queries = df.filter(col("nid") % 40 === 0)
      .select(col("nid").as("qid"), col("vq"))
    val corpus = df
    val two = Ann.hammingTopK(queries, corpus, 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val gen = Ann.hammingTopKWords(queries, corpus, 64, 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(gen == two)
  }
}
