package graft.plans

import graft.TestSpark
import graft.llm.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style equivalence of the native expressions against the
  * composed-builtin forms they replaced, on seeded random inputs (the
  * scalatest↔scalacheck bridge isn't on the offline classpath — same
  * convention as core.PropertySpec). The three swaps are only legal
  * because these hold on EVERY input the pipelines can produce.
  */
class NativeExprPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813)

  test("qdot ≡ aggregate(zip_with) on 500 random equal-length long vectors") {
    val rows = (1 to 500).map { _ =>
      val n = rnd.nextInt(64) + 1
      // quantized-embedding range: |x| ≤ 1e6 keeps products far from overflow,
      // matching withQuantized's floor(x*100) grid
      (Seq.fill(n)(rnd.nextLong() % 1000000L), Seq.fill(n)(rnd.nextLong() % 1000000L))
    }
    val df = rows.toDF("a", "b")
    val bad = df.select(
      QuantizedDot.qdot(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)")
        .as("composed"))
      .filter(!(col("native") <=> col("composed"))).count()
    assert(bad == 0L)
  }

  test("alpha_space_count ≡ length(regexp_replace) on 500 random strings " +
    "incl. multi-byte chars, digits, empties") {
    // sampled as whole CODE POINTS (a String pool indexed by UTF-16 unit
    // would split the emoji into lone surrogates and never emit a
    // well-formed 4-byte UTF-8 sequence)
    val pool = Seq("a", "b", "z", "A", "Z", " ", "0", "1", "7", "9", "!",
      "?", ".", ",", "-", "_", "«", "é", "漢", "🙂", "\t", "\n")
    def s(): String =
      (1 to rnd.nextInt(200)).map(_ => pool(rnd.nextInt(pool.length))).mkString
    val df = ((1 to 500).map(_ => Tuple1(s())) :+ Tuple1("")).toDF("text")
    val bad = df.select(
      AlphaSpaceCount.alphaSpaceCount(col("text")).as("native"),
      length(regexp_replace(col("text"), "[^a-zA-Z ]", "")).cast("long")
        .as("composed"))
      .filter(!(col("native") <=> col("composed"))).count()
    assert(bad == 0L)
    // the swap is only legal if qualityScore itself is unchanged: compare
    // the native-backed score against the pure-SQL regex form
    val docs = ((1 to 200).map(_ => Tuple1(s())) :+ Tuple1("x y"))
      .toDF("text").withColumn("ws", TextOps.words("text"))
    val regexScore = expr(
      """(
        |  CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |       WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |  CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / size(ws)
        |            BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |  CAST(length(regexp_replace(text, '[^a-zA-Z ]', '')) AS DOUBLE)
        |    / length(text)
        |) / 3.0""".stripMargin)
    val badScore = docs.select(TextOps.qualityScore.as("native"),
        regexScore.as("regex"))
      .filter(!(col("native") <=> col("regex"))).count()
    assert(badScore == 0L)
  }

  test("jaccard_sim ≡ intersect/union composition on 500 random string sets") {
    val vocab = (1 to 40).map(i => s"tok$i")
    def set(): Seq[String] =
      rnd.shuffle(vocab).take(rnd.nextInt(vocab.size) + 1)
    val df = (1 to 500).map(_ => (set(), set())).toDF("a", "b")
    val bad = df.select(
      JaccardSim.jaccardSim(col("a"), col("b")).as("native"),
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b")))).as("composed"))
      .filter(!(col("native") <=> col("composed"))).count()
    assert(bad == 0L)
  }

  test("hash_embed_vec ≡ transform/aggregate composition on 300 random hash arrays") {
    val composed =
      """transform(sequence(0, 15), d -> aggregate(hs, 0L, (acc, h) ->
        |  acc + (h * (2 * d + 1) + 7919 * d) % 1000000007 % 2001 - 1000))"""
        .stripMargin
    // inputs are mod-P-reduced (the hashEmbed contract), plus empty edge
    val df = ((1 to 300).map { _ =>
      Tuple1(Seq.fill(rnd.nextInt(60))(math.abs(rnd.nextLong()) % 1000000007L))
    } :+ Tuple1(Seq.empty[Long])).toDF("hs")
    val bad = df.select(
      HashEmbedVec.hashEmbedVec(col("hs"), 16).as("native"),
      expr(composed).as("composed"))
      .filter(!(col("native") <=> col("composed"))).count()
    assert(bad == 0L)
  }

  test("simhash64 ≡ nested-aggregate composition on 300 random hash arrays") {
    val composed =
      """aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, k) ->
        |  acc + CASE WHEN aggregate(shash, CAST(0 AS BIGINT), (a, h) ->
        |      a + CASE WHEN shiftright(h, k) % 2 = 1 THEN 1 ELSE -1 END) > 0
        |    THEN shiftleft(CAST(1 AS BIGINT), k) ELSE 0 END)""".stripMargin
    // h64 range (60-bit positive) plus the empty array edge
    val df = ((1 to 300).map { _ =>
      Tuple1(Seq.fill(rnd.nextInt(50))(math.abs(rnd.nextLong()) % (1L << 60)))
    } :+ Tuple1(Seq.empty[Long])).toDF("shash")
    val bad = df.select(
      SimHash.simhash64(col("shash"), 32).as("native"),
      expr(composed).as("composed"))
      .filter(!(col("native") <=> col("composed"))).count()
    assert(bad == 0L)
  }

  test("minhash_sig ≡ array(array_min(transform(...))) on 300 random hash arrays") {
    val (as, bs) = TextOps.permConstants(32).unzip
    val composed = as.zip(bs).map { case (a, b) =>
      s"array_min(transform(shash, h -> (${a}L * (h % ${TextOps.P}) + ${b}L) % ${TextOps.P}))"
    }.mkString("array(", ",", ")")
    // h64 range: 60-bit positive, like the shingle hashes
    val df = (1 to 300).map { _ =>
      Tuple1(Seq.fill(rnd.nextInt(50) + 1)(math.abs(rnd.nextLong()) % (1L << 60)))
    }.toDF("shash")
    val bad = df.select(
      MinHashSig.minhashSig(col("shash"), as, bs, TextOps.P).as("native"),
      expr(composed).as("composed"))
      .filter(!(col("native") <=> col("composed"))).count()
    assert(bad == 0L)
  }

  test("rolling_grams O(1) recurrence ≡ Σ-form polynomial on 300 random word-hash arrays") {
    import RollingGrams.{P1, P2, B1, B2, powTable}
    val k = 8
    val (pw1, pw2) = (powTable(B1, k, P1), powTable(B2, k, P2))
    def sigma(wh: Seq[Long]): Seq[Long] =
      if (wh.length < k) Seq.empty
      else (0 to wh.length - k).map { i =>
        val h1 = (0 until k).map(j => (wh(i + j) % P1) * pw1(j) % P1).sum % P1
        val h2 = (0 until k).map(j => (wh(i + j) % P2) * pw2(j) % P2).sum % P2
        h1 * P2 + h2
      }
    // h64 range (60-bit positive) plus shorter-than-k and empty edges
    val rows = ((1 to 300).map { _ =>
      Tuple1(Seq.fill(rnd.nextInt(40))(math.abs(rnd.nextLong()) % (1L << 60)))
    } :+ Tuple1(Seq.empty[Long]))
    val df = rows.toDF("wh")
    val got = df.select(col("wh"),
        RollingGrams.rollingGrams(col("wh"), k).as("native"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == sigma(r.getSeq[Long](0)))
    }
  }

  test("rolling_grams normalizes NEGATIVE word hashes into [0,P) — full-range inputs") {
    import RollingGrams.{P1, P2, B1, B2, powTable}
    val k = 8
    val (pw1, pw2) = (powTable(B1, k, P1), powTable(B2, k, P2))
    def posMod(v: Long, p: Long): Long = ((v % p) + p) % p
    def sigma(wh: Seq[Long]): Seq[Long] =
      if (wh.length < k) Seq.empty
      else (0 to wh.length - k).map { i =>
        val h1 = (0 until k).map(j => posMod(wh(i + j), P1) * pw1(j) % P1).sum % P1
        val h2 = (0 until k).map(j => posMod(wh(i + j), P2) * pw2(j) % P2).sum % P2
        h1 * P2 + h2
      }
    // full signed-long range: the expression accepts any array<bigint>,
    // and a negative element must not drive the recurrence negative
    // (advice-round finding — callers today always feed positive h64s)
    val rows = (1 to 200).map { _ =>
      Tuple1(Seq.fill(8 + rnd.nextInt(24))(rnd.nextLong()))
    }
    val df = rows.toDF("wh")
    df.select(col("wh"), RollingGrams.rollingGrams(col("wh"), k).as("native"))
      .collect()
      .foreach { r =>
        val out = r.getSeq[Long](1)
        assert(out == sigma(r.getSeq[Long](0)))
        // emitted keys stay in the canonical non-negative combined range
        out.foreach(v => assert(v >= 0 && v < P1 * P2))
      }
  }
}
