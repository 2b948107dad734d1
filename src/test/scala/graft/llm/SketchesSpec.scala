package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def values(group: String, n: Int, salt: String) =
    (0 until n).map(i => (group, s"$salt-$i")).toDF("g", "v")

  test("estimate lands within the 512-register error envelope above 2.5m") {
    // 3σ of the raw estimator's 1.04/√512 ≈ 4.6% standard error ≈ 14%
    for (n <- Seq(2000, 20000)) {
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(values("a", n, "x"), "g", "v"), "g")
        .select("hll_estimate").as[Double].head()
      assert(math.abs(est - n) / n < 0.14, s"n=$n est=$est")
    }
  }

  test("small range flags itself and occupancy is the near-exact reading") {
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(values("a", 100, "s"), "g", "v"), "g")
      .select("small_range", "n_occupied").as[(Boolean, Long)].head()
    assert(est._1) // raw estimator reads ~alpha*m here, flagged
    assert(math.abs(est._2 - 100L) <= 15L) // collisions < 10% at n << m
  }

  test("merged registers equal the sketch of the union (mergeability)") {
    val a = values("a", 5000, "left")
    val b = values("b", 5000, "right") // overlap via same salt tail
    val regsSplit = Sketches.hllRegisters(a.unionByName(b), "g", "v")
    val merged = Sketches.hllMerge(regsSplit, "g", "u")
      .select("bucket", "reg")
    val direct = Sketches.hllRegisters(
      a.unionByName(b).withColumn("g", lit("u")), "g", "v")
      .select("bucket", "reg")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("registers are deterministic under repartitioning") {
    val df = values("a", 3000, "p")
    val r1 = Sketches.hllRegisters(df, "g", "v").select("bucket", "reg")
    val r2 = Sketches.hllRegisters(df.repartition(17), "g", "v")
      .select("bucket", "reg")
    assert(r1.exceptAll(r2).isEmpty && r2.exceptAll(r1).isEmpty)
  }

  test("ranks stay in [1, 52] and buckets in [0, 512)") {
    val regs = Sketches.hllRegisters(values("a", 10000, "q"), "g", "v")
    assert(regs.filter(col("reg") < 1 || col("reg") > 52).count() == 0)
    assert(regs.filter(col("bucket") < 0 || col("bucket") >= 512).count() == 0)
  }

  test("count-min estimates never undercount and are exact at low load") {
    // skewed stream: value i repeated (i%7)+1 times over 500 distinct
    // keys — ~0.5 keys/slot, so P(min collision-free) = 1-(1-e^-0.49)^4
    // ≈ 0.98 per key
    val stream = (0 until 500).flatMap(i => Seq.fill(i % 7 + 1)(s"w$i"))
      .toDF("v")
    val counters = Sketches.countMinCounters(stream, "v")
    val exact = stream.groupBy("v").agg(count(lit(1)).as("exact"))
    val est = Sketches.countMinLookup(counters, exact.select("v"), "v")
      .join(exact, Seq("v"))
    assert(est.filter(col("cm_estimate") < col("exact")).count() == 0)
    val exactFrac = est.filter(col("cm_estimate") === col("exact")).count()
    assert(exactFrac > 450, s"only $exactFrac exact")
  }

  test("count-min counters merge by addition") {
    val a = (0 until 1000).map(i => s"x$i").toDF("v")
    val b = (500 until 1500).map(i => s"x$i").toDF("v")
    val mergedGrids = Sketches.countMinCounters(a, "v")
      .unionByName(Sketches.countMinCounters(b, "v"))
      .groupBy("j", "slot").agg(sum("cnt").as("cnt"))
    val direct = Sketches.countMinCounters(a.unionByName(b), "v")
    assert(mergedGrids.exceptAll(direct).isEmpty &&
      direct.exceptAll(mergedGrids).isEmpty)
  }

  test("bloom has no false negatives and a tiny FP rate at 1000 keys") {
    val members = (0 until 1000).map(i => s"in$i").toDF("v")
    val bloom = Sketches.bloomBuild(members, "v")
    val hits = Sketches.bloomProbe(bloom, members, "v")
    assert(hits.filter(!col("in_bloom")).count() == 0)
    val outsiders = (0 until 1000).map(i => s"out$i").toDF("v")
    val fp = Sketches.bloomProbe(bloom, outsiders, "v")
      .filter(col("in_bloom")).count()
    assert(fp < 5, s"$fp false positives") // expected ~0.01 at this load
  }

  test("bloom filters merge by bitwise OR") {
    val a = (0 until 600).map(i => s"a$i").toDF("v")
    val b = (0 until 600).map(i => s"b$i").toDF("v")
    val merged = Sketches.bloomBuild(a, "v")
      .unionByName(Sketches.bloomBuild(b, "v"))
      .groupBy("word_idx").agg(expr("bit_or(bits)").as("bits"))
    val direct = Sketches.bloomBuild(a.unionByName(b), "v")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("cm inner product never undercounts the true join size") {
    // skewed keys: key i appears i times in a, (11-i) times in b
    val a = (1 to 10).flatMap(i => Seq.fill(i)(s"k$i")).toDF("v")
    val b = (1 to 10).flatMap(i => Seq.fill(11 - i)(s"k$i")).toDF("v")
    val exact = (1 to 10).map(i => i.toLong * (11 - i)).sum
    val est = Sketches.cmInnerProduct(
      Sketches.countMinCounters(a, "v"), Sketches.countMinCounters(b, "v"))
      .as[Long].head()
    assert(est >= exact)
    // 10 keys in a 4x1024 grid: collisions are overwhelmingly unlikely,
    // so the estimate is exact here
    assert(est == exact)
  }

  test("cm inner product of disjoint key sets estimates (near) zero") {
    val a = (0 until 50).map(i => s"a$i").toDF("v")
    val b = (0 until 50).map(i => s"b$i").toDF("v")
    val est = Sketches.cmInnerProduct(
      Sketches.countMinCounters(a, "v"), Sketches.countMinCounters(b, "v"))
      .as[Long].head()
    // ~2.4 expected collisions per depth at 50x50/1024 — the min over
    // 4 depths reads a few units of collision noise, vs a true 0; a
    // depth with NO collisions contributes an explicit 0 (this input
    // measures 1: depth 4's single collision wins the min)
    assert(est <= 5L)
  }

  test("cm inner product: a hot-slot product past 2^63 cannot poison the min") {
    // depth 0 carries a collision slot with cnt ≈ 4e9 on BOTH sides:
    // 1.6e19 wraps a long multiply to a NEGATIVE, which would win the
    // min fold and break the one-sided guarantee; the decimal path must
    // let the honest depths (product 10000) decide instead
    def grid(hot: Long) = (Seq((0, 5L, hot)) ++
      (1 to 3).map(j => (j, 1L, 100L))).toDF("j", "slot", "cnt")
    val est = Sketches.cmInnerProduct(grid(4000000000L), grid(4000000000L))
      .as[Long].head()
    assert(est == 10000L)
  }

  test("quantile sketch stays within the 1/16 relative-error guarantee") {
    // skewed long-tail values: i^2 over 1..2000 — crosses many octaves
    val v = (1 to 2000).map(i => i.toLong * i).toDF("v")
    val sk = Sketches.histQuantiles(Sketches.logHistogram(v, "v"),
      Seq(10, 50, 90, 99)).orderBy("q").as[(Int, Long)].collect()
    val sorted = (1 to 2000).map(i => i.toLong * i)
    for ((q, got) <- sk) {
      // exact percentile: first value whose cumulative count reaches q% of n
      val exact = sorted(math.ceil(q / 100.0 * sorted.size).toInt - 1)
      assert(math.abs(got - exact) * 16 <= exact,
        s"P$q: sketch $got vs exact $exact breaches 1/16 bound")
    }
  }

  test("quantile histograms merge by bucket-wise sum") {
    val a = (1 to 700).map(_.toLong * 3).toDF("v")
    val b = (1 to 900).map(_.toLong * 7 + 1).toDF("v")
    val merged = Sketches.logHistogram(a, "v")
      .unionByName(Sketches.logHistogram(b, "v"))
      .groupBy("bucket_id").agg(sum("c").as("c"))
    val direct = Sketches.logHistogram(a.unionByName(b), "v")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("quantile sketch is exact on point masses and drops v < 1") {
    // all mass at one value: every percentile bucket holds exactly 96
    val v = (Seq.fill(50)(96L) ++ Seq(0L, -5L)).toDF("v")
    val hist = Sketches.logHistogram(v, "v")
    assert(hist.agg(sum("c")).as[Long].head() == 50L) // 0 and -5 dropped
    val qs = Sketches.histQuantiles(hist, Seq(1, 50, 99))
      .select("sketch_v").distinct().as[Long].collect().toSeq
    assert(qs == Seq(96L)) // 96 = 64 + 8·64/16: its own bucket lower bound
  }

  test("MAD outliers: replays a straight-line median/MAD on random data " +
    "with negatives (exercising the arithmetic-shift coarse buckets)") {
    val rnd = new scala.util.Random(11)
    (0 until 3).foreach { trial =>
      val n = 50 + rnd.nextInt(200)
      // mix negatives + a heavy tail so the fence has work to do
      val vals = (0 until n).map(_ => rnd.nextLong() % 5000L) ++
        Seq.fill(5)(900000L + rnd.nextInt(1000)) ++ Seq(-800000L)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val got = Sketches.madOutliers(df, "v", k = 2)
        .as[(Long, Long, Long, Long)].head()
      val sorted = vals.sorted
      def lowerMedian(xs: Seq[Long]): Long = {
        val k = (xs.length + 1) / 2
        xs.sorted.apply(k - 1)
      }
      val med = lowerMedian(sorted)
      val mad = lowerMedian(vals.map(v => math.abs(v - med)))
      val nOut = vals.count(v => math.abs(v - med) > 2 * mad).toLong
      assert(got == ((vals.length.toLong, med, mad, nOut)), s"trial $trial")
    }
  }

  test("per-key MAD: each key's fence matches an independent straight-" +
    "line replay, and equals the global form run on that key alone") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map { i =>
      val key = s"k${rnd.nextInt(4)}"
      val v =
        if (rnd.nextInt(20) == 0) 500000L + rnd.nextInt(100)
        else rnd.nextLong() % 3000L
      (i.toLong, key, v)
    }
    val df = rows.toDF("id", "key", "v")
    val got = Sketches.madOutliersByKey(df, "key", "v", k = 2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    def lowerMedian(xs: Seq[Long]): Long =
      xs.sorted.apply((xs.length + 1) / 2 - 1)
    rows.groupBy(_._2).foreach { case (key, ks) =>
      val vals = ks.map(_._3)
      val med = lowerMedian(vals)
      val mad = lowerMedian(vals.map(v => math.abs(v - med)))
      val nOut = vals.count(v => math.abs(v - med) > 2 * mad).toLong
      assert(got(key) == ((vals.length.toLong, med, mad, nOut)), key)
      // keyed form ≡ global form restricted to the key
      val solo = Sketches.madOutliers(
        df.filter(col("key") === key), "v", k = 2)
        .as[(Long, Long, Long, Long)].head()
      assert(solo == got(key), s"keyed vs global for $key")
    }
  }
}
