package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random equivalence of the round-9 operators against plain
  * Scala reference implementations (same offline-scalacheck convention
  * as core.PropertySpec): interval merge vs a sort-and-sweep, SCD-2 vs
  * a fold, triangle counts vs brute-force triple enumeration, and the
  * quantile sketch's 1/16 error bound on arbitrary positive longs.
  */
class Round9PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814)

  test("mergeIntervals ≡ sort-and-sweep reference on 30 random keyed sets") {
    val rows = for {
      k <- 0 until 30
      _ <- 0 until (rnd.nextInt(40) + 1)
    } yield {
      val lo = rnd.nextInt(500).toLong - 100 // negatives included
      (k.toLong, lo, lo + rnd.nextInt(60) + 1)
    }
    val got = Intervals.mergeIntervals(rows.toDF("k", "lo", "hi"), "k", "lo", "hi")
      .select("k", "lo", "hi", "n_merged")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (k, ivs) =>
      val sorted = ivs.map(i => (i._2, i._3)).sortBy(identity)
      val islands = sorted.tail.foldLeft(
        Vector((sorted.head._1, sorted.head._2, 1L))) {
        case (acc, (lo, hi)) =>
          val (alo, ahi, n) = acc.last
          if (lo > ahi) acc :+ ((lo, hi, 1L))
          else acc.init :+ ((alo, math.max(ahi, hi), n + 1))
      }
      islands.map { case (lo, hi, n) => (k, lo, hi, n) }
    }.toSet
    assert(got == want)
  }

  test("scd2 ≡ run-collapse fold on 20 random state logs") {
    val rows = for {
      k <- 0 until 20
      i <- 0 until (rnd.nextInt(30) + 1)
    } yield (k.toLong, rnd.nextInt(50).toLong,
      s"s${rnd.nextInt(4)}", (k * 1000 + i).toLong)
    val got = Intervals.scd2(rows.toDF("k", "ts", "state", "id"),
        "k", "ts", "state", "id")
      .select("k", "state", "valid_from", "valid_to", "version_n")
      .as[(Long, String, Long, Option[Long], Long)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (k, log) =>
      val ordered = log.sortBy(r => (r._2, r._4))
      val runs = ordered.foldLeft(Vector.empty[(String, Long)]) {
        case (acc, (_, ts, st, _)) =>
          if (acc.nonEmpty && acc.last._1 == st) acc
          else acc :+ ((st, ts))
      }
      runs.zipWithIndex.map { case ((st, from), i) =>
        val to = if (i + 1 < runs.size) Some(runs(i + 1)._2) else None
        (k, st, from, to, (i + 1).toLong)
      }
    }.toSet
    assert(got == want)
  }

  test("triangleCounts ≡ brute-force enumeration on 10 random graphs") {
    for (trial <- 0 until 10) {
      val n = rnd.nextInt(15) + 5
      val edges = (0 until (n * 2)).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).distinct
      val got = graft.llm.Graphs.triangleCounts(
          edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toMap
      val adj = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e, e.swap)).toSet
      val tris = for {
        a <- 0L until n.toLong; b <- a + 1 until n.toLong
        c <- b + 1 until n.toLong
        if adj((a, b)) && adj((b, c)) && adj((a, c))
      } yield Seq(a, b, c)
      val want = tris.flatten.groupBy(identity)
        .map { case (id, occ) => id -> occ.size.toLong }
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("quantile sketch honors the 1/16 bound on arbitrary positive longs") {
    // full long range INCLUDING values past 2^59 — the sub-cell must
    // never form the overflowing 16·v product (logBucket's CASE split)
    // & MaxValue, not math.abs: abs(Long.MinValue) is still negative
    val vs = Seq.fill(2000)((rnd.nextLong() & Long.MaxValue) % 100000000L + 1L) ++
      Seq.fill(1000)((rnd.nextLong() & Long.MaxValue) % (Long.MaxValue - 1) + 1L)
    val sk = graft.llm.Sketches.histQuantiles(
        graft.llm.Sketches.logHistogram(vs.toDF("v"), "v"),
        Seq(5, 25, 50, 75, 95))
      .as[(Int, Long)].collect()
    val sorted = vs.sorted
    for ((q, got) <- sk) {
      val exact = sorted(math.ceil(q / 100.0 * sorted.size).toInt - 1)
      // bound via BigInt: exact can sit near Long.MaxValue
      assert((BigInt(got) - BigInt(exact)).abs * 16 <= BigInt(exact),
        s"P$q: $got vs $exact")
    }
  }
}
