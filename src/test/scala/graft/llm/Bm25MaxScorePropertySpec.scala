package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random equivalence hammer for the exact-MaxScore claim: on
  * random Zipf-ish corpora (a few head words in most docs + a long rare
  * tail — the regime the pruning logic actually branches on) and random
  * query batches / k / excludeIdEq, [[Retrieval.bm25TopKMaxScore]] must
  * reproduce [[Retrieval.bm25TopK]] BIT-identically, ranks, ids and
  * micro scores included. The L0 lower bound, the strict-prefix drop,
  * and the seed-fill heuristic all have tie-sensitive edges a fixed
  * fixture can miss; deterministic seeding keeps failures replayable
  * (the scalatest↔scalacheck bridge isn't on the offline classpath —
  * same pattern as core.PropertySpec).
  */
class Bm25MaxScorePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("maxscore ≡ plain probe on 8 random Zipf corpora × batches × k") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(4242)
    (1 to 8).foreach { round =>
      val nDocs = 40 + rnd.nextInt(80)
      val nHead = 1 + rnd.nextInt(3) // words in ~most docs (tiny idf)
      val nTail = 10 + rnd.nextInt(40) // rare words (big idf)
      val docs = (1 to nDocs).map { i =>
        val head = (0 until nHead).filter(_ => rnd.nextInt(10) < 8)
          .map(h => s"h$h")
        // duplicated tail words exercise tf > 1 against the bounds
        val tail = (0 until 1 + rnd.nextInt(4))
          .map(_ => s"t${rnd.nextInt(nTail)}")
        val words = rnd.shuffle(head ++ tail ++ tail.take(rnd.nextInt(2)))
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      val index = Retrieval.buildInvIndex(docs, "doc_id", "text")
      val nQ = 2 + rnd.nextInt(5)
      val queries = (1 to nQ).map { q =>
        val words = (0 until 1 + rnd.nextInt(4)).map(_ =>
          if (rnd.nextBoolean()) s"h${rnd.nextInt(nHead)}"
          else s"t${rnd.nextInt(nTail)}")
        // qid may collide with a doc_id → excludeIdEq paths get exercised
        (1L + rnd.nextInt(nDocs + 5), words.mkString(" "))
      }.toDF("qid", "qtext")
      val k = 1 + rnd.nextInt(6)
      val ex = rnd.nextBoolean()
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val plain = rows(Retrieval.bm25TopK(queries, "qid", "qtext", index, k, ex))
      val ms = rows(
        Retrieval.bm25TopKMaxScore(queries, "qid", "qtext", index, k, ex))
      assert(ms == plain,
        s"round $round diverged (nDocs=$nDocs k=$k excludeIdEq=$ex): " +
          s"only-plain=${plain -- ms} only-maxscore=${ms -- plain}")
    }
  }
}
