package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random J12 equivalence: [[DiffMerge.contentMatch]] vs a
  * straight-line Scala replay of the reference's `contentMatching`
  * (civic/statement.js:56-178) — the 1×1 auto-match, the
  * conditions+subject greedy pass, the subject-alone pass, the artificial
  * index pairing, and the create/delete residues.
  *
  * Equivalence ground: the reference's greedy first-match over
  * id-ORDERED lists is exactly a per-key zip in id order (each incoming
  * takes the first unmatched existing with an equal key, i.e. the n-th
  * incoming of a key pairs the n-th existing of that key), and its
  * artificial `toCreate[i] ↔ toDelete[i]` pairing over id-ordered
  * residues is exactly the distributed global zip. The replay below
  * implements the REFERENCE's list algorithm verbatim (mutable lists,
  * indexWhere/splice), so the two can only agree if DiffMerge's
  * relational re-expression preserves the semantics on every random
  * corpus — key collisions, unbalanced groups, empty sides, 1×1.
  */
object DiffTiersPropertySpec {
  // top-level so the Spark Encoder derivation can see it
  case class Rec(id: Long, cond: String, subj: String)
}

class DiffTiersPropertySpec extends AnyFunSuite {
  import DiffTiersPropertySpec.Rec
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Out = (Option[Long], Option[Long], String, Option[Int])

  /** statement.js:56-178, transcribed: lists processed in id order. */
  private def replay(civic0: Seq[Rec], gkb0: Seq[Rec]): Set[Out] = {
    val civic = civic0.sortBy(_.id)
    val gkb = gkb0.sortBy(_.id)
    // MATCHING ONE TO ONE (:75-78)
    if (civic.length == 1 && gkb.length == 1)
      return Set((Some(civic.head.id), Some(gkb.head.id), "match", Some(0)))
    val updates = scala.collection.mutable.ListBuffer.empty[(Long, Long, Int)]
    // MATCHING ON CONDITIONS AND SUBJECT (:84-107)
    val remaining = scala.collection.mutable.ListBuffer(gkb: _*)
    var creates = List.empty[Rec]
    civic.foreach { el =>
      val i = remaining.indexWhere(g => g.cond == el.cond && g.subj == el.subj)
      if (i >= 0) { updates += ((el.id, remaining(i).id, 1)); remaining.remove(i); () }
      else creates :+= el
    }
    val deletes = remaining // records.toDelete (:108)
    // MATCHING ON SUBJECT ALONE (:113-143)
    if (math.min(creates.length, deletes.length) > 0) {
      var rem = List.empty[Rec]
      creates.foreach { el =>
        val i = deletes.indexWhere(_.subj == el.subj)
        if (i >= 0) { updates += ((el.id, deletes(i).id, 2)); deletes.remove(i); () }
        else rem :+= el
      }
      creates = rem
    }
    // ARTIFICIAL MATCHING WITHOUT COMPARISON (:150-175)
    val n = math.min(creates.length, deletes.length)
    (0 until n).foreach(i => updates += ((creates(i).id, deletes(i).id, 3)))
    creates = creates.drop(n)
    val delLeft = deletes.drop(n)
    updates.map { case (a, b, t) =>
      (Some(a), Some(b), "match", Some(t)): Out }.toSet ++
      creates.map(c => (Some(c.id), None, "create", None): Out) ++
      delLeft.map(d => (None, Some(d.id), "delete", None): Out)
  }

  test("contentMatch ≡ reference greedy replay on random corpora") {
    for (trial <- 0 until 6) {
      val rnd = new scala.util.Random(7117 + trial)
      // small key pools force collisions: multiple rows per (cond, subj),
      // per subj, and cross-key artificial residue
      def recs(n: Int, idBase: Long) = (0 until n).map { i =>
        Rec(idBase + i, s"c${rnd.nextInt(4)}", s"s${rnd.nextInt(3)}")
      }
      // include the degenerate shapes: empty sides and the 1×1 auto-match
      val (nc, ng) = trial match {
        case 0 => (1, 1)
        case 1 => (0, rnd.nextInt(10))
        case 2 => (rnd.nextInt(10), 0)
        case _ => (rnd.nextInt(40), rnd.nextInt(40))
      }
      val civic = recs(nc, 1000L)
      val gkb = recs(ng, 5000L)
      val got = DiffMerge.contentMatch(
        civic.toDF("id", "cond", "subj"), "id",
        gkb.toDF("id", "cond", "subj").withColumnRenamed("id", "eid"), "eid",
        tiers = Seq(Seq("cond", "subj"), Seq("subj")),
        artificialFinal = true)
        .select(col("incoming_id"), col("existing_id"), col("bucket"), col("tier"))
        .as[(Option[Long], Option[Long], String, Option[Int])]
        .collect().toSet
      assert(got == replay(civic, gkb),
        s"trial $trial (nc=$nc ng=$ng): diff=${got.diff(replay(civic, gkb))} / ${replay(civic, gkb).diff(got)}")
    }
  }
}
