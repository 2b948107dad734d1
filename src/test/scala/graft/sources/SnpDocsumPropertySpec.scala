package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random docsum equivalence: [[Snp.parseSnp]]'s column-expression
  * docsum parse vs a straight-line Scala transcription of the reference's
  * `parseRecord` loop (entrez/snp.js:107-130) — the FIRST `HGVS=` tag
  * wins (the reference `break`s), `&gt;` unescapes before any split, the
  * comma-split entries are `.sort().reverse()`ed (descending
  * lexicographic, so the highest accession version wins), cds = first
  * `^NM_\d+.*:c\..*` entry, protein = first `^NP_\d+.*:p\..*` entry, and
  * a docsum with no HGVS tag yields null legs — on random tag orders,
  * entry shuffles, version collisions, and absent-tag shapes the fixture
  * can't reach.
  */
class SnpDocsumPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** entrez/snp.js:121-128, transcribed. */
  private def replay(docsum: String): (Option[String], Option[String]) = {
    val tags = docsum.replace("&gt;", ">").split(";", -1)
    tags.find(_.startsWith("HGVS=")) match {
      case None => (None, None)
      case Some(tag) =>
        val notation = tag.replaceFirst("^HGVS=", "").split(",", -1)
          .toSeq.sorted.reverse
        (notation.find(n => "^NM_\\d+.*:c\\..*".r.findFirstIn(n).isDefined),
          notation.find(n => "^NP_\\d+.*:p\\..*".r.findFirstIn(n).isDefined))
    }
  }

  test("parseSnp docsum legs ≡ straight-line parseRecord replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val accs = Vector("NM_005228", "NM_004985", "NP_005219", "NP_000537",
      "NC_000007", "NR_024540")
    def entry(): String = {
      val acc = accs(rnd.nextInt(accs.size))
      val ver = rnd.nextInt(3) + 3
      val kind = if (acc.startsWith("NM")) "c" else if (acc.startsWith("NP")) "p"
        else if (rnd.nextBoolean()) "g" else "n"
      val change = kind match {
        case "c" | "g" | "n" => s"${rnd.nextInt(9000) + 10}G&gt;A"
        case _ => s"Gly${rnd.nextInt(800) + 2}Asp"
      }
      s"$acc.$ver:$kind.$change"
    }
    val docs = (0 until 200).map { i =>
      val entries = Seq.fill(rnd.nextInt(6))(entry())
      val hgvs =
        if (entries.isEmpty && rnd.nextBoolean()) None // tag with empty value
        else Some("HGVS=" + entries.mkString(","))
      val otherTags = Seq(s"SEQ=[${rnd.nextInt(4)}]", "LEN=1",
        s"GENE=G$i:${1000 + i}")
      // random tag order; ~1/5 drop the HGVS tag entirely; ~1/9 carry a
      // SECOND HGVS tag that must be ignored (first-tag break)
      val withHgvs = if (rnd.nextInt(5) == 0) otherTags
        else rnd.shuffle(otherTags ++ hgvs.toSeq ++
          (if (rnd.nextInt(9) == 0) Seq("HGVS=NM_000001.1:c.1A&gt;T") else Nil))
      (i.toString, withHgvs.mkString(";"))
    }
    val payloads = docs.map { case (uid, docsum) =>
      (uid, s"""{"uid":"$uid","snp_id":$uid,"updatedate":"2024/01/01",""" +
        s""""genes":[],"docsum":"$docsum"}""")
    }
    val got = Snp.parseSnp(payloads.toDF("id", "payload"))
      .select("sourceId", "cds", "protein").collect()
      .map(r => r.getString(0) -> (Option(r.getString(1)), Option(r.getString(2))))
      .toMap
    docs.foreach { case (uid, docsum) =>
      // the replay must see the doc exactly as the payload carried it:
      // the FIRST HGVS tag in the (shuffled) tag order decides
      assert(got(uid) == replay(docsum), s"uid=$uid docsum=$docsum")
    }
  }
}
