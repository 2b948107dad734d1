package graft.sources

import java.nio.file.Files

import graft.TestSpark
import graft.core.PersistentGraphStore
import graft.orchestrate.Orchestrator
import graft.orchestrate.Orchestrator.{Loader, Succeeded}
import org.scalatest.funsuite.AnyFunSuite

/** The minimum end-to-end corpus slice (SURVEY §7.2 step 3): vocab →
  * {doid, drugbank} through the Orchestrator into one persistent store,
  * against the reference's own golden fixtures; re-running the whole
  * corpus is a no-op.
  */
class LoadersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val doid = "/root/reference/test/data/doid.sample.json"
  val drugbank = "/root/reference/test/data/drugbank_sample.xml"

  test("doid loader: vertices + SubClassOf edges, idempotent rerun") {
    val store = new PersistentGraphStore(spark,
      Files.createTempDirectory("graft-e2e").toString)
    val c1 = Loaders.loadDoid(spark, store, doid)
    assert(c1("create") == 2L) // two nodes in the sample
    assert(c1("edges_created") == 2L) // two is_a edges
    val c2 = Loaders.loadDoid(spark, store, doid)
    assert(c2("noop") == 2L && c2.get("create").isEmpty)
    assert(c2("edges_created") == 0L)
    assert(store.read("vertices").get.count() == 2)
    assert(store.read("edges").get.count() == 2)
  }

  test("drugbank loader through the streaming rowTag scan") {
    val store = new PersistentGraphStore(spark,
      Files.createTempDirectory("graft-e2e2").toString)
    assert(Loaders.loadDrugbank(spark, store, drugbank) == Map("create" -> 1L))
    val row = store.read("therapies").get.collect().head
    assert(row.getAs[String]("sourceId") == "DB00530")
    assert(row.getAs[String]("name") == "erlotinib")
    assert(Loaders.loadDrugbank(spark, store, drugbank) == Map("noop" -> 1L))
  }

  test("orchestrated mini-corpus: vocab → {doid, drugbank}, rerun all-noop") {
    val store = new PersistentGraphStore(spark,
      Files.createTempDirectory("graft-e2e3").toString)
    val loaders = Seq(
      Loader("vocab", Seq.empty, sp => Loaders.loadVocab(sp, store)),
      Loader("doid", Seq("vocab"), sp => Loaders.loadDoid(sp, store, doid)),
      Loader("drugbank", Seq("vocab"), sp => Loaders.loadDrugbank(sp, store, drugbank)))
    val r1 = Orchestrator.run(spark, loaders)
    assert(r1.succeeded == Seq("vocab", "doid", "drugbank"))
    val r2 = Orchestrator.run(spark, loaders)
    r2.statuses.values.foreach {
      case Succeeded(counts) =>
        assert(counts.get("create").isEmpty, s"rerun created rows: $counts")
        assert(counts.getOrElse("edges_created", 0L) == 0L)
      case other => fail(s"loader did not succeed on rerun: $other")
    }
  }
}
