package graft.orchestrate

import org.apache.spark.sql.SparkSession

/** §2.11 — whole-corpus orchestration: the reference coordinates ~30
  * loaders through a Snakemake DAG (Snakefile:32-46 `rule all`; per-loader
  * `dependencies` exports, e.g. drugbank/index.js:339,
  * oncotree/index.js:291). This is the same topology as a library: loaders
  * declare dependencies by name, the runner executes them in topological
  * order, isolates failures (a failed loader skips its dependents, not the
  * whole corpus), and aggregates per-loader audit counters.
  *
  * Scale: ordering is driver-side metadata; each loader body is ordinary
  * distributed Spark. Independent loaders could be submitted concurrently —
  * the deterministic level-order here keeps logs and reruns reproducible
  * (levels are the Snakemake parallelism unit too).
  */
object Orchestrator {

  case class Loader(
      name: String,
      dependencies: Seq[String] = Seq.empty,
      run: SparkSession => Map[String, Long])

  sealed trait Status
  case class Succeeded(counts: Map[String, Long]) extends Status
  case class Failed(error: String) extends Status
  case class Skipped(failedDeps: Seq[String]) extends Status

  case class Report(order: Seq[String], statuses: Map[String, Status]) {
    def succeeded: Seq[String] = order.filter(n => statuses(n).isInstanceOf[Succeeded])
  }

  /** Deterministic topological order (Kahn's, name-sorted within each
    * level). Throws on unknown dependencies or cycles.
    */
  def topoOrder(loaders: Seq[Loader]): Seq[String] = {
    val byName = loaders.map(l => l.name -> l).toMap
    loaders.flatMap(_.dependencies).distinct.foreach { d =>
      require(byName.contains(d), s"unknown dependency '$d'")
    }
    var remaining = loaders.map(l => l.name -> l.dependencies.toSet).toMap
    val order = Seq.newBuilder[String]
    while (remaining.nonEmpty) {
      val ready = remaining.filter(_._2.isEmpty).keys.toSeq.sorted
      require(ready.nonEmpty,
        s"dependency cycle among: ${remaining.keys.toSeq.sorted.mkString(", ")}")
      order ++= ready
      remaining = remaining.removedAll(ready)
        .view.mapValues(_ -- ready).toMap
    }
    order.result()
  }

  /** Run all loaders respecting dependencies; a failure marks its
    * transitive dependents Skipped (the reference's per-loader error
    * isolation, §7.4 risk 5).
    */
  def run(spark: SparkSession, loaders: Seq[Loader]): Report = {
    val byName = loaders.map(l => l.name -> l).toMap
    val order = topoOrder(loaders)
    val statuses = scala.collection.mutable.Map.empty[String, Status]
    order.foreach { name =>
      val loader = byName(name)
      val badDeps = loader.dependencies.filterNot(d =>
        statuses.get(d).exists(_.isInstanceOf[Succeeded]))
      if (badDeps.nonEmpty) statuses(name) = Skipped(badDeps)
      else statuses(name) =
        try Succeeded(loader.run(spark))
        catch { case e: Exception => Failed(e.getMessage) }
    }
    Report(order, statuses.toMap)
  }
}
