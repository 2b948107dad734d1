package graft

import org.apache.spark.sql.SparkSession

import graft.orchestrate.{FullCorpus, Orchestrator}

/** g14_full_dag cost-attribution main (PLANS.md round 14): runs the
  * whole-corpus DAG exactly as the g14 bench row does (two passes into one
  * persistent store — the second pass is the idempotency re-run) but
  * SEQUENTIALLY (parallelism = 1) with per-loader wall timing and the
  * [[graft.core.StoreTimers]] counters, so every second of the bench row's
  * cost lands on a (loader, store-entry/outside) cell. Store-entry time
  * includes materializing each loader's lazy incoming frame (the store's
  * first action executes the parse/resolve plan), so the split reads as
  * "time triggered by store round-trips" vs "driver-side orchestration +
  * actions outside the store"; `writeNanos` isolates the physical parquet
  * write floor inside that.
  *
  * Output: one JSON line per loader per pass
  * `{"pass":1,"loader":"ncit","wall":s,"store":s,"write":s,"merges":n}`
  * plus a `{"total":...}` summary line. Not part of the driver contract —
  * a measurement tool.
  */
object BenchDag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up outside the timed region (same as Bench)
    spark.range(1000000).selectExpr("sum(id)").collect()

    // `concurrent` mode: the EXACT g14 bench-row shape (two
    // FullCorpus.run passes into one store, default level parallelism)
    // with per-level wall times — the decomposition that says whether a
    // slow g14 reading is one level (driver-bound: lock contention or
    // level-parallelism starvation) or spread evenly (ambient). Run it
    // in a quiet window and compare the level profile across readings.
    if (args.headOption.contains("concurrent")) {
      val scratch2 = java.nio.file.Files
        .createTempDirectory("graft-benchdag-conc").toString
      val store2 = new core.PersistentGraphStore(spark, scratch2)
      val ncit2 = FullCorpus.writeNcitSample()
      for (pass <- 1 to 2) {
        val tp = System.nanoTime()
        FullCorpus.run(spark, store2, ncit2,
          onLevelDone = (level, sec) =>
            println(f"""{"pass":$pass,"level":"${level.mkString("+")}","wall":$sec%.2f}"""))
        println(f"""{"pass":$pass,"level":"__pass_total","wall":${(System.nanoTime() - tp) / 1e9}%.2f}""")
      }
      spark.stop()
      return
    }

    val scratch = java.nio.file.Files
      .createTempDirectory("graft-benchdag").toString
    val store = new core.PersistentGraphStore(spark, scratch)
    val ncit = FullCorpus.writeNcitSample()
    val t0All = System.nanoTime()
    var grandStore = 0L
    var grandWrite = 0L

    for (pass <- 1 to 2) {
      // wrap every loader's body with wall timing + counter deltas;
      // sequential run (parallelism = 1) keeps the deltas disjoint
      val timed = FullCorpus.loaders(store, ncit).map { l =>
        l.copy(run = sp => {
          val (e0, w0, m0) = core.StoreTimers.snapshot()
          val t0 = System.nanoTime()
          val out = l.run(sp)
          val wall = (System.nanoTime() - t0) / 1e9
          val (e1, w1, m1) = core.StoreTimers.snapshot()
          println(f"""{"pass":$pass,"loader":"${l.name}","wall":$wall%.2f,""" +
            f""""store":${(e1 - e0) / 1e9}%.2f,"write":${(w1 - w0) / 1e9}%.2f,""" +
            s""""merges":${m1 - m0}}""")
          out
        })
      }
      core.StoreTimers.reset()
      val tp = System.nanoTime()
      try Orchestrator.run(spark, timed, parallelism = 1,
        beforeLevel = () => store.pinVersions(),
        afterLevel = () => store.unpinVersions())
      finally store.unpinVersions()
      val (e, w, m) = core.StoreTimers.snapshot()
      grandStore += e; grandWrite += w
      println(f"""{"pass":$pass,"loader":"__pass_total","wall":${(System.nanoTime() - tp) / 1e9}%.2f,""" +
        f""""store":${e / 1e9}%.2f,"write":${w / 1e9}%.2f,"merges":$m,""" +
        f""""touch":${core.StoreTimers.touchNanos.get() / 1e9}%.2f,""" +
        f""""readplan":${core.StoreTimers.readPlanNanos.get() / 1e9}%.2f}""")
    }
    val tv = System.nanoTime()
    store.vacuumAll()
    println(f"""{"vacuum":${(System.nanoTime() - tv) / 1e9}%.2f,""" +
      f""""total":${(System.nanoTime() - t0All) / 1e9}%.2f,""" +
      f""""store_total":${grandStore / 1e9}%.2f,"write_total":${grandWrite / 1e9}%.2f}""")
    spark.stop()
  }
}
