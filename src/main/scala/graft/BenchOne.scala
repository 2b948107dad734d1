package graft
import org.apache.spark.sql.SparkSession
/** Dev harness: time one named query N times at a given sf. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    // SPARK_GRAFT_BENCHONE_CLEARCACHE=1 drops persisted blocks between
    // reps — the bench-row shape (Bench.scala clearCache()s after every
    // row), so a persist-bearing row's reps don't silently reuse the
    // previous rep's blocks through CacheManager plan-matching
    val clear = sys.env.get("SPARK_GRAFT_BENCHONE_CLEARCACHE").contains("1")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[benchone] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (clear) spark.catalog.clearCache()
    }
    spark.stop()
  }
}
