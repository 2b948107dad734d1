package graft
import org.apache.spark.sql.SparkSession
object FixTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val all = SparkEntry.queries
    all.keys.toSeq.sorted.filterNot(Bench.headline.contains).foreach { name =>
      val t0 = System.nanoTime()
      try all(name)(spark, "/root/testdata/sf0.1").count() catch { case _: Throwable => () }
      println(f"[fixtime] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
