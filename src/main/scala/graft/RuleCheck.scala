package graft
import org.apache.spark.sql.SparkSession
/** Dev scratch: time a query with/without InferFiltersFromGenerate. */
object RuleCheck {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val exclude = args.lift(2).getOrElse("yes") == "yes"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (exclude) b.config("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      println(f"[rule excl=$exclude] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      graft.releaseCheckpoints(df)
      CacheScope.release(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
