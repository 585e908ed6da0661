package graft
import org.apache.spark.sql.SparkSession
/** Dev scratch: time one query with the loop-AQE kill switch on/off. */
object LoopAqeCheck {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val loopAqe = args.lift(2).getOrElse("true")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.graft.loop.aqe", loopAqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      println(f"[loopaqe=$loopAqe] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      graft.releaseCheckpoints(df)
      CacheScope.release(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
