package graft
import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer: runMain graft.QBench <name> [sfDir] [reps]. */
object QBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      // InferFiltersFromGenerate excluded (r18): see Bench.scala — the
      // inferred pre-explode filter re-evaluates computed shingle/gram
      // expressions (serially when pushed below a spread exchange);
      // excluding it changes no results.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      println(f"[qbench] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      // match Bench's per-rep cold-cache methodology (r17): release the
      // operator pins and checkpoint frames so rep N+1 can't read rep N's
      // materialized intermediates — without this, pinned-model operators
      // time their cache REUSE from rep 2 on, not the query
      graft.releaseCheckpoints(df)
      CacheScope.release(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
