package graft
import org.apache.spark.sql.SparkSession

/** Dev-only phase profiler: runMain graft.Prof <name> [sfDir] — splits one
  * query's wall time into analyze / optimize / physical-plan / execute.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MINPART", "1m"))
      // InferFiltersFromGenerate excluded (r18): see Bench.scala — the
      // inferred pre-explode filter re-evaluates computed shingle/gram
      // expressions (serially when pushed below a spread exchange);
      // excluding it changes no results.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the session like Bench does so rep 1 isolates per-plan cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    io.Sources.table(spark, sfDir, "region").groupBy("r_name").count().collect()
    import org.apache.spark.scheduler._
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStarts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = Option(jobStarts.get(je.jobId)).getOrElse(0L)
        println(f"[prof]   job ${je.jobId}: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val run = si.taskMetrics.executorRunTime / 1e3
        val cpu = si.taskMetrics.executorCpuTime / 1e9
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield (c - s) / 1e3).getOrElse(-1.0)
        val det = si.details.linesIterator
          .filter(l => l.contains("graft") || l.contains("Dataset"))
          .take(2).mkString(" <- ")
        println(f"[prof]     stage ${si.stageId} (${si.numTasks} tasks, wall $wall%.2fs, run $run%.2fs, cpu $cpu%.2fs): ${si.name.takeWhile(_ != '\n').take(60)} | $det")
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      var t = System.nanoTime()
      def lap(label: String): Unit = {
        val now = System.nanoTime()
        println(f"[prof] $name rep $i $label: ${(now - t) / 1e9}%.2fs")
        t = now
      }
      val df = fn(spark, sfDir)
      lap("build")
      df.queryExecution.analyzed
      lap("analyze")
      df.queryExecution.optimizedPlan
      lap("optimize")
      df.queryExecution.executedPlan
      lap("physical")
      val n = df.count()
      lap(s"execute(rows=$n)")
      // cold-cache between reps, matching Bench/QBench methodology (r17)
      graft.releaseCheckpoints(df)
      CacheScope.release(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
