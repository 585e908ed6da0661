package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution
/** Dev scratch: execute one query and print the AQE FINAL plan shape of
  * every execution, to check runtime exchange reuse. Not repo contract. */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qes = new java.util.concurrent.ConcurrentLinkedQueue[QueryExecution]()
    spark.listenerManager.register(new QueryExecutionListener {
      def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = { qes.add(qe) }
      def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.count()
    Thread.sleep(2000)
    qes.forEach { qe =>
      val p = qe.executedPlan.toString
      val reused = "ReusedExchange".r.findAllIn(p).size
      val stages = "ShuffleQueryStage".r.findAllIn(p).size
      val scans = "Scan parquet".r.findAllIn(p).size
      println(s"QE reused=$reused stages=$stages scans=$scans len=${p.length}")
      if (p.length > 3000)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("/tmp/r18_exec_plan.txt"), p)
    }
    spark.stop()
  }
}
