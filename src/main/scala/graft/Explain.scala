package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of one (or every)
  * SparkEntry query so scale hazards (CartesianProduct, unexpected full
  * sorts, missing pushed filters) are grep-able. Dev-only; not part of the
  * driver contract.
  *
  * Usage: runMain graft.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("ALL")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
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
    val targets =
      if (name == "ALL") SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.filter(_._1 == name).toSeq
    targets.foreach { case (n, fn) =>
      println(s"===== $n =====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
