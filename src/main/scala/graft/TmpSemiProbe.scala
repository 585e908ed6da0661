package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TEMPORARY probe: semisync-LPA residual ladder on the sf0.01
  * co-purchase fixture. Deleted before commit.
  */
object TmpSemiProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val part = spark.read.parquet(s"$dir/part.parquet")
    val w = Window.partitionBy("ok")
    val items = li.filter(col("l_quantity") >= 40)
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
      .withColumn("n_items", count(lit(1)).over(w))
      .filter(col("n_items") <= 64).drop("n_items")
    val edges = items.select(col("ok"), col("l_partkey").as("src"))
      .join(items.select(col("ok"), col("l_partkey").as("dst")), "ok")
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("weight"))
    val nodes = part.select(col("p_partkey").as("node"))
    val t0 = System.nanoTime()
    val res = ops.Graph.labelPropSemiSyncResidual(nodes, edges, rounds = 12)
      .collect()
    println(s"semisync ladder (${(System.nanoTime()-t0)/1e9}s): " +
      res.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))
    spark.stop()
  }
}
