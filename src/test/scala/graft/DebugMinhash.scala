package graft

import graft.ops.text.{Dedup, TextFns}
import org.apache.spark.sql.functions._

class DebugMinhash extends SparkSpec {
  test("stage timing") {
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[mh] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val sh = Dedup.shingleSet(col("text"))
    time("shingleSet only")(docs.select(col("doc_id"), sh.as("sh")).selectExpr("sum(size(sh))").collect())
    val exploded = docs.select(col("doc_id"), explode(sh).as("s"))
    time("explode only")(exploded.count())
    val sigAggs = (0 until 16).map(p => min(md5(concat(lit(p + ":"), col("s")))).as(s"sig_$p"))
    val sigs = exploded.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
    time("signatures")(sigs.count())
    time("signatures again")(sigs.count())
    val bandCols = (0 until 8).map(j => md5(concat_ws("|", (2*j until 2*j+2).map(i => col(s"sig_$i")): _*)))
    val bandTable = sigs.select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_key")))
    val a = bandTable.select(col("band_idx"), col("band_key"), col("doc_id").as("doc_a"))
    val b = bandTable.select(col("band_idx"), col("band_key"), col("doc_id").as("doc_b"))
    val candidates = a.join(b, Seq("band_idx", "band_key"))
      .filter(col("doc_a") < col("doc_b")).select("doc_a", "doc_b").distinct()
    time("candidates")(println("cand=" + candidates.count()))
    time("full nearDupPairs")(Dedup.nearDupPairs(docs).count())
  }
}
