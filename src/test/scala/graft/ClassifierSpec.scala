package graft

import graft.ops.Classifier
import org.apache.spark.sql.functions._

/** Linear quality-classifier training: convergence on separable data,
  * bit-reproducibility under repartitioning, featurization contract,
  * and empty-corpus behavior.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // separable toy: "good" docs use vocab A, "bad" docs vocab B
  private def toy = Seq(
    (1L, "alpha beta gamma alpha", "en"),
    (2L, "beta gamma alpha beta", "en"),
    (3L, "delta epsilon zeta", "de"),
    (4L, "zeta delta epsilon epsilon", "de"),
    (5L, "alpha gamma", "en"),
    (6L, "delta zeta", "de"))
    .toDF("doc_id", "text", "lang")

  private val label = col("lang") === "en"

  test("fit: converges to the reference weights on separable data") {
    val w = Classifier.fit(toy, label, dim = 8, iters = 10, lr = 0.5)
      .as[(Int, Double)].collect().toMap
    // sequential-reference values (decimal-quantized gradients make the
    // distributed sum EXACTLY the sequential one, so these are equality
    // assertions, not tolerances)
    assert(w(5) == -3.1537455000000003)
    assert(w(8) == 3.1537455000000003)
    assert((0 to 8).filterNot(j => j == 5 || j == 8).forall(w(_) == 0.0),
      s"unexpected nonzero weights: $w")
  }

  test("fit is bit-reproducible under repartitioning") {
    val a = Classifier.fit(toy, label, dim = 8, iters = 5)
      .as[(Int, Double)].collect().toMap
    val b = Classifier.fit(toy.repartition(7), label, dim = 8, iters = 5)
      .as[(Int, Double)].collect().toMap
    assert(a == b)
  }

  test("score: separates the toy corpus perfectly") {
    val w = new Array[Double](9)
    Classifier.fit(toy, label, dim = 8, iters = 10)
      .collect().foreach(r => w(r.getInt(0)) = r.getDouble(1))
    val out = Classifier.score(toy, label, w, dim = 8)
      .as[(Long, Double, Double, Int)].collect()
    assert(out.length == 6)
    out.foreach { case (id, y, score, pred) =>
      assert(pred == y.toInt, s"doc $id mispredicted: score=$score y=$y")
      // scores should be confidently away from the 0.5 boundary
      assert(math.abs(score - 0.5) > 0.2, s"doc $id weak score $score")
    }
  }

  test("featurize: bias first, buckets sorted and distinct") {
    val fs = Classifier.featurize(toy, label, dim = 8)
      .filter(col("doc_id") === 1L)
      .select("fs").as[Seq[Int]].head()
    assert(fs.head == 0, "bias index 0 must lead")
    assert(fs.tail == fs.tail.distinct.sorted, s"buckets not sorted-distinct: $fs")
    assert(fs.tail.forall(j => j >= 1 && j <= 8))
  }

  test("fit on an empty corpus returns the zero model") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    val w = Classifier.fit(empty, label, dim = 4, iters = 3)
      .as[(Int, Double)].collect().toMap
    assert(w == (0 to 4).map(_ -> 0.0).toMap)
  }
}
