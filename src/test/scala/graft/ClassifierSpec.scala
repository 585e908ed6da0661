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

  test("property: fit == sequential reference (md5 buckets, dec6 gradients) on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def bucket(tok: String, dim: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
      Integer.parseInt(hex, 16) % dim + 1
    }
    def refFit(docs: Seq[(String, Double)], dim: Int, iters: Int,
               lr: Double): Array[Double] = {
      val feats = docs.map { case (text, y) =>
        (0 +: text.split(" ").map(bucket(_, dim)).distinct.sorted.toSeq, y)
      }
      val w = Array.fill(dim + 1)(0.0)
      for (_ <- 1 to iters) {
        val grad = Array.fill(dim + 1)(BigDecimal(0))
        for ((fs, y) <- feats) {
          var z = 0.0
          fs.foreach(j => z = z + w(j)) // ordered fold, matches zOf
          val s = 0.5 + 0.5 * z / (1.0 + math.abs(z))
          val e = BigDecimal(s - y).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          fs.foreach(j => grad(j) = grad(j) + e)
        }
        for (j <- 0 to dim) w(j) = w(j) - lr * grad(j).toDouble
      }
      w
    }
    val vocab = Vector("ape", "bee", "cat", "dog", "elk", "fox", "gnu")
    val docGen = for {
      toks <- Gen.nonEmptyListOf(Gen.oneOf(vocab))
      y <- Gen.oneOf(0.0, 1.0)
    } yield (toks.mkString(" "), y)
    (0 until 6).foreach { i =>
      val docs = Gen.nonEmptyListOf(docGen)
        .apply(Gen.Parameters.default, Seed(200L + i)).get
      val expected = refFit(docs, dim = 8, iters = 5, lr = 0.5)
      val df = docs.zipWithIndex
        .map { case ((t, y), id) => (id.toLong, t, y) }
        .toDF("doc_id", "text", "y0")
      val got = new Array[Double](9)
      Classifier.fit(df, col("y0") === 1.0, dim = 8, iters = 5)
        .collect().foreach(r => got(r.getInt(0)) = r.getDouble(1))
      assert(got.toSeq == expected.toSeq, s"seed $i")
    }
  }

  test("thresholdSweep: confusion counts tie out against score() at " +
    "every threshold; ratios null on empty denominators") {
    val wRows = Classifier.fit(toy, label, dim = 8, iters = 10, lr = 0.5)
      .collect()
    val w = new Array[Double](wRows.length)
    wRows.foreach(r => w(r.getInt(0)) = r.getDouble(1))
    val scored = Classifier.score(toy, label, w, dim = 8)
      .select("y", "score").as[(Double, Double)].collect()
    val sweep = Classifier.thresholdSweep(toy, label, w, dim = 8,
      thresholds = Seq(0.0, 0.5, 1.1))
      .orderBy("threshold")
      .as[(Double, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect()
    sweep.foreach { case (th, tp, fp, fn, tn, prec, rec) =>
      val kp = scored.count { case (y, s) => s >= th && y == 1.0 }
      val kn = scored.count { case (y, s) => s >= th && y != 1.0 }
      assert((tp, fp) == (kp.toLong, kn.toLong), s"counts at $th")
      assert(tp + fp + fn + tn == scored.length.toLong)
      assert(prec == (if (tp + fp > 0) Some(tp.toDouble / (tp + fp)) else None))
      assert(rec == (if (tp + fn > 0) Some(tp.toDouble / (tp + fn)) else None))
    }
    // threshold 0.0 keeps everything (fn = 0, recall 1); 1.1 keeps
    // nothing (precision NULL, not NaN)
    assert(sweep.head._7.contains(1.0))
    assert(sweep.last._6.isEmpty && sweep.last._2 == 0L)
  }

  test("NULL text is excluded from training and scoring, not silently nulled") {
    val withNull = Seq(
      (1L, Some("alpha beta"), "en"),
      (2L, None: Option[String], "en"),
      (3L, Some("delta zeta"), "de"))
      .toDF("doc_id", "text", "lang")
    val feats = Classifier.featurize(withNull, label, dim = 8)
    assert(feats.count() == 2 && feats.filter(col("doc_id") === 2L).isEmpty)
    val w = new Array[Double](9)
    Classifier.fit(withNull, label, dim = 8, iters = 2)
      .collect().foreach(r => w(r.getInt(0)) = r.getDouble(1))
    val scored = Classifier.score(withNull, label, w, dim = 8)
    assert(scored.count() == 2, "null-text doc must not appear in scores")
    assert(scored.filter(col("score").isNull).isEmpty)
  }

  test("fit on an empty corpus returns the zero model") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    val w = Classifier.fit(empty, label, dim = 4, iters = 3)
      .as[(Int, Double)].collect().toMap
    assert(w == (0 to 4).map(_ -> 0.0).toMap)
  }

  test("calibrationCurve: bin invariants — weighted rates recompose the corpus") {
    val w = Classifier.fit(toy, label, dim = 8, iters = 10, lr = 0.5)
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    val rows = Classifier.calibrationCurve(toy, label, w, dim = 8, nBins = 10)
      .orderBy("bin").collect()
    val n = rows.map(_.getLong(1)).sum
    assert(n == 6L)
    // weighted pos_rate over bins recomposes the corpus positive rate
    val pos = rows.map(r => r.getLong(1) * r.getDouble(r.fieldIndex("pos_rate"))).sum
    assert(math.abs(pos - 3.0) < 1e-9)
    rows.foreach { r =>
      val bin = r.getInt(0)
      assert(bin >= 0 && bin <= 9)
      val ms = r.getDouble(r.fieldIndex("mean_score"))
      // mean score lies in (or within dec6 quantization of) its bin
      assert(ms >= bin / 10.0 - 1e-6 && ms <= (bin + 1) / 10.0 + 1e-6)
      assert(r.getDouble(r.fieldIndex("gap")) ==
        ms - r.getDouble(r.fieldIndex("pos_rate")))
    }
    // a separable, converged model is sharply calibrated: only the
    // extreme bins appear
    assert(rows.map(_.getInt(0)).forall(b => b <= 1 || b >= 8))
  }
}
