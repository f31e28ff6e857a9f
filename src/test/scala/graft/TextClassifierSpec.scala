package graft

import org.apache.spark.sql.functions._

import graft.operators.TextClassifier
import graft.operators.TextClassifier.Scale

/**
 * Distributed classifier training: bit-exact replay by a single-node
 * reference (the fixed-point gradient makes the distributed sum exact),
 * determinism across partitionings, and actual learning on separable
 * data.
 */
class TextClassifierSpec extends SparkSpecBase {

  /** Single-node reference: identical fold order (feats sorted by
    * bucket), identical fixed-point quantization. */
  private def refTrain(rows: Seq[(Double, Seq[(Int, Long)])],
      epochs: Int, lr: Double = 0.5, l2: Double = 1e-4): Array[Double] = {
    val n = rows.size.toDouble
    val w = new Array[Double](TextClassifier.NumBuckets + 1)
    (1 to epochs).foreach { _ =>
      val gradFx = new Array[Long](TextClassifier.NumBuckets + 1)
      rows.foreach { case (y, feats) =>
        var dot = 0.0
        feats.foreach { case (b, c) => dot += w(b + 1) * c }
        val p = 1.0 / (1.0 + math.exp(-dot))
        val e = math.floor((p - y) * Scale).toLong
        feats.foreach { case (b, c) => gradFx(b + 1) += e * c }
      }
      var i = 0
      while (i < w.length) {
        val reg = if (i == 0) 0.0 else l2 * w(i)
        w(i) -= lr * (gradFx(i).toDouble / Scale / n + reg)
        i += 1
      }
    }
    w
  }

  private def collectedFeats(f: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    f.select(col("y"), col("feats"))
      .as[(Double, Seq[(Int, Long)])]
      .collect()
      .toSeq
  }

  // separable synthetic corpus: positives speak vocab A, negatives vocab B
  private def synthetic(n: Int) = {
    import spark.implicits._
    val va = Seq("good", "clean", "prose", "article", "essay")
    val vb = Seq("spam", "click", "winner", "casino", "pills")
    (0 until n).map { i =>
      val pos = i % 2 == 0
      val v = if (pos) va else vb
      val text = (0 until 12).map(j => v((i + j) % v.size)).mkString(" ")
      (i.toLong, text, if (pos) 1.0 else 0.0)
    }.toDF("doc_id", "text", "y")
  }

  test("native errFx kernel is bit-identical to the composable fold (r18)") {
    // the hot path swapped the interpreted ArrayAggregate fold for the
    // fused ClassifierErrFx codegen loop — same IEEE op sequence; assert
    // the two formulations agree on real features under non-zero weights
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("y", (col("lang") === "en").cast("double"))
    val f = TextClassifier.features(docs, "y").persist()
    val rnd = new scala.util.Random(7)
    val w = Array.fill(TextClassifier.NumBuckets + 1)(rnd.nextDouble() - 0.5)
    val composable = floor((TextClassifier.pOf(w) - col("y")) * Scale)
      .cast("long")
    val native = graft.plans.kernels.classifierErrFx(
      col("feats"), col("y"), w, Scale.toDouble)
    val diff = f.select(composable.as("a"), native.as("b"))
      .filter(col("a") =!= col("b")).count()
    f.unpersist()
    assert(diff === 0L)
  }

  test("distributed training replays the single-node reference bit-for-bit") {
    val docs = synthetic(200)
    val f = TextClassifier.features(docs, "y")
    val got = TextClassifier.train(f, epochs = 8).weights
    val want = refTrain(collectedFeats(f), epochs = 8)
    assert(got.toSeq === want.toSeq) // exact doubles, not approximate
  }

  test("replay equality holds on real documents with weak labels") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("y", (col("lang") === "en").cast("double"))
    val f = TextClassifier.features(docs, "y")
    val got = TextClassifier.train(f, epochs = 5).weights
    val want = refTrain(collectedFeats(f), epochs = 5)
    assert(got.toSeq === want.toSeq)
  }

  test("training is deterministic across partitionings") {
    val docs = synthetic(150)
    val a = TextClassifier.train(
      TextClassifier.features(docs, "y"), epochs = 6).weights
    val b = TextClassifier.train(
      TextClassifier.features(docs.repartition(13), "y"), epochs = 6).weights
    assert(a.toSeq === b.toSeq)
  }

  test("the model learns: loss falls and separable data classifies cleanly") {
    import spark.implicits._
    val docs = synthetic(300)
    val m = TextClassifier.train(
      TextClassifier.features(docs, "y"), epochs = 25)
    assert(m.epochLoss.last < m.epochLoss.head / 4,
      s"loss barely moved: ${m.epochLoss.head} -> ${m.epochLoss.last}")
    val scored = TextClassifier.score(docs, m)
      .join(docs.select("doc_id", "y"), "doc_id")
    val acc = scored
      .select(avg((col("keep") === (col("y") === 1.0)).cast("double")))
      .as[Double].head()
    assert(acc >= 0.98, s"accuracy $acc on separable data")
  }

  test("feature frame invariants: sorted buckets, bias once, empty docs survive") {
    import spark.implicits._
    val docs = Seq((0L, "a a b", 1.0), (1L, "", 0.0), (2L, "???", 0.0))
      .toDF("doc_id", "text", "y")
    val f = TextClassifier.features(docs, "y")
      .as[(Long, Double, Seq[(Int, Long)])].collect().sortBy(_._1)
    assert(f.length === 3) // token-less docs still carry the bias feature
    f.foreach { case (_, _, feats) =>
      assert(feats.count(_._1 == -1) === 1)
      assert(feats.find(_._1 == -1).get._2 === 1L)
      assert(feats.map(_._1) === feats.map(_._1).sorted)
    }
    // "a a b" = two buckets, 'a' counted twice
    val t0 = f.find(_._1 == 0L).get._3.filter(_._1 >= 0)
    assert(t0.map(_._2).sorted === Seq(1L, 2L))
  }
}
