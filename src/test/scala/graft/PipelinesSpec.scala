package graft

import graft.operators.Pipelines

/** The capstone cleaning pipeline on a corpus with planted problems. */
class PipelinesSpec extends SparkSpecBase {

  test("cleanCorpus drops short, exact-dup, and near-dup docs; keeps the rest") {
    import spark.implicits._
    val vocab = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    def doc(seed: Int, n: Int = 50): String = {
      val rnd = new scala.util.Random(seed)
      Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val rows = Seq(
      1L -> doc(1),                       // keep
      2L -> doc(2),                       // keep
      3L -> doc(1),                       // exact dup of 1 -> dropped
      4L -> ("TOO short!"),               // quality-filtered (2 tokens)
      5L -> (doc(1) + " extra"),          // near-dup of 1 (j >> 0.75) -> dropped
      6L -> doc(6))                       // keep
    val out = Pipelines.cleanCorpus(rows.toDF("doc_id", "text"), "doc_id", "text",
        minTokens = 20, tau = 0.75)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 6L))
    // normalized text is lowercase, single-spaced, alphanumeric
    assert(out.forall(r => !r.getString(1).exists(c => c.isUpper || "!,.".contains(c))))
    // digests correspond to the normalized text
    assert(out.forall(r => r.getString(3).length === 32))
  }
}
