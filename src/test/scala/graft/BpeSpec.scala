package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.operators.BpeTrainer

/**
 * BPE trainer: exactness of the sequential mode against an independent
 * single-node reference, bounded drift of the batched scale mode,
 * encoder/trainer equivalence, and determinism.
 */
class BpeSpec extends SparkSpecBase {

  // ---- single-node reference implementation (Sennrich BPE) ---------------

  private def refPreTokens(text: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(BpeTrainer.PreToken).matcher(text)
    val out = mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toSeq
  }

  private def refMergePass(sy: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < sy.length) {
      if (j < sy.length - 1 && sy(j) == l && sy(j + 1) == r) { out += (l + r); j += 2 }
      else { out += sy(j); j += 1 }
    }
    out.result()
  }

  /** Exact sequential BPE over a word-count dictionary; ties break on
    * (count desc, left, right) like the trainer. */
  private def refTrain(wc: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var dict: Map[Vector[String], Long] =
      wc.map { case (w, c) => w.map(_.toString).toVector -> c }
    val merges = mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (merges.size < n && !done) {
      val pairs = mutable.HashMap.empty[(String, String), Long]
      dict.foreach { case (sy, c) =>
        var i = 0
        while (i < sy.length - 1) {
          pairs((sy(i), sy(i + 1))) = pairs.getOrElse((sy(i), sy(i + 1)), 0L) + c
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), pc) = pairs.minBy { case ((l, r), pc) => (-pc, l, r) }
        merges += ((l, r, pc))
        dict = dict.groupMapReduce { case (sy, _) => refMergePass(sy, l, r) }(_._2)(_ + _)
      }
    }
    merges.toSeq
  }

  private def corpusWordCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(refPreTokens).groupBy(identity).view.mapValues(_.size.toLong).toMap

  private val corpus = Seq(
    "the theme of the thesis is the theory",
    "low lower lowest, the lowest of the low",
    "new newer newest; the newest news 2024",
    "hugging tokenizers merge pairs of bytes",
    "aaaa aaaa aaab the the the then there")

  private def corpusDf = {
    import spark.implicits._
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("sequential train (batch=1) replays the single-node reference exactly") {
    val wc = BpeTrainer.wordCounts(corpusDf)
    val got = BpeTrainer.train(wc, numMerges = 30, checkpointEvery = 3)
      .orderBy("rank")
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq
    val want = refTrain(corpusWordCounts(corpus), 30)
    assert(got === want)
  }

  test("sequential train matches the reference on real documents") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(120)
      .select("doc_id", "text")
    val texts = docs.as[(Long, String)].collect().map(_._2).toSeq
    val got = BpeTrainer.train(BpeTrainer.wordCounts(docs), numMerges = 25)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got === refTrain(corpusWordCounts(texts), 25))
  }

  test("batched mode is EXACTLY sequential BPE and amortizes dictionary passes") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val wc = BpeTrainer.wordCounts(docs).persist()
    val seq = BpeTrainer.train(wc, numMerges = 64)
      .collect().map(_.toSeq).toSeq
    val seqRounds = BpeTrainer.lastTrainRounds.get()
    assert(seqRounds === 64)
    val bat = BpeTrainer.train(wc, numMerges = 64, batch = 16)
      .collect().map(_.toSeq).toSeq
    val batRounds = BpeTrainer.lastTrainRounds.get()
    // the bench query's batch (64 since r18) must be exact too
    val bat64 = BpeTrainer.train(wc, numMerges = 64, batch = 64)
      .collect().map(_.toSeq).toSeq
    val bat64Rounds = BpeTrainer.lastTrainRounds.get()
    wc.unpersist()
    // the frontier-safety prefix rule makes batching EXACT, not approximate
    assert(bat === seq)
    assert(bat64 === seq)
    // and it actually batches: far fewer dictionary passes than merges
    assert(batRounds < 48, s"batch=16 took $batRounds rounds for 64 merges")
    assert(bat64Rounds <= batRounds,
      s"batch=64 took $bat64Rounds rounds, batch=16 took $batRounds")
  }

  test("train is deterministic across runs and partitionings") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val a = BpeTrainer.train(BpeTrainer.wordCounts(docs), 20, batch = 4)
      .collect().map(_.toSeq).toSeq
    val b = BpeTrainer.train(
        BpeTrainer.wordCounts(docs.repartition(7)), 20, batch = 4)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("encode: lossless roundtrip and equivalence to rank-order replay") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
      .select("doc_id", "text")
    val merges = BpeTrainer.train(BpeTrainer.wordCounts(docs), 40, batch = 4)
    val mergeList = merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = BpeTrainer.encode(docs, merges).persist()
    // 1) concatenated tokens reproduce the pre-token stream exactly
    val bad = enc.join(docs, "doc_id")
      .select(col("doc_id"), concat_ws("", col("tokens")).as("joined"), col("text"))
      .as[(Long, String, String)]
      .collect()
      .filter { case (_, joined, text) => joined != refPreTokens(text).mkString }
    assert(bad.isEmpty, s"lossy encode for doc_ids ${bad.take(3).map(_._1).toSeq}")
    // 2) rank-priority encoding equals replaying merges in rank order
    // (pre-tokenization is idempotent, so a single-word doc encodes the
    // word itself — one job for all distinct words)
    val words = docs.as[(Long, String)].collect()
      .flatMap(t => refPreTokens(t._2)).distinct.toSeq
    val wordsDf = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val priority = BpeTrainer.encode(wordsDf, merges).orderBy("doc_id")
      .select("tokens").as[Seq[String]].collect()
    words.zip(priority).foreach { case (w, got) =>
      val replay = mergeList.foldLeft(w.map(_.toString).toVector) {
        case (sy, (l, r)) => refMergePass(sy, l, r)
      }
      assert(got.toVector === replay,
        s"word '$w': priority ${got.toVector} != replay $replay")
    }
    enc.unpersist()
    ()
  }

  test("wordCounts truncation contract: minFreq floor and maxWords cap are deterministic") {
    val wcAll = BpeTrainer.wordCounts(corpusDf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wcMin = BpeTrainer.wordCounts(corpusDf, minFreq = 3L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wcMin === wcAll.filter(_._2 >= 3L))
    val top5 = BpeTrainer.wordCounts(corpusDf, maxWords = 5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val want = wcAll.toSeq.sortBy { case (w, c) => (-c, w) }.take(5)
    assert(top5.sortBy { case (w, c) => (-c, w) } === want)
  }
}
