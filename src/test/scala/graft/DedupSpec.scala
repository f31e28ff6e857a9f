package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextHash

/** Recall/precision checks for the dedup family on planted duplicates —
  * the probabilistic behavior the SQL oracle can't certify. */
class DedupSpec extends SparkSpecBase {

  private val vocab = Array("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
    "november", "oscar", "papa", "quebec", "romeo", "sierra", "tango")

  /** Deterministic base doc of `n` words from seed. */
  private def doc(seed: Int, n: Int = 60): Array[String] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(vocab(rnd.nextInt(vocab.length)))
  }

  /** Mutate `frac` of the words — a controlled near-duplicate. */
  private def mutate(words: Array[String], frac: Double, seed: Int): Array[String] = {
    val rnd = new scala.util.Random(seed)
    words.map(w => if (rnd.nextDouble() < frac) vocab(rnd.nextInt(vocab.length)) else w)
  }

  private def corpus(): DataFrame = {
    import spark.implicits._
    // 30 unrelated docs + 5 planted near-dup pairs (low mutation) + 1 exact dup.
    val base = (0 until 30).map(i => (i.toLong, doc(i).mkString(" ")))
    val nearDups = (0 until 5).map { i =>
      (100L + i, mutate(doc(i), 0.04, 1000 + i).mkString(" "))
    }
    val exactDup = Seq((200L, doc(0).mkString(" ")))
    (base ++ nearDups ++ exactDup).toDF("doc_id", "text")
  }

  test("exact dedup keeps first occurrence per digest") {
    val kept = Dedup.exact(corpus(), "doc_id", "text")
    assert(kept.count() === 36 - 1) // one exact dup removed
    assert(kept.filter(col("doc_id") === 200L).count() === 0)
    assert(kept.filter(col("doc_id") === 0L).count() === 1)
  }

  test("minhash signature estimates jaccard within 0.15") {
    val sigs = Dedup.minhashSignatures(corpus(), "doc_id", "text", k = 128)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sh = Dedup.shingleSets(corpus(), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    for (i <- 0 until 5) {
      val (a, b) = (i.toLong, 100L + i)
      val trueJ = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
      val estJ = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 128.0
      assert(math.abs(trueJ - estJ) < 0.15, s"pair $a-$b: true=$trueJ est=$estJ")
    }
  }

  test("minhash LSH finds all planted near-dup pairs above tau") {
    val pairs = Dedup.minhashPairs(corpus(), "doc_id", "text", tau = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Recall is judged against each planted pair's TRUE jaccard: a pair
    // mutated below tau is correctly absent (verify stage is exact).
    val sh = Dedup.shingleSets(corpus(), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    var checked = 0
    for (i <- 0 until 5) {
      val (a, b) = (i.toLong, 100L + i)
      val trueJ = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
      if (trueJ >= 0.65) { // margin above tau: LSH miss prob < 0.2%
        assert(pairs.contains((a, b)), s"missing planted pair $i (j=$trueJ)")
        checked += 1
      }
    }
    assert(checked >= 3, s"corpus too mutated: only $checked pairs above 0.65")
    // Exact dup pair must be found too (jaccard 1.0).
    assert(pairs.contains((0L, 200L)))
  }

  test("minhash LSH precision: no unrelated pair passes the verify stage") {
    val pairs = Dedup.minhashPairs(corpus(), "doc_id", "text", tau = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 5).map(i => (i.toLong, 100L + i)).toSet +
      ((0L, 200L)) + ((100L, 200L)) // 100 ~ 0 ~ 200 are mutually similar
    assert(pairs.subsetOf(planted), s"false positives: ${pairs.diff(planted)}")
  }

  test("incremental dedup: a batch dedups against catalog-persisted " +
      "signature state without the corpus text") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // corpus = the 30 base docs; its signature state round-trips through
    // a catalog table (array<long> columns), then the batch dedups
    // against the TABLE — the corpus text never participates.
    val base = corpus().filter(col("doc_id") < 30)
    val wh = java.nio.file.Files.createTempDirectory("graft-incdedup-wh").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    cat.createTable("db", "sigs", StructType(Seq(
      StructField("doc_id", LongType),
      StructField("shh", ArrayType(LongType)),
      StructField("sig", ArrayType(LongType)))))
    cat.append("db", "sigs", Dedup.signatureState(base, "doc_id", "text"))
    val stored = cat.read("db", "sigs")
    // batch: near-dup of doc 0, exact dup of doc 3, one fresh doc, one
    // sub-3-token doc (no shingles — must survive, it can't match)
    val batch = Seq(
      (500L, mutate(doc(0), 0.04, 7).mkString(" ")),
      (501L, doc(3).mkString(" ")),
      (502L, doc(999).mkString(" ")),
      (503L, "tiny doc")).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainstCorpus(batch, stored, "doc_id", "text",
      tau = 0.6).select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(501L), "exact dup of stored corpus must drop")
    assert(kept.contains(502L), "fresh doc must survive")
    assert(kept.contains(503L), "shingle-less doc must survive")
    // the near-dup drops iff its true jaccard clears tau (verify is exact)
    val sh = Dedup.shingleSets(base.unionByName(batch), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val trueJ = sh(0L).intersect(sh(500L)).size.toDouble / sh(0L).union(sh(500L)).size
    if (trueJ >= 0.65) assert(!kept.contains(500L), s"near-dup (j=$trueJ) must drop")
    // appending the survivors' state makes THEM the corpus for batch 2:
    // a copy of the fresh doc now drops
    cat.append("db", "sigs",
      Dedup.signatureState(batch.filter(col("doc_id").isin(kept.toSeq: _*)),
        "doc_id", "text"))
    val batch2 = Seq((600L, doc(999).mkString(" "))).toDF("doc_id", "text")
    val kept2 = Dedup.dedupAgainstCorpus(batch2, cat.read("db", "sigs"),
      "doc_id", "text", tau = 0.6).count()
    assert(kept2 === 0L, "copy of a batch-1 survivor must drop in batch 2")
    // cache scope: the call OWNS its per-batch signature cache — after it
    // returns, only the id-sized matched-set local checkpoint may remain
    // persisted (the context cleaner reclaims it on GC); a leaked
    // signature frame would pin one cache per micro-batch for a stream's
    // lifetime in streamDedupAppend
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.dedupAgainstCorpus(batch2, cat.read("db", "sigs"),
      "doc_id", "text", tau = 0.6)
    val leakedPlainCaches =
      (spark.sparkContext.getPersistentRDDs -- before).values
        .filterNot(_.isCheckpointed)
    assert(leakedPlainCaches.isEmpty,
      s"signature cache leaked: ${leakedPlainCaches.map(_.id)}")
  }

  test("simhash: exact dups at hamming 0; banding finds radius<=3 pairs") {
    val pairs = Dedup.simhashPairs(corpus(), "doc_id", "text", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((0L, 200L)).contains(0), "exact dup must have hamming 0")
    // Verify banding is exhaustive: brute-force the corpus' simhashes.
    val sims = corpus().select(col("doc_id"),
        TextHash.simhash60(TextHash.tokenHashes(col("text"))).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (id1, s1) <- sims; (id2, s2) <- sims if id1 < id2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= 3
    } yield ((id1, id2), h)).toMap
    assert(pairs === brute, "banding must equal brute force for radius<=3")
  }

  test("embedding LSH finds planted high-cosine pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]): Array[Float] = v.map(x => x + rnd.nextGaussian().toFloat * 0.02f)
    val bases = (0 until 20).map(i => (i.toLong, vec()))
    val dups = bases.take(4).map { case (id, v) => (500L + id, jitter(v)) }
    val df = (bases ++ dups).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(df, "vec_id", "embedding", tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 4)
      assert(pairs.contains((i.toLong, 500L + i)), s"missing planted vector pair $i")
    assert(pairs.size === 4, s"false positives: $pairs")
  }

  test("oversized LSH buckets star-bound pair counts; honest near-dups keep recall") {
    import spark.implicits._
    // 10k-identical-doc family: every band bucket holds all 10k members, so
    // unbounded all-pairs would enumerate ~50M candidate pairs. The star
    // bound must cap it at exactly family-1 pairs (all to the min id),
    // while planted near-dups in ordinary buckets are still found.
    val family = (0L until 10000L).map(i =>
      (i, "the same boilerplate sentence repeated across an entire scraped site template"))
    val honestA = (20000L, doc(77).mkString(" "))
    val honestB = (20001L, mutate(doc(77), 0.03, 99).mkString(" "))
    val df = (family ++ Seq(honestA, honestB)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(df, "doc_id", "text", tau = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val famPairs = pairs.filter(_._2 < 20000L)
    assert(famPairs.size === 9999, s"expected star-bounded 9999, got ${famPairs.size}")
    assert(famPairs.forall(_._1 == 0L), "family pairs must all touch the representative")
    assert(pairs.contains((20000L, 20001L)), "honest near-dup pair lost to the bucket bound")
    // star pairs preserve reachability: clustering still collapses the family
    val cc = Dedup.connectedComponents(df.select("doc_id"), "doc_id",
      Dedup.minhashPairs(df, "doc_id", "text", tau = 0.6).select("d1", "d2"))
    assert(cc.filter(col("doc_id") < 20000L).select("cluster").distinct().count() === 1)
  }

  test("connected components: chains collapse transitively, singletons keep own id") {
    import spark.implicits._
    // A~B, B~C (A!~C) must still cluster together; separate component 10-11;
    // 20 is a singleton.
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("d1", "d2")
    val cc = Dedup.connectedComponents(nodes, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
    // a longer chain (diameter 4) still converges to the global min
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("d1", "d2")
    val ccChain = Dedup.connectedComponents((1L to 5L).toDF("doc_id"), "doc_id", chain)
      .collect().map(r => r.getLong(1)).distinct
    assert(ccChain.toSeq === Seq(1L))
  }

  test("connected components take the reliable-checkpoint path when a dir is set") {
    import spark.implicits._
    // With spark.sparkContext.setCheckpointDir configured, every round
    // materializes as a RELIABLE checkpoint (executor-loss survivable on
    // a real cluster) instead of localCheckpoint — same fixed point.
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("d1", "d2")
      val cc = Dedup.connectedComponents(
          Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id"), "doc_id", pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
      // the rounds actually wrote reliable checkpoint data
      def rddFiles(f: java.io.File): Long =
        Option(f.listFiles()).map(_.map(c =>
          if (c.isDirectory) rddFiles(c) else 1L).sum).getOrElse(0L)
      assert(rddFiles(new java.io.File(dir)) > 0, "no reliable checkpoint written")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("star contraction: chain of 1000 converges within log-bounded rounds") {
    import spark.implicits._
    // Adversarial diameter-999 chain: min-label propagation would need
    // ~1000 rounds; large-star/small-star must finish in O(log n) — the
    // maxIters=12 budget (≳ log2 1000) is the assertion.
    val chain = (1L until 1000L).map(i => (i, i + 1)).toDF("d1", "d2")
    val cc = Dedup.connectedComponents((1L to 1000L).toDF("doc_id"), "doc_id",
        chain, maxIters = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(cc.length === 1000 && cc.forall(_._2 == 1L))
  }

  test("duplicate spans: maximal cross-doc spans, within-doc repeats excluded") {
    import spark.implicits._
    // letter-only words: the tokenizer is [a-z]+ runs, digits would split
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => prefix + ('a' + i - 1).toChar).mkString(" ")
    val phrase = words("shared", 10) // 10-token phrase → 6 5-gram starts
    val other = words("also", 7)     // second shared phrase, disjoint
    val docs = Seq(
      // doc 1: phrase embedded mid-doc at word index 5
      (1L, words("aa", 5) + " " + phrase + " " + words("bb", 5)),
      // doc 2: same phrase at the head, plus the second phrase at the tail
      (2L, phrase + " " + words("cc", 4) + " " + other),
      // doc 3: carries only the second phrase
      (3L, words("dd", 6) + " " + other),
      // doc 4: repeats ITS OWN phrase twice — within-doc only, no span
      (4L, words("self", 6) + " " + words("ee", 3) + " " + words("self", 6)),
      // doc 5: unique
      (5L, words("ff", 12))).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(spans === Seq(
      (1L, 5L, 14L, 10L),   // exactly the embedded phrase
      (2L, 0L, 9L, 10L),    // head phrase
      (2L, 14L, 20L, 7L),   // tail phrase — SECOND island, not merged
      (3L, 6L, 12L, 7L)))   // docs 4 (within-doc) and 5 (unique): no spans
  }
}
