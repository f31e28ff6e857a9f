package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, VectorIndex}

/** ANN paths: scalable==brute equality on real data; LSH recall on
  * clustered planted vectors. */
class AnnSpec extends SparkSpecBase {

  private def realVectors() = {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val all = Similarity.quantized(e, "vec_id", "embedding")
    (all, all.filter(col("id") % 25 === 0))
  }

  test("scalable heap top-k equals declarative brute force exactly") {
    val (cands, qs) = realVectors()
    val brute = Similarity.bruteForceTopK(cands, qs, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val scalable = Similarity.topKScalable(cands, qs, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(brute.sortBy(t => (t._1, t._2)) === scalable.sortBy(t => (t._1, t._2)))
  }

  test("pq top-k: recall >= 0.8 on clustered vectors, >= 0.6 on real data") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = for {
      c <- 0 until 40
      center = Array.fill(64)(rnd.nextGaussian())
      m <- 0 until 25
    } yield ((c * 25 + m).toLong,
      center.map(x => (x + rnd.nextGaussian() * 0.15).toFloat))
    val df = rows.toDF("vec_id", "embedding")
    val all = Similarity.quantized(df, "vec_id", "embedding")
    val qs = all.filter(col("id") % 100 === 0)
    val brute = Similarity.bruteForceTopK(all, qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = Similarity.pqTopK(all, qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(pq).size.toDouble / brute.size
    assert(recall >= 0.8, s"pq recall $recall < 0.8 (clustered)")
    // the re-rank is EXACT: every reported cosine equals the brute cosine
    val bruteCos = Similarity.bruteForceTopK(all, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    Similarity.pqTopK(all, qs, 10).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(math.abs(bruteCos.getOrElse(key, r.getDouble(3)) - r.getDouble(3)) < 1e-12)
    }
    // unclustered real embeddings: the harder case — survivors still
    // recover a useful share of the exact top-k
    val (rall, rqs) = realVectors()
    val rbrute = Similarity.bruteForceTopK(rall, rqs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val rpq = Similarity.pqTopK(rall, rqs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val rrecall = rbrute.intersect(rpq).size.toDouble / rbrute.size
    assert(rrecall >= 0.6, s"pq recall $rrecall < 0.6 (real)")
  }

  test("lsh top-k recall >= 0.9 on clustered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 40 cluster centers, 25 members each: members share high cosine.
    val rows = for {
      c <- 0 until 40
      center = Array.fill(64)(rnd.nextGaussian())
      m <- 0 until 25
    } yield ((c * 25 + m).toLong,
      center.map(x => (x + rnd.nextGaussian() * 0.15).toFloat))
    val df = rows.toDF("vec_id", "embedding")
    val all = Similarity.quantized(df, "vec_id", "embedding")
    val qs = all.filter(col("id") % 100 === 0) // 10 probe vectors
    val brute = Similarity.bruteForceTopK(all, qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.lshTopK(all, qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.9, s"lsh recall $recall < 0.9")
  }

  test("ivf top-k recall >= 0.8 on clustered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = for {
      c <- 0 until 40
      center = Array.fill(64)(rnd.nextGaussian())
      m <- 0 until 25
    } yield ((c * 25 + m).toLong,
      center.map(x => (x + rnd.nextGaussian() * 0.15).toFloat))
    val df = rows.toDF("vec_id", "embedding")
    val all = Similarity.quantized(df, "vec_id", "embedding")
    val qs = all.filter(col("id") % 100 === 0)
    val brute = Similarity.bruteForceTopK(all, qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(all, qs, 10, nlist = 32, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"ivf recall $recall < 0.8")
  }

  test("knn join: both sides data-scale, recall >= 0.8, parity with ivfTopK") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = for {
      c <- 0 until 40
      center = Array.fill(64)(rnd.nextGaussian())
      m <- 0 until 25
    } yield ((c * 25 + m).toLong,
      center.map(x => (x + rnd.nextGaussian() * 0.15).toFloat))
    val df = rows.toDF("vec_id", "embedding")
    val all = Similarity.quantized(df, "vec_id", "embedding")
    // query side is HALF the corpus — far past any broadcast-by-contract
    val qs = all.filter(col("id") % 2 === 0)
    val brute = Similarity.bruteForceTopK(all, qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val knn = Similarity.ivfKnnJoin(all, qs, 10, nlist = 32, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(knn).size.toDouble / brute.size
    assert(recall >= 0.8, s"knn-join recall $recall < 0.8")
    // same cells, same scoring ⇒ identical output to the broadcast-side
    // ivfTopK on an identical query set (the paths differ only in join
    // distribution strategy)
    val qsSmall = all.filter(col("id") % 100 === 0)
    val a = Similarity.ivfKnnJoin(all, qsSmall, 10, nlist = 32, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Similarity.ivfTopK(all, qsSmall, 10, nlist = 32, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b, "knn join must equal ivfTopK on the same query set")
  }

  test("kmeans assignment: exhaustive, deterministic, within nlist cells") {
    val (cands, _) = realVectors()
    val n = cands.count()
    val a1 = Similarity.kmeansAssign(cands, nlist = 8).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).sortBy(_._1)
    assert(a1.length === n)                      // every vector assigned once
    assert(a1.map(_._1).distinct.length === n)
    assert(a1.forall { case (_, c) => c >= 0 && c < 8 })
    assert(a1.map(_._2).distinct.length > 1, "degenerate single-cell clustering")
    val a2 = Similarity.kmeansAssign(cands, nlist = 8).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).sortBy(_._1)
    assert(a1.toSeq === a2.toSeq)                // deterministic trainer
  }

  test("semanticDedup keeps the smallest id per semantic group") {
    import spark.implicits._
    // three near-dup families along axes + one far singleton; the
    // singleton ties into a family's cell (dot 0 to every seed) but its
    // cosine to cluster-mates is 0 — clustered together ≠ dropped
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),     // exact dup of 1 -> dropped
      (7L, Array(1.0f, 0.001f, 0.0f)),   // near dup of 1 -> dropped
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (5L, Array(0.0f, 1.0f, 0.0f)),     // exact dup of 3 -> dropped
      (4L, Array(0.0f, 0.0f, 1.0f))      // singleton -> kept
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantized(vecs, "vec_id", "embedding")
    val out = Similarity.semanticDedup(q, nlist = 3, rounds = 2,
      threshold = 0.95).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.size === 6, "every vector classified exactly once")
    assert(out.filter(_._2).keySet === Set(1L, 3L, 4L),
      s"wrong survivor set: $out")
    // idempotence: running dedup over the survivors drops nothing
    val survivors = vecs.filter(col("vec_id").isin(1L, 3L, 4L))
    val again = Similarity.semanticDedup(
      Similarity.quantized(survivors, "vec_id", "embedding"),
      nlist = 3, rounds = 2, threshold = 0.95).collect()
    assert(again.forall(_.getBoolean(2)), "survivor set must be stable")
  }

  // ---- persisted IVF index (VectorIndex over graft catalog tables) ----

  private def freshIdxCat() = {
    val wh = java.nio.file.Files.createTempDirectory("graft-vidx-spec").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("idx")
    cat
  }

  test("persisted index with nprobe = nlist equals brute force exactly") {
    val (cands, qs) = realVectors()
    val cat = freshIdxCat()
    VectorIndex.build(cat, "idx", "emb", cands, nlist = 8, iters = 3)
    val brute = Similarity.bruteForceTopK(cands, qs, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val idx = VectorIndex.query(cat, "idx", "emb", qs, 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(brute.sortBy(t => (t._1, t._2)).toSeq === idx.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("persisted index probe prunes to the probed cells' partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = for {
      c <- 0 until 40
      center = Array.fill(64)(rnd.nextGaussian())
      m <- 0 until 25
    } yield ((c * 25 + m).toLong,
      center.map(x => (x + rnd.nextGaussian() * 0.15).toFloat))
    val all = Similarity.quantized(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val cat = freshIdxCat()
    VectorIndex.build(cat, "idx", "emb", all, nlist = 16, iters = 3)
    val qs = all.filter(col("id") === 0) // one query, nprobe 2 of 16 cells
    val out = VectorIndex.query(cat, "idx", "emb", qs, 10, nprobe = 2)
    // the scan half of the plan must only plan files under 2 cell dirs
    val cells = out.inputFiles.filter(_.contains("cell=")).map { f =>
      f.split("cell=")(1).split("/")(0)
    }.distinct
    assert(cells.length <= 2,
      s"expected <= 2 probed cell partitions planned, got ${cells.toSeq}")
    val full = cat.read("idx", "emb")
    assert(full.inputFiles.count(_.contains("cell=")) > cells.length,
      "pruning assertion is vacuous: full table has no more partitions")
    // recall: clustered families land in the query's own probed cells
    val brute = Similarity.bruteForceTopK(all, qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(got).size.toDouble / brute.size
    assert(recall >= 0.8, s"persisted-index recall $recall < 0.8")
  }

  test("appendVectors adds without retraining; new rows become findable") {
    val (all, _) = realVectors()
    val base = all.filter(col("id") % 2 === 0)
    val extra = all.filter(col("id") % 2 =!= 0)
    val cat = freshIdxCat()
    VectorIndex.build(cat, "idx", "emb", base, nlist = 8, iters = 3)
    val centsBefore = VectorIndex.centroidsOf(cat, "idx", "emb")
    VectorIndex.appendVectors(cat, "idx", "emb", extra)
    val centsAfter = VectorIndex.centroidsOf(cat, "idx", "emb")
    assert(centsBefore.map(_.toSeq).toSeq === centsAfter.map(_.toSeq).toSeq,
      "append must not retrain the quantizer")
    // full-probe query over the grown index == brute force over the union
    val qs = all.filter(col("id") % 50 === 0)
    val brute = Similarity.bruteForceTopK(all, qs, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val idx = VectorIndex.query(cat, "idx", "emb", qs, 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(brute === idx, "appended vectors must be exactly findable")
  }

  // ---- persisted PQ index (codebooks + codes as catalog tables) ----

  test("persisted PQ index: build-once/query-many, recall gate, exact re-rank") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = for {
      c <- 0 until 40
      center = Array.fill(64)(rnd.nextGaussian())
      m <- 0 until 25
    } yield ((c * 25 + m).toLong,
      center.map(x => (x + rnd.nextGaussian() * 0.15).toFloat))
    val all = Similarity.quantized(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val qs = all.filter(col("id") % 100 === 0)
    val cat = freshIdxCat()
    VectorIndex.buildPq(cat, "idx", "pqe", all)
    val brute = Similarity.bruteForceTopK(all, qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = VectorIndex.queryPq(cat, "idx", "pqe", qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(got).size.toDouble / brute.size
    assert(recall >= 0.8, s"persisted-PQ recall $recall < 0.8 (clustered)")
    // query-many: a second query batch reuses the PERSISTED codebooks —
    // identical results, no retrain (codebook snapshot count unchanged)
    val snapsBefore = cat.snapshots("idx", "pqe_codebooks").size
    val again = VectorIndex.queryPq(cat, "idx", "pqe", qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again === got, "repeat query over the persisted index must match")
    assert(cat.snapshots("idx", "pqe_codebooks").size === snapsBefore,
      "querying must not write (retrain) the codebook table")
    // the re-rank is exact: reported cosines equal brute-force cosines
    val bruteCos = Similarity.bruteForceTopK(all, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    VectorIndex.queryPq(cat, "idx", "pqe", qs, 10).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(math.abs(bruteCos.getOrElse(key, r.getDouble(3)) - r.getDouble(3)) < 1e-12)
    }
  }

  test("appendPqVectors encodes with persisted codebooks — no retrain, " +
      "new rows findable") {
    val (all, _) = realVectors()
    val base = all.filter(col("id") % 2 === 0)
    val extra = all.filter(col("id") % 2 =!= 0)
    val cat = freshIdxCat()
    VectorIndex.buildPq(cat, "idx", "pqg", base)
    val cbBefore = VectorIndex.codebooksOf(cat, "idx", "pqg")
    VectorIndex.appendPqVectors(cat, "idx", "pqg", extra)
    val cbAfter = VectorIndex.codebooksOf(cat, "idx", "pqg")
    assert(cbBefore.map(_.map(_.toSeq).toSeq).toSeq ===
      cbAfter.map(_.map(_.toSeq).toSeq).toSeq,
      "append must not retrain the codebooks")
    // appended rows participate: with rerank covering the corpus the
    // exact re-rank makes results equal brute force over the union
    val qs = all.filter(col("id") % 50 === 0)
    val n = all.count().toInt
    val brute = Similarity.bruteForceTopK(all, qs, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val idx = VectorIndex.queryPq(cat, "idx", "pqg", qs, 5,
        rerank = n / 5 + 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(brute === idx,
      "full-rerank persisted-PQ query must equal brute force exactly")
  }

  test("lsh prunes: candidate pairs well below all-pairs") {
    val (cands, qs) = realVectors()
    val k = 5
    val lsh = Similarity.lshTopK(cands, qs, k)
    // Sanity: it returns ranked rows with rank 1..k per query present.
    val byQ = lsh.groupBy("qid").agg(max("rank").as("mx")).collect()
    assert(byQ.nonEmpty)
    assert(byQ.forall(_.getInt(1) <= k))
  }
}
