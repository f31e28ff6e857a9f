package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 * Three paths, one semantics (cosine top-k, ties broken by candidate id):
 *  - [[bruteForceTopK]]: declarative broadcast-join + window — the
 *    correctness baseline. The |Q|×|C| pair set is shuffled to rank, so
 *    it's for small query sets / moderate corpora.
 *  - [[topKScalable]]: the 100 TB path. Queries are broadcast; each
 *    candidate partition keeps a bounded per-query heap (k entries), so
 *    the shuffle is |partitions|×|Q|×k rows — independent of corpus size.
 *    Exact same results as brute force (integer math, same tie-break).
 *  - [[lshTopK]]: hyperplane-sign LSH buckets bound the candidate set per
 *    query before exact scoring — the recall/throughput tradeoff knob.
 *
 * Determinism: all scoring uses quantized integer dot products and squared
 * norms (exact), with cosine = one IEEE divide+sqrt — identical in Spark,
 * the JVM heap path, and the DuckDB oracle (SURVEY.md §4).
 */
object Similarity {

  /** Quantize (id, vector) to (id, qv: array<long>, nn: squared norm). */
  def quantized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), VectorOps.quantize(col(vecCol)).as("qv"))
      .withColumn("nn", VectorOps.qdot(col("qv"), col("qv")))
      .persist() // reused as both candidate and query side downstream

  private[operators] def ranked(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cand").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cand", "cos")
  }

  /** Declarative exact top-k: broadcast the (small) query side. */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("id").as("qid"), col("qv").as("qqv"),
      col("nn").as("qnn")))
    val scored = candidates.join(q, col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("cand"),
        VectorOps.qcosine(VectorOps.qdot(col("qv"), col("qqv")), col("nn"), col("qnn"))
          .as("cos"))
    ranked(scored, k)
  }

  /**
   * Exact top-k with bounded state: per-partition per-query heaps of size
   * k, then a final window over |partitions|×|Q|×k rows. The only
   * data-proportional cost is the scan itself.
   * The query set is collected to the driver (it is the bounded side by
   * contract — typically 10s–1000s of probe vectors).
   */
  def topKScalable(candidates: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val qs = queries.select("id", "qv", "nn").as[(Long, Array[Long], Long)].collect()
    val bc = spark.sparkContext.broadcast(qs)
    // Worst-kept-first ordering: head of the heap is the entry to evict.
    val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // lower cos = worse = first
        if (c != 0) c else java.lang.Long.compare(a._2, b._2) // higher id = worse
      }
    }
    val partial: Dataset[(Long, Long, Double)] =
      candidates.select("id", "qv", "nn").as[(Long, Array[Long], Long)]
        .mapPartitions { iter =>
          val queries = bc.value
          val heaps = Array.fill(queries.length)(
            mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
          iter.foreach { case (cid, cqv, cnn) =>
            var qi = 0
            while (qi < queries.length) {
              val (qid, qqv, qnn) = queries(qi)
              if (qid != cid) {
                var dot = 0L
                var i = 0
                // common-prefix semantics, matching LongArrayDot/bruteForceTopK
                val n = math.min(cqv.length, qqv.length)
                while (i < n) { dot += cqv(i) * qqv(i); i += 1 }
                val cos = dot.toDouble / math.sqrt(cnn.toDouble * qnn.toDouble)
                val h = heaps(qi)
                if (h.size < k) h.enqueue((cos, cid))
                else if (worstFirst.compare((cos, cid), h.head) < 0) {
                  h.dequeue(); h.enqueue((cos, cid))
                }
              }
              qi += 1
            }
          }
          heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
            h.iterator.map { case (cos, cid) => (queries(qi)._1, cid, cos) }
          }
        }
    ranked(partial.toDF("qid", "cand", "cos"), k)
  }

  /**
   * IVF (inverted-file) top-k: a coarse quantizer — cosine k-means trained
   * on a bounded, deterministic sample — partitions candidates into
   * `nlist` cells; each query probes its `nprobe` nearest cells and only
   * rescored cell members compete. The cell assignment is a bucketed
   * equi-join on cell id (never a product), and training state is bounded
   * (≤4096 sample vectors on the driver), so the path scales with the
   * scan. Probabilistic recall, like every IVF index (see AnnSpec).
   */
  /**
   * Cosine k-means trainer shared by [[ivfTopK]] and [[kmeansAssign]]:
   * a deterministic bounded sample — the top 4096 rows by (xxhash64(id),
   * id), i.e. a pseudo-random-but-reproducible draw taken with ONE
   * TakeOrdered job (no pre-`count()` pass over the corpus) — trained
   * with Lloyd iterations under cosine assignment (argmax dot, lowest
   * cell id on ties); empty cells keep their previous centroid. Returns
   * unit-norm centroids.
   */
  def trainCosineKmeans(candidates: DataFrame, nlist: Int,
      iters: Int): Array[Array[Double]] = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val sample = candidates
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(4096)
      .select("id", "qv", "nn")
      .as[(Long, Array[Long], Long)].collect()
      .map { case (_, qv, nn) =>
        val norm = math.sqrt(nn.toDouble)
        qv.map(_ / norm)
      }
    var centroids = sample.take(nlist)
    require(centroids.nonEmpty, "not enough vectors to train k-means")
    for (_ <- 0 until iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](sample.head.length))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        val c = nearestCell(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else {
          val m = sums(c).map(_ / counts(c))
          val norm = math.sqrt(m.map(x => x * x).sum)
          if (norm == 0) centroids(c) else m.map(_ / norm)
        }
      }.toArray
    }
    centroids
  }

  /**
   * Product-quantization top-k — the MEMORY-bounded ANN scale path
   * (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
   * Search", TPAMI): vectors compress to `m` sub-codes (one centroid id
   * per subspace), so a 100 TB float corpus scans as a few TB of codes
   * and the scoring pass never touches the original vectors. Queries
   * score candidates by Asymmetric Distance Computation: a per-query
   * (subspace × centroid) dot-product lookup table, summed over each
   * candidate's codes; an exact integer-dot re-rank of the `rerank·k`
   * best PQ survivors restores precision.
   *
   * Stages: (1) codebooks train on ONE bounded deterministic sample
   * (Lloyd per subspace, driver-side, ≤4096 vectors — same contract as
   * the IVF trainer); (2) candidates encode in the scan stage (argmin-L2
   * centroid per subspace, no shuffle, codes are the only thing kept);
   * (3) per-partition bounded heaps of `rerank·k` per query over ADC
   * scores — the [[topKScalable]] shape, shuffle = partitions×|Q|×r·k;
   * (4) survivors semi-join their ORIGINAL vectors (bounded set) for the
   * exact cosine re-rank. Probabilistic recall like every PQ index —
   * AnnSpec gates it; no DuckDB oracle by design.
   */
  def pqTopK(candidates: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, rerank: Int = 4): DataFrame = {
    val codebooks = trainPqCodebooks(candidates, m, ksub)
    pqSearch(encodePq(candidates, codebooks), candidates, queries,
      codebooks, k, rerank)
  }

  /** PQ codebook training: Lloyd per subspace over ONE bounded
    * deterministic sample (≤4096 vectors, driver-side — same contract as
    * the IVF trainer). Factored out so [[VectorIndex]] can train ONCE,
    * persist, and encode/query forever without retraining. */
  private[operators] def trainPqCodebooks(candidates: DataFrame, m: Int,
      ksub: Int): Array[Array[Array[Double]]] = {
    val spark = candidates.sparkSession
    import spark.implicits._
    require(m >= 1 && ksub >= 2, "bad PQ parameters")
    val sample = candidates
      .orderBy(xxhash64(col("id")), col("id")).limit(4096)
      .select("id", "qv", "nn").as[(Long, Array[Long], Long)].collect()
      .map { case (_, qv, nn) =>
        val norm = math.sqrt(nn.toDouble)
        qv.map(_ / norm)
      }
    require(sample.nonEmpty, "not enough vectors to train PQ codebooks")
    val d = sample.head.length
    require(d >= m, s"dimension $d < $m subspaces")
    val bounds = Array.tabulate(m + 1)(i => i * d / m)
    def sub(v: Array[Double], s: Int): Array[Double] =
      java.util.Arrays.copyOfRange(v, bounds(s), bounds(s + 1))
    Array.tabulate(m) { s =>
      val subs = sample.map(sub(_, s))
      var cents: Array[Array[Double]] =
        Array.tabulate(math.min(ksub, subs.length))(i => subs(i).clone())
      for (_ <- 0 until 8) {
        val sums = Array.fill(cents.length)(new Array[Double](bounds(s + 1) - bounds(s)))
        val counts = new Array[Long](cents.length)
        subs.foreach { v =>
          val c = nearestL2(v, cents)
          counts(c) += 1
          var i = 0
          while (i < v.length) { sums(c)(i) += v(i); i += 1 }
        }
        cents = cents.indices.map(c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c))).toArray
      }
      cents
    }
  }

  /** Encode quantized (id, qv, nn) rows to (id, codes): scan-stage
    * argmin-L2 centroid per subspace, no shuffle. */
  private[operators] def encodePq(rows: DataFrame,
      codebooks: Array[Array[Array[Double]]]): Dataset[(Long, Array[Int])] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val bcCb = spark.sparkContext.broadcast(codebooks)
    rows.select("id", "qv", "nn").as[(Long, Array[Long], Long)]
      .mapPartitions { it =>
        val cb = bcCb.value
        it.map { case (id, qv, nn) =>
          val norm = math.sqrt(nn.toDouble)
          val v = qv.map(_ / norm)
          (id, Array.tabulate(cb.length) { s =>
            val lo = s * v.length / cb.length
            val hi = (s + 1) * v.length / cb.length
            nearestL2(java.util.Arrays.copyOfRange(v, lo, hi), cb(s))
          })
        }
      }
  }

  /** ADC scoring + exact re-rank over pre-encoded codes. `vectors`
    * supplies the original (id, qv, nn) rows the bounded survivor set
    * re-ranks against (with a persisted index both come from the same
    * table — column pruning keeps the scoring scan codes-only). */
  private[operators] def pqSearch(codes: Dataset[(Long, Array[Int])],
      vectors: DataFrame, queries: DataFrame,
      codebooks: Array[Array[Array[Double]]], k: Int, rerank: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    require(rerank >= 1, "bad PQ parameters")
    val m = codebooks.length
    // --- ADC lookup tables per query (bounded probe set by contract) ---
    val qs = queries.select("id", "qv", "nn").as[(Long, Array[Long], Long)].collect()
    val tables: Array[(Long, Array[Array[Double]])] = qs.map { case (qid, qqv, qnn) =>
      val norm = math.sqrt(qnn.toDouble)
      val v = qqv.map(_ / norm)
      val bounds = Array.tabulate(m + 1)(i => i * v.length / m)
      qid -> Array.tabulate(m)(s => codebooks(s).map(c =>
        dot(java.util.Arrays.copyOfRange(v, bounds(s), bounds(s + 1)), c)))
    }
    val bcT = spark.sparkContext.broadcast(tables)
    val keep = rerank * k
    val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    val survivors: Dataset[(Long, Long)] = codes.mapPartitions { it =>
      val ts = bcT.value
      val heaps = Array.fill(ts.length)(
        mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
      it.foreach { case (cid, cs) =>
        var qi = 0
        while (qi < ts.length) {
          if (ts(qi)._1 != cid) {
            val tab = ts(qi)._2
            var s = 0
            var score = 0.0
            while (s < cs.length) { score += tab(s)(cs(s)); s += 1 }
            val h = heaps(qi)
            if (h.size < keep) h.enqueue((score, cid))
            else if (worstFirst.compare((score, cid), h.head) < 0) {
              h.dequeue(); h.enqueue((score, cid))
            }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (_, cid) => (ts(qi)._1, cid) }
      }
    }
    // --- exact re-rank: survivors fetch their original vectors ---
    val qdf = broadcast(qs.toSeq.toDF("qid2", "qqv", "qnn"))
    val scored = survivors.toDF("qid", "cand")
      .join(vectors.select(col("id").as("cand"), col("qv"), col("nn")), "cand")
      .join(qdf, col("qid") === col("qid2"))
      .select(col("qid"), col("cand"),
        VectorOps.qcosine(VectorOps.qdot(col("qv"), col("qqv")),
          col("nn"), col("qnn")).as("cos"))
    ranked(scored, k)
  }

  /** Nearest centroid by L2 (PQ codebook assignment); strict-less keeps
    * the lowest index on ties — deterministic. */
  private def nearestL2(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d2 = 0.0
      var i = 0
      val cc = cs(c)
      while (i < v.length) { val t = v(i) - cc(i); d2 += t * t; i += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** Distributed cell assignment: `probes` nearest cells per row.
    * Output columns: cell, id, qv, nn. */
  def assignCells(df: DataFrame, centroids: Array[Array[Double]],
      probes: Int): DataFrame =
    assignCellsBc(df, df.sparkSession.sparkContext.broadcast(centroids), probes)

  /** Broadcast-sharing variant so callers assigning several frames (IVF:
    * candidates AND queries) ship the centroids once. */
  private def assignCellsBc(df: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      probes: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select("id", "qv", "nn").as[(Long, Array[Long], Long)]
      .mapPartitions { iter =>
        val cs = bc.value
        iter.flatMap { case (id, qv, nn) =>
          val norm = math.sqrt(nn.toDouble)
          val v = qv.map(_ / norm)
          cells(v, cs, probes).map(c => (c, id, qv, nn))
        }
      }.toDF("cell", "id", "qv", "nn")
  }

  /**
   * Embedding clustering: train the cosine k-means coarse quantizer and
   * assign every vector to its nearest cell — the standalone form of the
   * IVF partitioner (corpus bucketing / topic sharding for training-data
   * pipelines). Bounded driver state (≤4096 sample vectors); assignment is
   * one scan-stage pass, no shuffle. Output: id, cell.
   */
  def kmeansAssign(candidates: DataFrame, nlist: Int = 16,
      iters: Int = 5): DataFrame =
    assignCells(candidates, trainCosineKmeans(candidates, nlist, iters), 1)
      .select("id", "cell")

  /**
   * Fully-declarative distributed Lloyd k-means over quantized vectors —
   * the oracle-checkable clustering path (unlike [[trainCosineKmeans]],
   * whose driver-side training is gated statistically). Seeds are the
   * `nlist` smallest-id vectors; each unrolled round assigns every vector
   * to its argmax-cosine centroid (ties → lowest cell) and recomputes
   * centroids as EXACT integer component sums (cell means cancel in the
   * cosine normalization, so the un-divided sum vector is the centroid —
   * no float accumulation anywhere). Every quantity both engines touch is
   * an integer below 2^53, so a SQL engine replays the rounds bit-exactly.
   *
   * Scale shape: one broadcast of ≤nlist centroid rows per round; the
   * n×nlist scoring is map-side (broadcast NL join with a bounded side);
   * the argmax is a max_by partial aggregation (shuffles ~n rows, not
   * n×nlist); centroid recompute shuffles nlist×dim partial sums per
   * partition. No driver state, no corpus-sized collect, plan depth is
   * O(rounds). Output: id, cell.
   */
  def lloydAssign(candidates: DataFrame, nlist: Int = 16,
      rounds: Int = 2): DataFrame = {
    import graft.plans.kernels
    val w = Window.orderBy("id")
    var cent = candidates.orderBy("id").limit(nlist)
      .select((row_number().over(w) - 1).as("cell"), col("qv").as("cv"))
    def assign(c: DataFrame): DataFrame = {
      val cb = broadcast(c.select(col("cell"), col("cv"),
        kernels.longArrayDot(col("cv"), col("cv")).cast("double").as("cn")))
      candidates.select("id", "qv").crossJoin(cb)
        .select(col("id"), col("qv"), col("cell"),
          (kernels.longArrayDot(col("qv"), col("cv")).cast("double") / sqrt(col("cn")))
            .as("score"))
        .groupBy("id")
        .agg(max_by(col("cell"), struct(col("score"), -col("cell"))).as("cell"),
          any_value(col("qv")).as("qv"))
    }
    for (_ <- 0 until rounds) {
      val assigned = assign(cent)
      cent = assigned
        .select(col("cell"), posexplode(col("qv")).as(Seq("pos", "q")))
        .groupBy("cell", "pos").agg(sum("q").as("s"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
          x => x.getField("s")).as("cv"))
    }
    assign(cent).select("id", "cell")
  }

  /**
   * Semantic deduplication — the SemDeDup shape (Abbas et al. 2023,
   * arXiv:2303.09540, public paper): cluster the embedding space with
   * k-means, then score pairs ONLY within a cluster and drop every
   * vector whose cosine to a LOWER-ID cluster-mate exceeds `threshold`.
   * One deterministic representative per semantic near-dup group
   * survives (the paper keeps the centroid-farthest member; keeping the
   * smallest id instead makes the choice total-order-stable and
   * SQL-replayable — same greedy economics).
   *
   * The SemDeDup insight is the scale shape: semantic near-dups
   * co-locate in embedding clusters, so the O(n²) pair scoring
   * collapses to Σ_cell |cell|² via a cell EQUI-join — never a cross
   * join — and `nlist` steers expected cell size (corpus/nlist).
   * Clustering is [[lloydAssign]] (declarative integer Lloyd: broadcast
   * centroids, map-side argmax, no driver state); pair scoring is exact
   * integer dot products + one IEEE divide, so a SQL engine replays the
   * whole decision bit-exactly. Input: quantized (id, qv, nn) as
   * produced by [[quantized]]. Output: (id, cell, kept).
   */
  def semanticDedup(candidates: DataFrame, nlist: Int = 16, rounds: Int = 2,
      threshold: Double = 0.95): DataFrame = {
    import graft.functions.VectorOps
    val cells = lloydAssign(candidates, nlist, rounds)
    val withVec = cells.join(candidates.select("id", "qv", "nn"), "id")
    val a = withVec.select(col("cell"), col("id").as("a_id"),
      col("qv").as("a_qv"), col("nn").as("a_nn"))
    val b = withVec.select(col("cell"), col("id").as("b_id"),
      col("qv").as("b_qv"), col("nn").as("b_nn"))
    val drops = a.join(b, "cell")
      .filter(col("a_id") < col("b_id"))
      .filter(VectorOps.qcosine(VectorOps.qdot(col("a_qv"), col("b_qv")),
        col("a_nn"), col("b_nn")) > threshold)
      .select(col("b_id").as("id")).distinct()
    cells.join(drops.withColumn("__drop", lit(true)), Seq("id"), "left_outer")
      .select(col("id"), col("cell"), col("__drop").isNull.as("kept"))
  }

  def ivfTopK(candidates: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 5): DataFrame = {
    val centroids = trainCosineKmeans(candidates, nlist, iters)
    val bc = candidates.sparkSession.sparkContext.broadcast(centroids)
    def assign(df: DataFrame, probes: Int): DataFrame =
      assignCellsBc(df, bc, probes)

    val ca = assign(candidates, 1)
    val qa = broadcast(assign(queries, nprobe)
      .select(col("cell"), col("id").as("qid"), col("qv").as("qqv"), col("nn").as("qnn")))
    val scored = ca.join(qa, "cell")
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("cand"),
        VectorOps.qcosine(VectorOps.qdot(col("qv"), col("qqv")), col("nn"), col("qnn"))
          .as("cos"))
    // no dedup needed: each candidate lives in exactly one cell, so a
    // (qid, cand) pair meets at most once even with nprobe > 1
    ranked(scored, k)
  }

  /**
   * Distributed IVF kNN JOIN — BOTH sides data-scale. [[topKScalable]]
   * and [[ivfTopK]] treat the query set as bounded by contract (collected
   * or broadcast); this operator makes no such assumption: a billion-row
   * query table joins a billion-row corpus through shared IVF cells.
   *
   * Topology: cells come from the sampled cosine-k-means trainer
   * (bounded driver state, ≤4096 sample vectors); both sides assign in
   * the scan stage (corpus → 1 cell, queries → `nprobe` cells for
   * recall); the only data-sized movement is ONE shuffle of each side on
   * `cell` for the equi-join, and scoring happens inside the join's
   * partitions. The per-query top-k rank compiles to WindowGroupLimit
   * below AND above its exchange, so the rank shuffle carries
   * O(map-partitions × resident-queries × k) survivors — never the full
   * scored pair set. `nlist` bounds per-task work (cell population ×
   * resident queries): size it ~√N at scale so cells stay task-sized.
   * Recall follows the IVF contract (gated in AnnSpec); a candidate
   * lives in exactly one cell, so no pair dedup is needed even with
   * nprobe > 1.
   */
  def ivfKnnJoin(candidates: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 5): DataFrame = {
    val centroids = trainCosineKmeans(candidates, nlist, iters)
    val bc = candidates.sparkSession.sparkContext.broadcast(centroids)
    val ca = assignCellsBc(candidates, bc, 1)
    val qa = assignCellsBc(queries, bc, nprobe)
      .select(col("cell"), col("id").as("qid"), col("qv").as("qqv"),
        col("nn").as("qnn"))
    val scored = ca.join(qa, "cell")
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("cand"),
        VectorOps.qcosine(VectorOps.qdot(col("qv"), col("qqv")), col("nn"),
          col("qnn")).as("cos"))
    ranked(scored, k)
  }

  private def nearestCell(v: Array[Double], cs: Array[Array[Double]]): Int =
    cells(v, cs, 1).head

  /** Indices of the `probes` nearest centroids by dot product (ties →
    * lower index), deterministic. */
  private[operators] def cells(v: Array[Double], cs: Array[Array[Double]], probes: Int): Seq[Int] =
    cs.indices
      .map(c => (c, dot(v, cs(c))))
      .sortBy { case (c, d) => (-d, c) }
      .take(probes)
      .map(_._1)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /**
   * LSH-bucketed top-k: candidates considered only when they share at
   * least one sign-band with the query. Bounded candidates per bucket;
   * exact rescoring of survivors. Probabilistic recall (see AnnSpec).
   */
  def lshTopK(candidates: DataFrame, queries: DataFrame, k: Int,
      bands: Int = 16, bits: Int = 4): DataFrame = {
    def banded(df: DataFrame, idAs: String) = df
      .select(col("id").as(idAs),
        posexplode(VectorOps.lshSignBands(col("qv"), bands, bits)).as(Seq("band", "bval")))
    val cb = banded(candidates, "cand")
    val qb = broadcast(banded(queries, "qid"))
    val pairs = cb.join(qb, Seq("band", "bval"))
      .filter(col("cand") =!= col("qid"))
      .select("qid", "cand").distinct()
    val qv = queries.select(col("id").as("qid"), col("qv").as("qqv"), col("nn").as("qnn"))
    val cv = candidates.select(col("id").as("cand"), col("qv").as("cqv"), col("nn").as("cnn"))
    val scored = pairs.join(broadcast(qv), "qid").join(cv, "cand")
      .select(col("qid"), col("cand"),
        VectorOps.qcosine(VectorOps.qdot(col("cqv"), col("qqv")), col("cnn"), col("qnn"))
          .as("cos"))
    ranked(scored, k)
  }
}
