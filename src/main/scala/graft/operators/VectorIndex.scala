package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.sources.GraftCatalog

/**
 * Persisted IVF vector index over graft catalog tables — the
 * build-once / query-many ANN story. [[Similarity.ivfTopK]] retrains its
 * coarse quantizer on every call, which is the right shape for ad-hoc
 * exploration but wrong for a serving corpus: at 100 TB the quantizer
 * should train ONCE, the corpus should be laid out by cell ONCE, and each
 * query batch should then touch only its probed cells' files.
 *
 * Layout (two catalog tables, snapshot-versioned like any other):
 *  - `<table>_centroids` — (cell INT, cv ARRAY<DOUBLE>): the trained
 *    coarse quantizer. `nlist` rows, metadata-sized, read with one
 *    bounded collect per query batch.
 *  - `<table>` — (cell INT, id BIGINT, qv ARRAY<BIGINT>, nn BIGINT):
 *    the corpus, PARTITIONED BY cell. A probe therefore prunes at the
 *    partition-directory level through [[GraftCatalog.readWhere]] —
 *    `cell IN (probed)` never plans (let alone reads) the other cells'
 *    files, which is exactly how a 1000-executor cluster keeps per-batch
 *    I/O at nprobe/nlist of the corpus.
 *
 * Incremental maintenance: [[appendVectors]] assigns new rows with the
 * PERSISTED centroids (no retrain, one append commit) — ingestion cost is
 * O(batch) and the index never goes offline. Centroid drift under heavy
 * ingest is the operator's rebuild-cadence call, as with every IVF system
 * (FAISS's `train` vs `add` split).
 *
 * Determinism/exactness contract: scoring is the shared quantized-cosine
 * kernel (integer dots, one IEEE divide), so with `nprobe = nlist` the
 * result is bit-identical to [[Similarity.bruteForceTopK]] — which is how
 * the `ann_indexed` registration carries a full DuckDB oracle while the
 * pruned path's recall is gated statistically in AnnSpec.
 *
 * (Reference surface: the connector exposes Paimon tables to a query
 * engine; a vector index as TABLES — data + centroids — is the same
 * design instinct, everything versioned, nothing engine-private.)
 */
object VectorIndex {

  private def centroidTable(table: String) = s"${table}_centroids"

  /**
   * Train the coarse quantizer on `corpus` (quantized (id, qv, nn) rows,
   * as produced by [[Similarity.quantized]]) and persist both index
   * tables. One pass over the corpus for assignment; training state is
   * the bounded ≤4096-vector driver sample shared with the ad-hoc path.
   */
  def build(cat: GraftCatalog, schema: String, table: String,
      corpus: DataFrame, nlist: Int = 16, iters: Int = 5): Unit = {
    require(nlist >= 1, s"nlist must be >= 1, got $nlist")
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = Similarity.trainCosineKmeans(corpus, nlist, iters)
    val cdf = centroids.zipWithIndex.toSeq
      .map { case (cv, i) => (i, cv.toSeq) }
      .toDF("cell", "cv")
    cat.createTable(schema, centroidTable(table), cdf.schema)
    cat.append(schema, centroidTable(table), cdf)
    val assigned = Similarity.assignCells(corpus, centroids, 1)
    cat.createTable(schema, table, assigned.schema, partitionBy = Seq("cell"))
    cat.append(schema, table, assigned)
  }

  /** The persisted quantizer, cell-ordered. Bounded collect (nlist rows). */
  def centroidsOf(cat: GraftCatalog, schema: String,
      table: String): Array[Array[Double]] = {
    val df = cat.read(schema, centroidTable(table))
    import df.sparkSession.implicits._
    df.select("cell", "cv").as[(Int, Array[Double])].collect()
      .sortBy(_._1).map(_._2)
  }

  /**
   * Incremental add: assign `rows` (quantized (id, qv, nn)) with the
   * persisted centroids and append — no retrain, O(batch) commit.
   */
  def appendVectors(cat: GraftCatalog, schema: String, table: String,
      rows: DataFrame): Long =
    cat.append(schema, table,
      Similarity.assignCells(rows, centroidsOf(cat, schema, table), 1))

  /**
   * Probe the index: each query visits its `nprobe` nearest cells; the
   * corpus scan carries `cell IN (probed)` through [[GraftCatalog
   * .readWhere]], so unprobed partitions are pruned BEFORE planning. The
   * query side is bounded by contract (collected once, like
   * [[Similarity.topKScalable]]); the probed-cell set is ≤ nlist values
   * regardless of query count. Output: (qid, rank, cand, cos).
   */
  // ---- persisted product quantization --------------------------------------
  // PQ as tables: sub-codebooks train ONCE (bounded driver Lloyd, the
  // Similarity contract) into `<table>_codebooks`; the corpus persists as
  // (id, codes, qv, nn) in ONE table. The ADC scoring pass projects only
  // (id, codes) — columnar pruning makes the scan codes-sized (the "few
  // TB of codes for a 100 TB corpus" PQ promise, for free from parquet) —
  // while the bounded survivor set re-reads (id, qv, nn) for the exact
  // re-rank. Appends encode against the PERSISTED codebooks: O(batch),
  // no retrain, index never offline (FAISS's train/add split).

  private def codebookTable(table: String) = s"${table}_codebooks"

  /** Train sub-codebooks on `corpus` (quantized (id, qv, nn) rows) and
    * persist both tables. */
  def buildPq(cat: GraftCatalog, schema: String, table: String,
      corpus: DataFrame, m: Int = 8, ksub: Int = 16): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cb = Similarity.trainPqCodebooks(corpus, m, ksub)
    val cdf = cb.zipWithIndex.toSeq.flatMap { case (cents, s) =>
      cents.zipWithIndex.map { case (v, c) => (s, c, v.toSeq) }
    }.toDF("s", "c", "vec")
    cat.createTable(schema, codebookTable(table), cdf.schema)
    cat.append(schema, codebookTable(table), cdf)
    val enc = encodedRows(corpus, cb)
    cat.createTable(schema, table, enc.schema)
    cat.append(schema, table, enc)
  }

  private def encodedRows(rows: DataFrame,
      cb: Array[Array[Array[Double]]]): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    Similarity.encodePq(rows, cb).toDF("id", "codes")
      .join(rows.select("id", "qv", "nn"), "id")
  }

  /** The persisted sub-codebooks. Bounded collect (m·ksub rows). */
  def codebooksOf(cat: GraftCatalog, schema: String,
      table: String): Array[Array[Array[Double]]] = {
    val df = cat.read(schema, codebookTable(table))
    import df.sparkSession.implicits._
    df.select("s", "c", "vec").as[(Int, Int, Array[Double])].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toArray).toArray
  }

  /** Incremental add: encode with the PERSISTED codebooks and append —
    * no retrain, one O(batch) commit. */
  def appendPqVectors(cat: GraftCatalog, schema: String, table: String,
      rows: DataFrame): Long =
    cat.append(schema, table,
      encodedRows(rows, codebooksOf(cat, schema, table)))

  /** Query the persisted PQ index: ADC over the codes-only projection,
    * exact re-rank of the `rerank·k` survivors against (qv, nn) from the
    * same table. Output: (qid, rank, cand, cos). */
  def queryPq(cat: GraftCatalog, schema: String, table: String,
      queries: DataFrame, k: Int, rerank: Int = 4): DataFrame = {
    val cb = codebooksOf(cat, schema, table)
    val t = cat.read(schema, table)
    val spark = t.sparkSession
    import spark.implicits._
    val codes = t.select("id", "codes").as[(Long, Array[Int])]
    Similarity.pqSearch(codes, t.select("id", "qv", "nn"), queries,
      cb, k, rerank)
  }

  def query(cat: GraftCatalog, schema: String, table: String,
      queries: DataFrame, k: Int, nprobe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cs = centroidsOf(cat, schema, table)
    val probes = math.min(math.max(nprobe, 1), cs.length)
    val qs = queries.select("id", "qv", "nn")
      .as[(Long, Array[Long], Long)].collect()
    val qa = qs.toSeq.flatMap { case (id, qv, nn) =>
      val norm = math.sqrt(nn.toDouble)
      val v = qv.map(_ / norm)
      Similarity.cells(v, cs, probes).map(c => (c, id, qv, nn))
    }
    val probed = qa.map(_._1).distinct.sorted
    val qdf = broadcast(qa.toDF("cell", "qid", "qqv", "qnn"))
    val scan = cat.readWhere(schema, table,
      col("cell").isin(probed.map(Int.box): _*))
    // a corpus row lives in exactly one cell ⇒ a (qid, cand) pair meets
    // at most once even with nprobe > 1 — no dedup needed (ivfTopK rule)
    val scored = scan.join(qdf, "cell")
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("cand"),
        VectorOps.qcosine(VectorOps.qdot(col("qv"), col("qqv")),
          col("nn"), col("qnn")).as("cos"))
    Similarity.ranked(scored, k)
  }
}
