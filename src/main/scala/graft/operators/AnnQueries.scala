package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/**
 * Similarity-search query pack over the `embeddings` table. Query set =
 * every 10th vector (bounded probe side). `ann_bruteforce` and
 * `ann_scalable` share one oracle — proving the bounded-state path is
 * bit-identical to the declarative baseline. `ann_lsh` is probabilistic
 * (recall measured in AnnSpec), so it registers without an oracle.
 */
object AnnQueries {

  private val K = 10

  // One JVM-wide warehouse root for the persisted-index query (same
  // pattern as CatalogQueries: unique table per invocation, swept on exit).
  private lazy val idxRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-ann-idx")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(p.toFile)
    }
    p
  }
  private val idxSeq = new java.util.concurrent.atomic.AtomicLong()
  private def freshIdx(s: SparkSession): (graft.sources.GraftCatalog, String) = {
    val cat = new graft.sources.GraftCatalog(s, idxRoot.toString)
    cat.createSchema("idx") // idempotent mkdirs
    (cat, s"vidx_${idxSeq.incrementAndGet()}")
  }

  private def qc(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val all = Similarity.quantized(Tables(s, dir, "embeddings"), "vec_id", "embedding")
    (all, all.filter(col("id") % 10 === 0))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> ((s, dir) => {
      val (cands, qs) = qc(s, dir)
      Similarity.bruteForceTopK(cands, qs, K).orderBy("qid", "rank")
    }),
    "ann_scalable" -> ((s, dir) => {
      val (cands, qs) = qc(s, dir)
      Similarity.topKScalable(cands, qs, K).orderBy("qid", "rank")
    }),
    "ann_lsh" -> ((s, dir) => {
      val (cands, qs) = qc(s, dir)
      Similarity.lshTopK(cands, qs, K).orderBy("qid", "rank")
    }),
    "ann_ivf" -> ((s, dir) => {
      val (cands, qs) = qc(s, dir)
      Similarity.ivfTopK(cands, qs, K).orderBy("qid", "rank")
    }),
    // PQ + exact re-rank (probabilistic like ann_lsh/ann_ivf — recall
    // gated in AnnSpec; the scoring pass reads codes, never vectors).
    "ann_pq" -> ((s, dir) => {
      val (cands, qs) = qc(s, dir)
      Similarity.pqTopK(cands, qs, K).orderBy("qid", "rank")
    }),
    // Distributed kNN JOIN: the query side is DATA-SCALE (every 3rd
    // vector — thousands of queries), never collected or broadcast by
    // construction; both sides shuffle once on their IVF cell. Recall
    // gated in AnnSpec like the other IVF path.
    "ann_knn_join" -> ((s, dir) => {
      val all = Similarity.quantized(Tables(s, dir, "embeddings"), "vec_id", "embedding")
      Similarity.ivfKnnJoin(all, all.filter(col("id") % 3 === 0), K)
        .orderBy("qid", "rank")
    }),
    // Persisted IVF index probed with nprobe = nlist — EXACT by
    // construction (every cell probed, shared scoring kernel), so unlike
    // ann_ivf this registration carries the full brute-force oracle while
    // still exercising the real build→persist→prune→query machinery
    // (centroid table read, cell-partitioned catalog scan through
    // readWhere). The pruning + recall story for nprobe < nlist is gated
    // in AnnSpec.
    "ann_indexed" -> ((s, dir) => {
      val (cands, qs) = qc(s, dir)
      val (cat, t) = freshIdx(s)
      VectorIndex.build(cat, "idx", t, cands, nlist = 8, iters = 3)
      VectorIndex.query(cat, "idx", t, qs, K, nprobe = 8).orderBy("qid", "rank")
    }),
    // Persisted PQ index: codebooks train once into a catalog table, the
    // corpus persists as (id, codes, qv, nn) — ADC scans the codes-only
    // projection (columnar pruning = the "codes-sized scan" PQ promise),
    // bounded survivors re-rank exactly. Statistical recall (≥0.8 gated
    // in AnnSpec with build-once/query-many + append-no-retrain); no
    // DuckDB oracle by design, like ann_pq.
    "ann_pq_indexed" -> ((s, dir) => {
      val (cands, qs) = qc(s, dir)
      val (cat, t) = freshIdx(s)
      VectorIndex.buildPq(cat, "idx", t, cands)
      VectorIndex.queryPq(cat, "idx", t, qs, K).orderBy("qid", "rank")
    }),
    // Per-label centroids (class prototypes / cluster seeds): exact
    // integer sums over quantized components — one shuffle on
    // (label, pos) after a scan-stage posexplode; the mean is a single
    // IEEE division, so the oracle matches bit-exactly.
    "emb_label_centroids" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      e.select(col("label"),
          posexplode(graft.functions.VectorOps.quantize(col("embedding")))
            .as(Seq("pos", "q")))
        .groupBy("label", "pos")
        .agg(sum("q").as("sum_q"), count(lit(1)).as("n_vectors"))
        .withColumn("centroid", col("sum_q").cast("double") / col("n_vectors"))
        .orderBy("label", "pos")
    }),
    // Embedding clustering: per-cell census over the fully-declarative
    // Lloyd path (smallest-id seeds, 2 unrolled rounds, exact integer
    // centroid sums) — SQL-replayable, so unlike the driver-sample
    // trainer it carries a full rows+schema+hash oracle. The sampled
    // trainer behind ivfTopK stays statistically gated in AnnSpec.
    "cluster_kmeans" -> ((s, dir) => {
      val (cands, _) = qc(s, dir)
      Similarity.lloydAssign(cands)
        .groupBy("cell")
        .agg(count(lit(1)).as("n_vectors"), min("id").as("min_id"), max("id").as("max_id"))
        .orderBy("cell")
    }),
    // Semantic dedup (SemDeDup): cluster-bucketed near-dup removal over
    // the embedding space. Plant exact duplicates (the 40 lowest vec_ids
    // copied to vec_id + 100000, mirrored verbatim in the oracle — same
    // non-vacuity device as dedup_embedding: identical vectors share an
    // argmax cell necessarily and score cos exactly 1.0 > threshold in
    // both engines, so the drop set is provably non-empty). Seeds stay
    // the ORIGINAL 16 lowest ids (planted ids are offset high).
    "dedup_semantic" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings").select("vec_id", "embedding")
      val maxId = e.agg(max("vec_id")).head.getLong(0)
      require(maxId < 100000L,
        s"dedup_semantic planted-id offset 100000 collides with corpus " +
          s"max vec_id $maxId; raise the offset in BOTH query and oracle")
      val planted = e.filter(col("vec_id") < 40)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      val q = Similarity.quantized(e.unionByName(planted), "vec_id", "embedding")
      Similarity.semanticDedup(q, nlist = 16, rounds = 2, threshold = 0.95)
        .orderBy("id")
    }),
  )

  private val annOracle =
    """WITH q AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v, list_dot_product(v, v) AS nn FROM q),
      |qs AS (SELECT * FROM n WHERE vec_id % 10 = 0),
      |p AS (SELECT qs.vec_id AS qid, n.vec_id AS cand,
      |        list_dot_product(qs.v, n.v) / sqrt(qs.nn * n.nn) AS cos
      |      FROM qs JOIN n ON n.vec_id <> qs.vec_id)
      |SELECT qid, rank, cand, cos FROM (
      |  SELECT qid, cand, cos, CAST(row_number() OVER (
      |    PARTITION BY qid ORDER BY cos DESC, cand ASC) AS INTEGER) AS rank
      |  FROM p) t
      |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  // Unrolled Lloyd replay: assignment = argmax of dot(qv, cv)/|cv| (the
  // per-cell mean's divisor cancels under cosine, so centroids stay raw
  // integer sum vectors — every value an exact integer < 2^53 in both
  // engines). Ties break to the lowest cell, mirroring lloydAssign.
  private def lloydAssignSql(centCte: String) =
    s"""SELECT id, qv, cell FROM (
       |  SELECT v.id, v.qv, c.cell, row_number() OVER (PARTITION BY v.id
       |    ORDER BY list_dot_product(v.qv, c.cv)
       |             / sqrt(list_dot_product(c.cv, c.cv)) DESC, c.cell ASC) AS rn
       |  FROM v CROSS JOIN $centCte c) x WHERE rn = 1""".stripMargin

  private def lloydMeansSql(assignCte: String) =
    s"""SELECT cell, list(s ORDER BY pos) AS cv FROM (
       |  SELECT cell, pos, sum(q) AS s FROM (
       |    SELECT cell, unnest(qv) AS q, unnest(range(0, len(qv))) AS pos
       |    FROM $assignCte) u GROUP BY cell, pos) g GROUP BY cell""".stripMargin

  private val kmeansOracle =
    s"""WITH v AS (
       |  SELECT vec_id AS id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings),
       |seeds AS (
       |  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER) AS cell,
       |         qv AS cv
       |  FROM (SELECT * FROM v ORDER BY id LIMIT 16) t),
       |a1 AS (${lloydAssignSql("seeds")}),
       |c1 AS (${lloydMeansSql("a1")}),
       |a2 AS (${lloydAssignSql("c1")}),
       |c2 AS (${lloydMeansSql("a2")}),
       |a3 AS (${lloydAssignSql("c2")})
       |SELECT cell, count(*) AS n_vectors, min(id) AS min_id, max(id) AS max_id
       |FROM a3 GROUP BY cell ORDER BY cell""".stripMargin

  // SemDeDup replay: the same Lloyd rounds as kmeansOracle but over the
  // planted-union corpus (CTE still named `v` so the shared
  // lloydAssignSql/lloydMeansSql fragments bind), then within-cell pair
  // scoring with the exact qcosine expression (integer dots < 2^53,
  // one IEEE divide) and the smallest-id-survives drop rule.
  private val semanticDedupOracle =
    s"""WITH v AS (
       |  SELECT vec_id AS id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
       |  FROM (
       |    SELECT vec_id, embedding FROM embeddings
       |    UNION ALL
       |    SELECT vec_id + 100000, embedding FROM embeddings
       |    WHERE vec_id < 40) b),
       |seeds AS (
       |  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER) AS cell,
       |         qv AS cv
       |  FROM (SELECT * FROM v ORDER BY id LIMIT 16) t),
       |a1 AS (${lloydAssignSql("seeds")}),
       |c1 AS (${lloydMeansSql("a1")}),
       |a2 AS (${lloydAssignSql("c1")}),
       |c2 AS (${lloydMeansSql("a2")}),
       |a3 AS (${lloydAssignSql("c2")}),
       |drops AS (
       |  SELECT DISTINCT pb.id AS id
       |  FROM a3 pa JOIN a3 pb ON pa.cell = pb.cell AND pa.id < pb.id
       |  WHERE CAST(list_dot_product(pa.qv, pb.qv) AS DOUBLE)
       |        / sqrt(CAST(list_dot_product(pa.qv, pa.qv) AS DOUBLE)
       |               * CAST(list_dot_product(pb.qv, pb.qv) AS DOUBLE)) > 0.95)
       |SELECT a3.id, a3.cell, (drops.id IS NULL) AS kept
       |FROM a3 LEFT JOIN drops ON a3.id = drops.id
       |ORDER BY a3.id""".stripMargin

  def oracle: Map[String, String] = Map(
    "ann_bruteforce" -> annOracle,
    "dedup_semantic" -> semanticDedupOracle,
    "ann_scalable" -> annOracle,
    "ann_indexed" -> annOracle,
    "cluster_kmeans" -> kmeansOracle,
    "emb_label_centroids" ->
      """WITH x AS (
        |  SELECT label,
        |    unnest(list_transform(embedding,
        |      e -> CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT))) AS q,
        |    unnest(range(0, len(embedding))) AS pos
        |  FROM embeddings)
        |SELECT label, CAST(pos AS INTEGER) AS pos,
        |  CAST(sum(q) AS BIGINT) AS sum_q,
        |  count(*) AS n_vectors,
        |  CAST(sum(q) AS DOUBLE) / count(*) AS centroid
        |FROM x GROUP BY label, pos
        |ORDER BY label, pos""".stripMargin,
  )
}
