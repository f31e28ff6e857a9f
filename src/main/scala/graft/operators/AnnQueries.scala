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
    // Embedding clustering (standalone IVF partitioner): per-cell census.
    // No SQL oracle (iterative k-means isn't SQL-expressible); cluster
    // quality/ determinism asserted in AnnSpec.
    "cluster_kmeans" -> ((s, dir) => {
      val (cands, _) = qc(s, dir)
      Similarity.kmeansAssign(cands)
        .groupBy("cell")
        .agg(count(lit(1)).as("n_vectors"), min("id").as("min_id"), max("id").as("max_id"))
        .orderBy("cell")
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

  def oracle: Map[String, String] = Map(
    "ann_bruteforce" -> annOracle,
    "ann_scalable" -> annOracle,
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
