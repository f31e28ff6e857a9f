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

  private def ranked(scored: DataFrame, k: Int): DataFrame = {
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
                while (i < cqv.length) { dot += cqv(i) * qqv(i); i += 1 }
                val cos = dot.toDouble / math.sqrt((cnn * qnn).toDouble)
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
   * LSH-bucketed top-k: candidates considered only when they share at
   * least one sign-band with the query. Bounded candidates per bucket;
   * exact rescoring of survivors. Probabilistic recall (see AnnSpec).
   */
  def lshTopK(candidates: DataFrame, queries: DataFrame, k: Int,
      bands: Int = 16, bits: Int = 4): DataFrame = {
    val dim = candidates.select(size(col("qv"))).head().getInt(0)
    def banded(df: DataFrame, idAs: String) = df
      .select(col("id").as(idAs),
        explode(VectorOps.lshSignBands(col("qv"), dim, bands, bits)).as("bb"))
      .select(col(idAs), col("bb.band").as("band"), col("bb.bval").as("bval"))
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
