package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextHash

/**
 * End-to-end training-data cleaning pipeline — the composition the rest of
 * the library exists for:
 *
 *   normalize → quality filter → exact dedup (keep-first) →
 *   near-dedup (MinHash+LSH, drop any doc with a lower-id near-duplicate)
 *
 * Every stage is the deterministic, scale-safe operator defined elsewhere
 * (no all-pairs joins; candidate generation is LSH-bucketed), and the
 * whole composition stays hash-checkable against a SQL oracle.
 */
object Pipelines {

  /**
   * @return surviving docs: idCol, norm_text, n_tokens, digest
   */
  def cleanCorpus(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 20, tau: Double = 0.75): DataFrame = {
    // 1. normalize: lowercase, strip non-alphanumerics, collapse spaces
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +", " "))
    val normalized = df.select(col(idCol), norm.as("norm_text"))
      .withColumn("n_tokens", size(TextHash.tokens(col("norm_text"))))
    // 2. quality filter. Persisted: the regex normalization is the most
    // expensive narrow stage and is consumed by three branches (exact-dedup
    // digests, the minhash pipeline, and the final projection) — without
    // the persist each branch re-scans parquet and re-runs the regexes.
    // MEMORY_AND_DISK (the default) spills under pressure, so this holds
    // at cluster scale; on a real 100 TB run this materialization point is
    // where you'd checkpoint to the warehouse instead. Cache lifetime: the
    // returned plan references these caches, so they stay registered until
    // the caller drops them (spark.catalog.clearCache() or unpersist after
    // materializing) — the bench clears caches between queries.
    val quality = normalized.filter(col("n_tokens") >= minTokens).persist()
    // 3. exact dedup (keep-first per digest)
    val exactKept = Dedup.exact(quality, idCol, "norm_text")
    val survivors = quality.join(exactKept.select(idCol), idCol).persist()
    // 4. near-dedup: drop any doc with a near-duplicate of smaller id
    val nearPairs = Dedup.minhashPairs(survivors, idCol, "norm_text", tau)
    val drop = nearPairs.select(col("d2").as(idCol)).distinct()
    survivors.join(drop, Seq(idCol), "left_anti")
      .join(exactKept, idCol)
      .select(col(idCol), col("norm_text"), col("n_tokens"), col("digest"))
  }
}
