package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding-vector primitives for similarity search and cosine near-dedup.
 *
 * Determinism contract (SURVEY.md §4): float embeddings are quantized to
 * integers (`floor(x*1000 + 0.5)`), so dot products and squared norms are
 * exact integer values (< 2^53) in any summation order — both Spark and
 * DuckDB produce bit-identical cosines from them.
 */
object VectorOps {

  /** Quantize array<float> to array<bigint> at 3 decimal places. */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 1000 + 0.5).cast("long"))

  /** Exact integer dot product of two quantized vectors (native kernel —
    * a fused codegen loop instead of interpreted zip_with + aggregate). */
  def qdot(a: Column, b: Column): Column =
    graft.plans.kernels.longArrayDot(a, b)

  /** Cosine similarity from quantized vectors + precomputed squared norms:
    * one IEEE division and sqrt over exact integers — deterministic.
    * Each norm is cast to double BEFORE multiplying: the long product would
    * overflow for non-unit embeddings (nn is only bounded by 2^53), and the
    * DuckDB oracle's list_dot_product norms are doubles already. */
  def qcosine(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") / sqrt(normSqA.cast("double") * normSqB.cast("double"))

  /**
   * Random-hyperplane LSH sign bands for a quantized vector: `bands` bands
   * of `bits` sign bits each. Plane coefficients are deterministic
   * (seeded), integer-valued in [-1000, 1000], so the sign of the integer
   * dot product is exact. Cosine-similar vectors agree on most signs, so
   * near-dup pairs collide on at least one band with high probability.
   *
   * Returns array<bigint> of length `bands` (index = band). Consume with
   * `posexplode` so the signing kernel runs ONCE per row — wrapping each
   * element in a per-band struct via element_at re-evaluates the whole
   * O(bands·bits·dim) kernel per element, turning it O(bands²·bits·dim).
   *
   * The plane set is derived inside the kernel from each row's vector
   * length (seeded, deterministic per dim) — callers don't probe the
   * dimension, so no extra Spark job precedes the scan.
   */
  def lshSignBands(qv: Column, bands: Int, bits: Int, seed: Long = 42L): Column =
    graft.plans.kernels.hyperplaneSignBands(qv, seed, bands, bits)
}
