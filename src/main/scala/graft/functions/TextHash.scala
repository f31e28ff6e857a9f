package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Engine-portable text hashing primitives for the dedup family.
 *
 * All hashes are built from md5 hex (identical across engines) rather than
 * engine-native hash functions, so every stage can be oracle-checked in
 * DuckDB bit-for-bit. All arithmetic stays in [0, 2^61) to be safe under
 * ANSI overflow checking.
 *
 * Scale notes: everything here is per-row expression work — no shuffles,
 * no UDFs (whole plan stays inside Catalyst; higher-order functions are
 * interpreted but partition-parallel and shuffle-free).
 */
object TextHash {

  /** Mersenne prime 2^31-1: modulus for the affine minhash permutations. */
  val P: Long = 2147483647L

  /** Lowercase word tokens (ASCII [a-z]+ runs). */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+"), lit(0))

  /** Distinct n-word shingles joined with single spaces (single-pass
    * native kernel; empty array when the doc has fewer than n tokens). */
  def shingles(text: Column, n: Int): Column =
    graft.plans.kernels.wordShingles(tokens(text), n)

  /** 60-bit hash of a string: first 15 hex digits of md5, parsed base-16.
    * Portable: DuckDB equivalent is CAST('0x' || substring(md5(s),1,15) AS BIGINT). */
  def hash60(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Deterministic affine-permutation coefficients for minhash k = 0..k-1. */
  def minhashCoeffs(k: Int): (Array[Long], Array[Long]) = {
    val a = Array.tabulate(k)(i => 1L + ((i + 1L) * 2654435761L) % (P - 1))
    val b = Array.tabulate(k)(i => ((i + 1L) * 40503L * 104729L) % P)
    (a, b)
  }

  /**
   * K-wide MinHash signature of a shingle array column: for each k,
   * min over shingles of (a_k * (hash60(g) mod P) + b_k) mod P.
   * Empty shingle set → signature of all P (never matches a real band).
   * Per-row only — the 100 TB path computes signatures in the scan stage
   * with zero shuffle.
   */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    minhashSignatureFromHashes(transform(shingleCol, g => hash60(g)), k)

  /** Signature from PRE-HASHED shingles (array<bigint> of [[hash60]]
    * values) — for callers that reuse the hashed sets downstream (the
    * minhash verify stage) and hash only once. */
  def minhashSignatureFromHashes(hashCol: Column, k: Int): Column = {
    val (a, b) = minhashCoeffs(k)
    // One fused native pass for all K slots (graft.plans.MinHashSig;
    // empty input → all-P signature).
    graft.plans.kernels.minhashSig(hashCol, a, b)
  }

  /**
   * LSH band values for a signature: bands of `r` consecutive signature
   * slots, each reduced to a single portable 60-bit value. Returns
   * array<struct<band:int, bval:bigint>> for explode + groupBy(band, bval).
   */
  def lshBands(sig: Column, bands: Int, r: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.cast("int").as("band"),
        hash60(concat_ws(",", transform(slice(sig, b * r + 1, lit(r)), _.cast("string"))))
          .as("bval")))

  /**
   * 60-bit SimHash over an array of 60-bit token hashes (see [[tokenHashes]]):
   * bit j is set iff the sum over tokens of ±1 (sign of bit j of the token
   * hash) is positive. DuckDB-portable (same md5-derived hashes, same tie
   * rule). Unrolled over the 60 bits so every shift amount is a literal.
   */
  def simhash60(hashArr: Column): Column =
    graft.plans.kernels.simhash60(hashArr)

  /** Distinct-token 60-bit hashes for a text column (simhash input). */
  def tokenHashes(text: Column): Column =
    transform(array_distinct(tokens(text)), t => hash60(t))

  /** SimHash band values: `bands` bands of `bits` bits each (LSB-first).
    * Hamming distance ≤ bands-1 guarantees at least one identical band
    * (pigeonhole), so banding has recall 1 for that radius. */
  def simhashBands(sim: Column, bands: Int, bits: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        pmod(shiftright(sim, b * bits), lit(1L << bits)).as("bval"))
    }: _*)
}
