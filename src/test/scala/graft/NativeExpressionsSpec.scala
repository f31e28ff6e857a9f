package graft

import org.apache.spark.sql.functions._
import graft.functions.TextHash

/** Native kernels: SQL registration via extensions + equivalence with the
  * interpreted higher-order formulations. */
class NativeExpressionsSpec extends SparkSpecBase {

  test("extension functions are registered in SQL") {
    val r = spark.sql(
      "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head()
    assert(r.getLong(0) === 32L)
    val sim = spark.sql("SELECT simhash60(array(7L)) AS s").head().getLong(0)
    assert(sim === 7L) // single token: simhash = its low 60 bits
    val sig = spark.sql("SELECT minhash_sig(array(42L)) AS s").head()
      .getSeq[Long](0)
    assert(sig.length === 128)
  }

  test("native minhash equals the affine-permutation definition") {
    val (a, b) = TextHash.minhashCoeffs(128)
    val p = 2147483647L
    val hashes = Seq(123456789L, 987654321L, 555555555L)
    val expected = (0 until 128).map { j =>
      hashes.map(h => (a(j) * (h % p) + b(j)) % p).min
    }
    val got = spark.sql(s"SELECT minhash_sig(array(${hashes.mkString("L,")}L)) AS s")
      .head().getSeq[Long](0)
    assert(got === expected)
  }

  test("native simhash equals per-bit vote definition") {
    val hashes = Seq(0x3aL, 0x1cL, 0x1aL)
    val expected = (0 until 60).map { j =>
      val votes = hashes.map(h => if (((h >> j) & 1L) == 1L) 1 else -1).sum
      if (votes > 0) 1L << j else 0L
    }.sum
    val got = spark.sql(s"SELECT simhash60(array(${hashes.mkString("L,")}L)) AS s")
      .head().getLong(0)
    assert(got === expected)
  }

  test("empty and null inputs") {
    assert(spark.sql(
      "SELECT long_array_dot(CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>))")
      .head().getLong(0) === 0L)
    assert(spark.sql("SELECT minhash_sig(CAST(array() AS ARRAY<BIGINT>))")
      .head().getSeq[Long](0).forall(_ === 2147483647L))
    assert(spark.sql("SELECT simhash60(CAST(NULL AS ARRAY<BIGINT>))").head().isNullAt(0))
  }

  test("codegen and interpreted paths agree on table data") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val hs = TextHash.tokenHashes(d("text"))
    val viaNative = d.select(TextHash.simhash60(hs).as("s")).collect().map(_.getLong(0))
    // Interpreted reference: per-bit aggregate votes.
    val viaHof = d.select(
      (0 until 60).map { j =>
        when(aggregate(hs, lit(0L),
          (s, h) => s + when(shiftright(h, j) % 2 === 1, 1L).otherwise(-1L)) > 0,
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _).as("s")).collect().map(_.getLong(0))
    assert(viaNative.toSeq === viaHof.toSeq)
  }
}
