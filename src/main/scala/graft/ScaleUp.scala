package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dev tool: derive an sf1-scale benchmark dataset from the driver's sf0.1
 * testdata by deterministic `factor`× replication with key-offset
 * remapping — join fan-in, key cardinalities, and value distributions all
 * scale together, so relative plan costs are representative of a real
 * 10× corpus. `runMain graft.ScaleUp [src] [dst] [factor]`.
 *
 * Replica 0 is the identity; replica r offsets every surrogate key by
 * r×(max+1) of its table so no keys collide and every foreign key still
 * joins to exactly one parent. Document text gets a per-replica suffix
 * token, so replicas of one doc are near-duplicates (jaccard ≈ 0.97) —
 * dedup queries see realistic 10-member families rather than exact
 * clones. nation/region (fixed dimensions) and events/embeddings (not in
 * the sf1 headline subset) copy through unchanged.
 *
 * Output lives under target/ (never committed, never touching the
 * read-only /root/testdata).
 *
 * Document replication modes (4th arg): `neardup` (default) appends a
 * per-replica suffix token, so all replicas of one doc are mutual
 * near-dups — chaining derivations MULTIPLIES family sizes and hence
 * SQUARES near-dup pair density (factor² pairs at factor× docs: a
 * stress corpus for pair-linear operators). `distinct` rewrites each
 * replica with a per-replica vowel→consonant translation of the whole
 * text (cross-replica jaccard ≈ 0 — LSH must not even CANDIDATE those
 * pairs; an appended-copy variant was tried first and left jaccard at
 * 0.33, a gray zone r=4 bands still pass ~38% of the time, inflating
 * verify volume 40×), while docs within one replica keep their source
 * family structure — pair density scales LINEARLY with factor, the
 * scaling a real 10× crawl exhibits.
 */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val docMode = args.lift(3).getOrElse("neardup")
    require(docMode == "neardup" || docMode == "distinct",
      s"doc mode must be 'neardup' or 'distinct', got '$docMode'")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val done = new java.io.File(s"$dst/_SCALE_DONE")
    if (done.exists()) { println(s"[scaleup] $dst already built"); spark.stop(); return }

    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    /** max(key)+1 — the per-replica offset stride for a key space. */
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L
    /** Union of `factor` replicas with the given key columns offset by
      * r×stride (strides passed per column). */
    def replicate(df: DataFrame, offsets: Map[String, Long],
        mutate: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until factor).map { r =>
        val shifted = offsets.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(r * s))
        }
        mutate(shifted, r)
      }.reduce(_ unionByName _)

    val (cust, ord, li, part, supp, docs) =
      (rd("customer"), rd("orders"), rd("lineitem"), rd("part"), rd("supplier"), rd("documents"))
    val cS = stride(cust, "c_custkey")
    val oS = stride(ord, "o_orderkey")
    val pS = stride(part, "p_partkey")
    val sS = stride(supp, "s_suppkey")
    val dS = stride(docs, "doc_id")

    wr(rd("region"), "region")
    wr(rd("nation"), "nation")
    wr(rd("events"), "events")
    wr(rd("embeddings"), "embeddings")
    wr(replicate(cust, Map("c_custkey" -> cS)), "customer")
    wr(replicate(supp, Map("s_suppkey" -> sS)), "supplier")
    wr(replicate(part, Map("p_partkey" -> pS)), "part")
    wr(replicate(ord, Map("o_orderkey" -> oS, "o_custkey" -> cS)), "orders")
    wr(replicate(li, Map("l_orderkey" -> oS, "l_partkey" -> pS, "l_suppkey" -> sS)),
      "lineitem")
    wr(replicate(docs, Map("doc_id" -> dS),
      (d, r) => if (r == 0) d
        else if (docMode == "distinct") {
          // per-replica vowel→consonant mapping over the WHOLE text:
          // replicas of one source doc share almost no shingles
          val cons = "bcdfghjklmnpqrstvwxz"
          val map5 = (0 until 5).map(i => cons((r + i * 3) % cons.length)).mkString
          d.withColumn("text", translate(col("text"), "aeiou", map5))
        } else d.withColumn("text", concat(col("text"), lit(s" replica$r")))
          .withColumn("n_chars", col("n_chars") + lit(s" replica$r".length.toLong))),
      "documents")
    done.getParentFile.mkdirs(); done.createNewFile()
    println(s"[scaleup] built $dst at ${factor}x from $src")
    spark.stop()
  }
}
