package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/**
 * Deduplication family for LLM training-data pipelines: exact content-hash
 * dedup, MinHash+LSH near-dedup with an exact n-gram Jaccard verify stage,
 * SimHash with hamming banding, and embedding-cosine near-dedup. Pipelines
 * live in [[Dedup]]; this pack registers them over the `documents` /
 * `embeddings` tables with DuckDB oracles.
 *
 * 100 TB design notes:
 *  - Exact dedup is a hash-partitioned window (one shuffle on the digest).
 *  - MinHash signatures/bands are per-row expression work in the scan
 *    stage; candidate generation is a bucketed self-join on (band, bval) —
 *    never an all-pairs cross join. Bucket sizes are bounded because a
 *    band value is a 60-bit hash of r=4 minhashes.
 *  - SimHash banding (4 bands × 15 bits) has guaranteed recall for
 *    hamming radius ≤ 3 by pigeonhole, so the bucketed join is exhaustive,
 *    not probabilistic.
 *  - The oracle for `dedup_minhash` is all-pairs exact Jaccard: sound
 *    because the verify stage recomputes exact Jaccard on candidates, and
 *    at τ=0.75 the probability an LSH band misses a qualifying pair is
 *    (1-0.75^4)^32 ≈ 1.5e-15 per pair. (The oracle's all-pairs join is
 *    DuckDB-side only — the Spark plan never does it.)
 */
object DedupQueries {

  private val Tau = 0.75      // minhash near-dup threshold (corpus gap: 0.5–0.9 empty)
  private val CosTau = 0.8    // embedding near-dup threshold

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables(s, dir, "documents"), "doc_id", "text").orderBy("doc_id")),
    "dedup_stats" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      d.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(d("text").cast("binary"))).as("n_unique"),
          (count(lit(1)) - countDistinct(md5(d("text").cast("binary")))).as("n_dup_rows"))
    }),
    // Exact 3-gram Jaccard over a bounded sample (all pairs of 20 docs) —
    // the verify-stage kernel, oracle-checked with non-trivial values.
    "dedup_ngram_pairs" -> ((s, dir) => {
      // persist: stops CollapseProject from re-inlining the (interpreted)
      // shingle expression into every reference inside the pair jaccard
      val a = Dedup.shingleSets(Tables(s, dir, "documents"), "doc_id", "text")
        .filter(col("doc_id") < 20).select(col("doc_id").as("d1"), col("sh").as("sh1"))
        .persist()
      val b = Dedup.shingleSets(Tables(s, dir, "documents"), "doc_id", "text")
        .filter(col("doc_id") < 20).select(col("doc_id").as("d2"), col("sh").as("sh2"))
        .persist()
      a.join(b, col("d1") < col("d2"))
        .select(col("d1"), col("d2"), Dedup.jaccard(col("sh1"), col("sh2")).as("jac"))
        .orderBy("d1", "d2")
    }),
    // Oracle contract: these three pin maxBucket ABOVE any natural band
    // bucket in the verified corpora (sf0.1 simhash max ≈ 1.6k members),
    // because the DuckDB oracle enumerates ALL qualifying pairs — the
    // star bound would under-report inside a capped bucket. 2048 is the
    // tightest such pin: it keeps all-pairs semantics at every verified
    // SF while capping any one band bucket's self-join at ~4M candidate
    // pairs, so a 10× corpus (sf1, where degenerate simhash buckets
    // reach 6-16k members) stays star-bounded instead of handing single
    // tasks O(m²) work — measured 162s → seconds for dedup_simhash at
    // sf1. The library default (1024) is the production scale guard; its
    // gate is the DedupSpec 10k-family test.
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashPairs(Tables(s, dir, "documents"), "doc_id", "text", Tau,
          maxBucket = 2048)
        .orderBy("d1", "d2")),
    // Edit-distance verify kernel (fuzzy dedup's second stage): pairwise
    // levenshtein over normalized 80-char prefixes. Registered on a bounded
    // sample (all pairs of 20 docs) so the oracle stays cheap; at scale the
    // same kernel runs only inside LSH candidate buckets, never all-pairs.
    "dedup_levenshtein" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val norm = trim(regexp_replace(lower(d("text")), "\\s+", " "))
      val pre = d.filter(d("doc_id") < 20)
        .select(d("doc_id"), substring(norm, 1, 80).as("s"))
      val a = pre.select(col("doc_id").as("d1"), col("s").as("s1"))
      val b = pre.select(col("doc_id").as("d2"), col("s").as("s2"))
      a.join(b, col("d1") < col("d2"))
        .select(col("d1"), col("d2"), levenshtein(col("s1"), col("s2")).as("dist"))
        .filter(col("dist") <= 55)
        .orderBy("d1", "d2")
    }),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(Tables(s, dir, "documents"), "doc_id", "text",
          maxBucket = 2048)
        .orderBy("d1", "d2")),
    // The raw corpus has no pair at cos >= 0.8 at driver SFs, which made
    // this oracle compare 0 = 0 for rounds — vacuous. Plant exact
    // duplicates (the 50 lowest vec_ids copied to vec_id + 100000):
    // identical vectors give identical sign-band signatures, so LSH
    // recall is exactly 1 (no probabilistic miss), cos is exactly 1.0 in
    // both engines (nn/sqrt(nn*nn) with nn² < 2^53), and the oracle
    // derivation below mirrors this union verbatim.
    "dedup_embedding" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings").select("vec_id", "embedding")
      // The oracle mirrors this fixed offset verbatim, so it cannot be
      // derived from the corpus — instead fail loudly if a larger SF ever
      // grows vec_id into the planted range (which would make vec_id
      // non-unique and pair identity ambiguous).
      val maxId = e.agg(max("vec_id")).head.getLong(0)
      require(maxId < 100000L,
        s"dedup_embedding planted-id offset 100000 collides with corpus max vec_id $maxId; raise the offset in BOTH the query and its oracle")
      val planted = e.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      Dedup.embeddingPairs(e.unionByName(planted), "vec_id", "embedding", CosTau,
          maxBucket = 2048)
        .orderBy("d1", "d2")
    }),
    // Transitive closure of the minhash near-dup graph: cluster id per doc
    // (min reachable id). Oracle = recursive CTE over the exact-Jaccard
    // pair graph.
    "dedup_clusters" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val pairs = Dedup.minhashPairs(d, "doc_id", "text", Tau, maxBucket = 2048)
        .select("d1", "d2")
      Dedup.connectedComponents(d, "doc_id", pairs).orderBy("doc_id")
    }),
    // Cluster-canonical selection: production corpus dedup keeps ONE
    // member per near-dup cluster — the longest document (quality proxy),
    // smallest id on ties — and drops the rest. Clusters come from the
    // same star-contraction components as dedup_clusters; the pick is a
    // single window over `cluster` (row_number and member count share one
    // Exchange), so choosing representatives costs one shuffle of
    // (doc_id, cluster, n_chars) triples — never the text.
    "dedup_keep_best" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir, "documents")
      val pairs = Dedup.minhashPairs(d, "doc_id", "text", Tau, maxBucket = 2048)
        .select("d1", "d2")
      val byCluster = Window.partitionBy("cluster")
      val best = Window.partitionBy("cluster")
        .orderBy(col("n_chars").desc, col("doc_id"))
      Dedup.connectedComponents(d, "doc_id", pairs)
        .join(d.select("doc_id", "n_chars"), Seq("doc_id"))
        .withColumn("members", count(lit(1)).over(byCluster))
        .withColumn("__rn", row_number().over(best))
        .filter(col("__rn") === 1)
        .select(col("cluster"), col("doc_id").as("keep_doc_id"), col("members"))
        .orderBy("cluster")
    }),
    // Incremental dedup: a NEW batch (every third doc, plus planted
    // copies of old docs at +200000 so cross-batch matches provably
    // exist) deduped against the persisted signature state of the OLD
    // corpus (the other two thirds) — the corpus text is never re-read.
    // Output: surviving new-batch ids. Oracle replays exact-Jaccard
    // new×old matching over the same split.
    "dedup_incremental" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").select("doc_id", "text")
      val old = d.filter(col("doc_id") % 3 =!= 0)
      val fresh = d.filter(col("doc_id") % 3 === 0)
        .unionByName(old.filter(col("doc_id") % 91 === 1)
          .select((col("doc_id") + 200000L).as("doc_id"), col("text")))
      // localCheckpoint, not persist: the corpus state is consumed twice
      // inside dedupAgainstCorpus, but a bare persist here would leak one
      // cached frame per bench iteration (nothing downstream can
      // unpersist it); the checkpoint's blocks are GC-reclaimed
      Dedup.dedupAgainstCorpus(fresh,
          Dedup.signatureState(old, "doc_id", "text").localCheckpoint(true),
          "doc_id", "text", Tau, maxBucket = 2048)
        .select("doc_id").orderBy("doc_id")
    }),
    // Span-level exact substring dedup (Lee et al. 2021): maximal token
    // spans whose 5-gram content also appears in another doc. Planted
    // full-doc copies (doc_id % 97 at +100000, mirrored verbatim in the
    // oracle) make the span set provably non-empty regardless of the
    // corpus's natural overlap.
    "dedup_substring_spans" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").select("doc_id", "text")
      val aug = d.unionByName(d.filter(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      Dedup.duplicateSpans(aug, "doc_id", "text", k = 5)
        .orderBy("doc_id", "span_start")
    }),
    // Corpus-wide LINE dedup (C4 / RefinedWeb boilerplate removal):
    // non-overlapping 8-token "lines", any line occurring >= 3 times
    // across the corpus drops from every doc; the oracle recomputes every
    // boundary, count, and retained-text digest.
    "dedup_lines" -> ((s, dir) =>
      Dedup.dropBoilerplateLines(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
  )

  def oracle: Map[String, String] = Map(
    "dedup_lines" ->
      """WITH words AS (
        |  SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS w FROM documents),
        |ix AS (
        |  SELECT doc_id, w, unnest(range(0, ((len(w) - 1) // 8) + 1)) AS idx
        |  FROM words WHERE len(w) >= 1),
        |l AS (
        |  SELECT doc_id, idx,
        |    array_to_string(w[idx * 8 + 1 : idx * 8 + 8], ' ') AS line
        |  FROM ix),
        |c AS (SELECT line, count(*) AS c FROM l GROUP BY line),
        |k AS (SELECT doc_id, idx, line, (c >= 3) AS bp FROM l JOIN c USING (line))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(count(*) FILTER (NOT bp) AS BIGINT) AS n_kept,
        |  md5(array_to_string(list_transform(list_sort(
        |    coalesce(list({'i': idx, 'l': line}) FILTER (NOT bp), [])),
        |    x -> x.l), ' ')) AS kept_md5
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_substring_spans" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, text FROM documents
        |  WHERE doc_id % 97 = 0),
        |words AS (
        |  SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS w FROM docs),
        |hs AS (
        |  SELECT doc_id, list_transform(range(1, len(w) - 3),
        |    i -> CAST('0x' || substring(md5(array_to_string(w[i:i+4], ' ')), 1, 15)
        |         AS BIGINT)) AS hl
        |  FROM words WHERE len(w) >= 5),
        |sh AS (
        |  SELECT doc_id, unnest(range(1, len(hl) + 1)) - 1 AS pos, unnest(hl) AS h
        |  FROM hs),
        |dup AS (SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |hits AS (SELECT doc_id, pos FROM sh JOIN dup USING (h)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
        |         OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 5
        |      THEN 1 ELSE 0 END AS brk
        |  FROM hits),
        |isl2 AS (
        |  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM isl)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 4 AS BIGINT) AS span_end,
        |  CAST(max(pos) - min(pos) + 5 AS BIGINT) AS dup_tokens
        |FROM isl2 GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,
    "dedup_exact" ->
      """SELECT doc_id, digest FROM (
        |  SELECT doc_id, md5(text) AS digest,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "dedup_stats" ->
      """SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique,
        |  count(*) - count(DISTINCT md5(text)) AS n_dup_rows
        |FROM documents""".stripMargin,
    "dedup_ngram_pairs" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(regexp_extract_all(text, '[a-z]+')) - 1, 1)),
        |    i -> array_to_string(regexp_extract_all(text, '[a-z]+')[i:i+2], ' '))) AS s
        |  FROM documents WHERE doc_id < 20
        |    AND len(regexp_extract_all(text, '[a-z]+')) >= 3)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  len(list_intersect(a.s, b.s)) * 1.0
        |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |ORDER BY d1, d2""".stripMargin,
    "dedup_minhash" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(regexp_extract_all(text, '[a-z]+')) - 1, 1)),
        |    i -> array_to_string(regexp_extract_all(text, '[a-z]+')[i:i+2], ' '))) AS s
        |  FROM documents WHERE len(regexp_extract_all(text, '[a-z]+')) >= 3),
        |u AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM u GROUP BY 1),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
        |          FROM u a JOIN u b ON a.g = b.g AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT d1, d2, c * 1.0 / (sa.n + sb.n - c) AS jac
        |FROM inter
        |JOIN sizes sa ON d1 = sa.doc_id
        |JOIN sizes sb ON d2 = sb.doc_id
        |WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.75
        |ORDER BY d1, d2""".stripMargin,
    "dedup_levenshtein" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    substring(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 80) AS s
        |  FROM documents WHERE doc_id < 20)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
        |FROM p a JOIN p b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.s, b.s) <= 55
        |ORDER BY d1, d2""".stripMargin,
    "dedup_simhash" ->
      """WITH hs AS (
        |  SELECT doc_id, list_transform(
        |    list_distinct(regexp_extract_all(text, '[a-z]+')),
        |    t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS h
        |  FROM documents),
        |sims AS (
        |  SELECT doc_id, list_sum(list_transform(range(0, 60), j ->
        |    CASE WHEN list_sum(list_transform(h, v ->
        |      CASE WHEN (v >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
        |    THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS sim
        |  FROM hs)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
        |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sim, b.sim)) <= 3
        |ORDER BY d1, d2""".stripMargin,
    "dedup_embedding" ->
      """WITH base AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 50),
        |q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
        |  FROM base),
        |n AS (SELECT vec_id, v, list_dot_product(v, v) AS nn FROM q)
        |SELECT a.vec_id AS d1, b.vec_id AS d2,
        |  list_dot_product(a.v, b.v) / sqrt(a.nn * b.nn) AS cos
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v) / sqrt(a.nn * b.nn) >= 0.8
        |ORDER BY d1, d2""".stripMargin,
    "dedup_clusters" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(regexp_extract_all(text, '[a-z]+')) - 1, 1)),
        |    i -> array_to_string(regexp_extract_all(text, '[a-z]+')[i:i+2], ' '))) AS s
        |  FROM documents WHERE len(regexp_extract_all(text, '[a-z]+')) >= 3),
        |u AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM u GROUP BY 1),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
        |          FROM u a JOIN u b ON a.g = b.g AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT d1, d2 FROM inter
        |          JOIN sizes sa ON d1 = sa.doc_id
        |          JOIN sizes sb ON d2 = sb.doc_id
        |          WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.75),
        |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
        |          UNION SELECT d2, d1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |cmin AS (SELECT a, min(b) AS mn FROM reach GROUP BY a)
        |SELECT d.doc_id,
        |  least(d.doc_id, coalesce(c.mn, d.doc_id)) AS cluster
        |FROM documents d LEFT JOIN cmin c ON d.doc_id = c.a
        |ORDER BY d.doc_id""".stripMargin,
    "dedup_incremental" ->
      """WITH oldd AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        |newd AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 200000 AS doc_id, text FROM oldd WHERE doc_id % 91 = 1),
        |shn AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(regexp_extract_all(text, '[a-z]+')) - 1, 1)),
        |    i -> array_to_string(regexp_extract_all(text, '[a-z]+')[i:i+2], ' '))) AS s
        |  FROM newd WHERE len(regexp_extract_all(text, '[a-z]+')) >= 3),
        |sho AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(regexp_extract_all(text, '[a-z]+')) - 1, 1)),
        |    i -> array_to_string(regexp_extract_all(text, '[a-z]+')[i:i+2], ' '))) AS s
        |  FROM oldd WHERE len(regexp_extract_all(text, '[a-z]+')) >= 3),
        |un AS (SELECT doc_id, unnest(s) AS g FROM shn),
        |uo AS (SELECT doc_id, unnest(s) AS g FROM sho),
        |sn AS (SELECT doc_id, count(*) AS n FROM un GROUP BY 1),
        |so AS (SELECT doc_id, count(*) AS n FROM uo GROUP BY 1),
        |inter AS (SELECT n.doc_id AS nid, o.doc_id AS cid, count(*) AS c
        |          FROM un n JOIN uo o ON n.g = o.g GROUP BY 1, 2),
        |matched AS (
        |  SELECT DISTINCT nid FROM inter
        |  JOIN sn ON nid = sn.doc_id
        |  JOIN so ON cid = so.doc_id
        |  WHERE c * 1.0 / (sn.n + so.n - c) >= 0.75)
        |SELECT doc_id FROM newd
        |WHERE doc_id NOT IN (SELECT nid FROM matched)
        |ORDER BY doc_id""".stripMargin,
    "dedup_keep_best" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(regexp_extract_all(text, '[a-z]+')) - 1, 1)),
        |    i -> array_to_string(regexp_extract_all(text, '[a-z]+')[i:i+2], ' '))) AS s
        |  FROM documents WHERE len(regexp_extract_all(text, '[a-z]+')) >= 3),
        |u AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM u GROUP BY 1),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
        |          FROM u a JOIN u b ON a.g = b.g AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT d1, d2 FROM inter
        |          JOIN sizes sa ON d1 = sa.doc_id
        |          JOIN sizes sb ON d2 = sb.doc_id
        |          WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.75),
        |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
        |          UNION SELECT d2, d1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |cmin AS (SELECT a, min(b) AS mn FROM reach GROUP BY a),
        |clusters AS (
        |  SELECT d.doc_id, d.n_chars,
        |    least(d.doc_id, coalesce(c.mn, d.doc_id)) AS cluster
        |  FROM documents d LEFT JOIN cmin c ON d.doc_id = c.a),
        |ranked AS (
        |  SELECT cluster, doc_id,
        |    count(*) OVER (PARTITION BY cluster) AS members,
        |    row_number() OVER (PARTITION BY cluster
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM clusters)
        |SELECT cluster, doc_id AS keep_doc_id, members
        |FROM ranked WHERE rn = 1 ORDER BY cluster""".stripMargin,
  )
}
