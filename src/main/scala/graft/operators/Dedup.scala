package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextHash, VectorOps}

/**
 * Reusable dedup pipelines — the library API the registered queries (and
 * tests) build on. Each returns a DataFrame; nothing is collected on the
 * driver. See DedupQueries for the 100 TB design notes.
 */
object Dedup {

  /** Exact Jaccard between two distinct-element array columns (intersection
    * computed once — it is the hot kernel of the verify stage). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** Keep-first exact dedup by content digest. Output: idCol, digest. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("digest").orderBy(idCol)
    df.select(col(idCol), md5(col(textCol).cast("binary")).as("digest"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(idCol, "digest")
  }

  /**
   * Candidate pairs (d1 < d2) from an exploded (id, band, bval) table —
   * a bucketed equi-join, never an all-pairs cross join.
   *
   * 100 TB skew guard: a bucket's self-join is O(m²) in its membership m,
   * so one pathological band value (boilerplate families that survive
   * exact dedup) would hand a single task a quadratic pair set. Buckets
   * above `maxBucket` members switch from all-pairs to a STAR — every
   * member paired with the bucket's minimum id — which is O(m) pairs,
   * preserves reachability through the bucket (what downstream
   * connected-components clustering needs), and leaves no member silently
   * uncovered. The tradeoff is pair-level, not cluster-level: within an
   * oversized bucket only member↔representative pairs reach the verify
   * stage, so a member whose similarity to the representative is below
   * tau no longer surfaces its other in-bucket pairs (honest near-dups in
   * ordinary-sized buckets are unaffected). Both window functions share
   * one partitioning, so the sizing adds no extra shuffle over the join's
   * own exchange.
   */
  private val starMetricId = new java.util.concurrent.atomic.AtomicLong()

  private def bucketPairs(banded: DataFrame, idCol: String,
      maxBucket: Int): DataFrame = {
    val w = Window.partitionBy("band", "bval")
    val sized = banded
      .withColumn("bsz", count(lit(1)).over(w))
      .withColumn("rep", min(col(idCol)).over(w))
    val small = sized.filter(col("bsz") <= maxBucket)
      .select(col(idCol), col("band"), col("bval"))
    val smallPairs = small.as("x").join(small.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("d1"), col(s"y.$idCol").as("d2"))
    // The star bound engaging changes pair-level semantics (see scaladoc),
    // so make it observable: a named CollectMetrics on the star branch
    // reports the demoted pair count through QueryExecutionListener /
    // Observation with zero extra jobs. Name is uniquified so a plan that
    // unions several *Pairs calls doesn't collide.
    val starPairs = sized
      .filter(col("bsz") > maxBucket && col(idCol) =!= col("rep"))
      .select(col("rep").as("d1"), col(idCol).as("d2"))
      .observe(s"graft_star_bound_${starMetricId.incrementAndGet()}",
        count(lit(1)).as("star_pairs"))
    smallPairs.union(starPairs).distinct()
  }

  /** id → distinct 3-shingle set (docs with <3 tokens dropped). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.sources.Tables.spread(df)
      .select(col(idCol), TextHash.shingles(col(textCol), 3).as("sh"))
      .filter(size(col("sh")) > 0)

  /**
   * MinHash+LSH near-dup pairs with exact-Jaccard verify stage.
   * Output: d1, d2, jac (only pairs with jac ≥ tau).
   *
   * `maxBucket` scale guard (also on [[simhashPairs]]/[[embeddingPairs]]):
   * band buckets above `maxBucket` members emit only member↔representative
   * pairs (O(m), reachability preserved) instead of all pairs (O(m²)), so
   * inside an oversized bucket a qualifying pair between two
   * non-representative members is NOT emitted — cluster-level results
   * (via [[connectedComponents]]) are unaffected, pair-level output is.
   * Engagement is observable via the `graft_star_bound_*` query metric.
   * Raise `maxBucket` if exhaustive pair enumeration matters more than
   * skew protection.
   *
   * The shingle sets are md5-hashed to 60-bit longs ONCE in the scan
   * stage and shared by both consumers: the signature kernel takes the
   * hashes directly (no second md5 pass), and the verify stage
   * intersects long arrays instead of shipping string shingles through
   * the pair join — same jaccard (shingles are distinct per doc; a
   * 60-bit collision within one pair's union is ~1e-14), ~8× less
   * verify-shuffle volume, half the md5 work. Only hashed columns are
   * persisted, so the cache is compact too.
   */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String, tau: Double,
      k: Int = 128, bands: Int = 32, r: Int = 4,
      maxBucket: Int = 1024): DataFrame = {
    // cached: referenced by the band explode AND both verify-join sides
    val docs = shingleSets(df, idCol, textCol)
      .select(col(idCol), transform(col("sh"), g => TextHash.hash60(g)).as("shh"))
      .withColumn("sig", TextHash.minhashSignatureFromHashes(col("shh"), k))
      .persist()
    val banded = docs
      .select(col(idCol), explode(TextHash.lshBands(col("sig"), bands, r)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bval").as("bval"))
    val pairs = bucketPairs(banded, idCol, maxBucket)
    val left = docs.select(col(idCol).as("d1"), col("shh").as("sh1"))
    val right = docs.select(col(idCol).as("d2"), col("shh").as("sh2"))
    pairs.join(left, "d1").join(right, "d2")
      .select(col("d1"), col("d2"), jaccard(col("sh1"), col("sh2")).as("jac"))
      .filter(col("jac") >= tau)
  }

  /** Per-doc MinHash signatures (for estimation / tests). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int = 128): DataFrame =
    shingleSets(df, idCol, textCol)
      .select(col(idCol), TextHash.minhashSignature(col("sh"), k).as("sig"))

  /**
   * Per-doc minhash STATE for incremental dedup: (idCol, shh, sig) —
   * hashed shingle set (verify-stage input) + minhash signature
   * (candidate-stage input). This is what an ingestion pipeline persists
   * to a signature table (e.g. a catalog table with array<long> columns)
   * so later batches dedup against the corpus WITHOUT re-reading its
   * text. Docs under 3 tokens have no shingles and carry no state — they
   * can never near-dup-match anything.
   */
  def signatureState(df: DataFrame, idCol: String, textCol: String,
      k: Int = 128): DataFrame =
    shingleSets(df, idCol, textCol)
      .select(col(idCol), transform(col("sh"), g => TextHash.hash60(g)).as("shh"))
      .withColumn("sig", TextHash.minhashSignatureFromHashes(col("shh"), k))

  /**
   * Incremental near-dedup: drop from `newDf` every doc that is a
   * near-duplicate (exact shingle Jaccard ≥ tau among LSH candidates) of
   * a doc in an ALREADY-PROCESSED corpus represented only by its
   * persisted [[signatureState]]. The 100 TB ingestion pattern: the
   * corpus text is never re-scanned — each arriving batch pays
   * O(batch text) + a banded equi-join against the signature table, and
   * appends its own survivors' state for the next batch.
   *
   * Topology: both sides band their signatures (scan-stage expression
   * work); candidates come from a (band, bval) equi-join where the
   * corpus side ships only (id, band, bval) hash rows; verification
   * joins hashed shingle arrays for the CANDIDATES only. Corpus band
   * buckets over `maxBucket` members are represented by their min-id
   * member (the [[minhashPairs]] star-bound contract: bounded tasks, at
   * the price that an oversized bucket's non-representative members no
   * longer surface as partners — raise `maxBucket` when exhaustive
   * matching matters more than skew protection).
   *
   * Returns the surviving `newDf` rows with their original columns.
   * Batch-INTERNAL duplicates are deliberately kept — dedup within a
   * batch is [[minhashPairs]]/[[exact]]'s job before appending state.
   */
  def dedupAgainstCorpus(newDf: DataFrame, corpusState: DataFrame,
      idCol: String, textCol: String, tau: Double,
      bands: Int = 32, r: Int = 4, maxBucket: Int = 1024): DataFrame = {
    // Cache scope is OWNED here: `st` feeds two joins below, but leaking
    // its cache to the caller would pin one DataFrame per micro-batch for
    // a stream's lifetime (streamDedupAppend calls this once per batch).
    // The matched-id set — delta-sized, ids only — is materialized
    // eagerly at the end so `st` can be unpersisted before returning.
    val st = signatureState(newDf, idCol, textCol).persist()
    def banded(state: DataFrame, as: String) = state
      .select(col(idCol).as(as),
        explode(TextHash.lshBands(col("sig"), bands, r)).as("bb"))
      .select(col(as), col("bb.band").as("band"), col("bb.bval").as("bval"))
    val w = Window.partitionBy("band", "bval")
    val corpusBands = banded(corpusState, "cid")
      .withColumn("bsz", count(lit(1)).over(w))
      .withColumn("rep", min(col("cid")).over(w))
      .filter(col("bsz") <= maxBucket || col("cid") === col("rep"))
      .select("cid", "band", "bval")
    val cand = banded(st, "nid").join(corpusBands, Seq("band", "bval"))
      .select("nid", "cid").distinct()
    val matched = cand
      .join(st.select(col(idCol).as("nid"), col("shh").as("sh1")), "nid")
      .join(corpusState.select(col(idCol).as("cid"), col("shh").as("sh2")), "cid")
      .filter(jaccard(col("sh1"), col("sh2")) >= tau)
      .select("nid").distinct()
      // eager local checkpoint: everything `st` feeds is materialized
      // here (blocks are id-only and reclaimed by the context cleaner
      // when this frame is GC'd), so the batch-text cache can be
      // released deterministically instead of leaking per batch
      .localCheckpoint(true)
    st.unpersist()
    newDf.join(matched, newDf(idCol) === matched("nid"), "left_anti")
  }

  /**
   * SimHash near-dup pairs: exact for hamming ≤ bands-1 (pigeonhole).
   * Output: d1, d2, hamming.
   *
   * Candidate generation runs over DISTINCT simhash values, not
   * documents: identical docs (boilerplate families — the dominant mass
   * of a scraped corpus) collapse to ONE node before banding, so a
   * degenerate band value shared by a 100k-member family costs one
   * bucket row instead of an O(m²) self-join (measured 5× on a 10×
   * corpus whose buckets crossed ~6k members). Three legs:
   *
   *  - intra-family (hamming 0): all pairs within a family of ≤
   *    `maxBucket` members; larger families emit member↔representative
   *    stars (the [[minhashPairs]] `maxBucket` contract, applied to
   *    family size);
   *  - cross-family: band the distinct sims, candidate (sim1, sim2)
   *    pairs verified by one `bit_count(xor)` on the 60-bit values
   *    BEFORE any expansion (star bound engages only when > `maxBucket`
   *    DISTINCT values share a band — genuinely adversarial data);
   *  - expansion: verified sim pairs join back to members; output size
   *    is the true qualifying-pair count, which this operator cannot
   *    reduce.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4, bits: Int = 15,
      maxBucket: Int = 1024): DataFrame = {
    require(maxHamming <= bands - 1, "banding only exhaustive for radius ≤ bands-1")
    val sims = df.select(col(idCol),
      TextHash.simhash60(TextHash.tokenHashes(col(textCol))).as("sim"))
      .persist() // referenced by the family rollup and both expansion sides
    val fams = sims.groupBy("sim")
      .agg(min(col(idCol)).as("rep"), count(lit(1)).as("fsz"))
      .persist() // referenced by the intra legs and the distinct banding
    val members = sims.join(fams, "sim")
    val smallFam = members.filter(col("fsz") <= maxBucket)
      .select(col(idCol), col("sim"))
    val intraSmall = smallFam.as("x").join(smallFam.as("y"),
        col("x.sim") === col("y.sim") && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("d1"), col(s"y.$idCol").as("d2"),
        lit(0).as("hamming"))
    val intraStar = members
      .filter(col("fsz") > maxBucket && col(idCol) =!= col("rep"))
      .select(col("rep").as("d1"), col(idCol).as("d2"), lit(0).as("hamming"))
    val banded = fams
      .select(col("sim"), explode(TextHash.simhashBands(col("sim"), bands, bits)).as("bb"))
      .select(col("sim"), col("bb.band").as("band"), col("bb.bval").as("bval"))
    val simPairs = bucketPairs(banded, "sim", maxBucket)
      .select(col("d1").as("sim1"), col("d2").as("sim2"),
        bit_count(col("d1").bitwiseXOR(col("d2"))).as("hamming"))
      .filter(col("hamming") > 0 && col("hamming") <= maxHamming)
    val cross = simPairs
      .join(sims.select(col("sim").as("sim1"), col(idCol).as("i1")), "sim1")
      .join(sims.select(col("sim").as("sim2"), col(idCol).as("i2")), "sim2")
      .select(least(col("i1"), col("i2")).as("d1"),
        greatest(col("i1"), col("i2")).as("d2"), col("hamming"))
    intraSmall.unionByName(intraStar).unionByName(cross)
  }

  /**
   * Embedding-cosine near-dup pairs via hyperplane-sign LSH + exact
   * quantized-cosine verify. Output: d1, d2, cos (cos ≥ tau).
   *
   * Recall bound: a pair at cosine c shares one b-bit band with probability
   * (1-acos(c)/π)^b, so the miss probability is (1-(1-acos(c)/π)^b)^bands.
   * Bands must be NARROW-AND-MANY (high bits, high bands), not few-and-wide:
   * at 16 bits a band match is ~24× more likely for a pair at c=0.9 than at
   * c=0.5 (0.084 vs 0.0035), so candidate sets stay near-empty on ordinary
   * corpora (the observed all-pairs max here is c≈0.6), while wide 4-8-bit
   * buckets admit O(n²/2^bits) moderately-similar pairs and degenerate
   * toward the all-pairs join this operator exists to avoid.
   *
   * At the default 128 bands × 16 bits the miss probability is ≈ 1.4e-5
   * for c ≥ 0.9 (and ≈ 3% at exactly c = 0.8). Data contract for
   * oracle-exact parity (mirroring the minhash Tau gap): planted near-dups
   * must sit well above tau — ≥ 0.9 for tau = 0.8 — with the band between
   * tau and the plant empty; boundary pairs at exactly tau carry the ~3%
   * bound instead.
   *
   * Additional contract: the embedding column must be fixed-dimension.
   * The LSH kernel's ragged-corpus check is best-effort PER TASK
   * (NativeExpressions.HyperplaneSignBands.planesFor) — dimensions
   * segregated by partition sign against unrelated plane sets and yield
   * zero cross-dim candidates without an error. Oversized band buckets
   * follow the `maxBucket` star-bound contract of [[minhashPairs]].
   */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String, tau: Double,
      bands: Int = 128, bits: Int = 16, maxBucket: Int = 1024): DataFrame = {
    val q = df.select(col(idCol), VectorOps.quantize(col(vecCol)).as("qv"))
      .withColumn("nn", VectorOps.qdot(col("qv"), col("qv")))
      .persist() // referenced by band explode and both join sides
    val banded = q
      .select(col(idCol),
        posexplode(VectorOps.lshSignBands(col("qv"), bands, bits)).as(Seq("band", "bval")))
    val pairs = bucketPairs(banded, idCol, maxBucket)
    val v1 = q.select(col(idCol).as("d1"), col("qv").as("qv1"), col("nn").as("nn1"))
    val v2 = q.select(col(idCol).as("d2"), col("qv").as("qv2"), col("nn").as("nn2"))
    pairs.join(v1, "d1").join(v2, "d2")
      .select(col("d1"), col("d2"),
        VectorOps.qcosine(VectorOps.qdot(col("qv1"), col("qv2")),
          col("nn1"), col("nn2")).as("cos"))
      .filter(col("cos") >= tau)
  }

  /**
   * Connected components over near-dup pairs: every document gets the
   * minimum doc id reachable through the pair graph (its cluster id) —
   * the transitive-closure step a keep-one-per-cluster dedup needs, since
   * near-duplicate similarity is not transitive (A~B, B~C, A≁C must still
   * collapse to one cluster).
   *
   * Alternating large-star / small-star (Kiveris et al., "Connected
   * Components in MapReduce and Beyond", 2014): each round rewires every
   * node toward the minimum of its neighborhood, halving component
   * diameters — O(log n) rounds even on adversarial chain graphs, where
   * plain min-label propagation needs diameter rounds. Each round is two
   * bounded groupBy+join shuffles over the current edge set (which only
   * shrinks toward one star edge per non-root node — never grows), with
   * per-round persist/unpersist so lineage stays O(1) deep. Convergence
   * is an exact edge-set fingerprint (count + order-independent hash
   * sum), one tiny aggregate per round.
   *
   * Singletons (the overwhelming majority of a near-dup corpus) never
   * enter the edge rounds: they join the star labels once at the end.
   *
   * @param nodes  one row per document (only `idCol` is read)
   * @param pairs  undirected near-dup pairs (columns d1, d2)
   * @return idCol, cluster (min reachable id; singletons keep their own id)
   */
  /**
   * Exact duplicate-SUBSTRING detection — the span-level dedup of Lee et
   * al. 2021 ("Deduplicating Training Data Makes Language Models Better",
   * arXiv:2107.06499): find every maximal token span whose k-gram content
   * also appears in ANOTHER document, so a pipeline can cut boilerplate
   * spans out of otherwise-unique documents instead of dropping whole
   * near-dup docs. The paper builds a corpus-wide suffix array; the
   * distributed shape here reaches the same spans for ≥k-token repeats
   * with shuffles bounded by token count:
   *
   *  1. positional k-gram shingles per doc (array work in the scan
   *     stage, zero shuffle) — a ≥k-token repeat is exactly a run of
   *     ≥1 shared k-grams;
   *  2. 60-bit md5 hashes of the shingles, so the corpus-wide
   *     duplicate-count shuffle moves 8-byte keys, never text;
   *  3. duplicated-hash set = hashes seen in ≥2 DISTINCT docs (two-phase
   *     aggregate, map-side partial) joined back to the positions;
   *  4. gaps-and-islands per doc: overlapping/adjacent duplicated
   *     k-gram starts merge into maximal spans (one window over the
   *     doc's own hits — state is O(doc), the partition key is doc id).
   *
   * Output: (id, span_start, span_end, dup_tokens) per maximal span,
   * word-index bounds inclusive. Cross-doc only (a phrase repeated
   * WITHIN one doc does not mark it); k is the MinHash shingle width by
   * default so "duplicate" means the same thing across the dedup family.
   */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sh = df
      .select(col(idCol), TextHash.tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= k)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, size(__w) - $k), " +
          s"i -> array_join(slice(__w, i + 1, $k), ' '))")).as(Seq("pos", "g")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        TextHash.hash60(col("g")).as("h"))
    val dup = sh.groupBy("h")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= 2).select("h")
    val hits = sh.join(dup, "h").select(col(idCol), col("pos"))
    val byDoc = Window.partitionBy(idCol).orderBy("pos")
    // spans [pos, pos+k-1]: a start merges into the previous island when
    // it overlaps or touches it (pos <= prev + k); equal-width spans in
    // sorted order make the previous start the running max end
    hits
      .withColumn("__brk", when(lag("pos", 1).over(byDoc).isNull ||
        col("pos") > lag("pos", 1).over(byDoc) + k, 1L).otherwise(0L))
      .withColumn("__isl", sum("__brk").over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__isl"))
      .agg(min("pos").as("span_start"), (max("pos") + (k - 1)).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("dup_tokens"))
  }

  /**
   * Corpus-wide LINE dedup (C4's "discard any line seen three or more
   * times in the dataset" / RefinedWeb boilerplate removal), with a
   * "line" generalized to a non-overlapping `lineTokens`-token window
   * (this corpus carries no newlines): every line whose TOTAL occurrence
   * count across the corpus reaches `minCount` is boilerplate — nav
   * bars, footers, license blurbs — and is dropped from EVERY document.
   *
   * Output per doc: (idCol, n_lines, n_kept, kept_md5) — the retained
   * text rebuilt in original line order and fingerprinted, so the
   * cleaned corpus is checkable without shipping the text.
   *
   * Scale shape: line extraction is scan-stage array work; the
   * boilerplate set is one two-phase count aggregate keyed on the line
   * (map-side partials, so the shuffle moves (line, count) pairs per
   * partition, not occurrences); membership is a left join on the same
   * key; the per-doc rebuild is one further key shuffle. No stage holds
   * more than one document's lines in task memory.
   */
  def dropBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      lineTokens: Int = 8, minCount: Long = 3L): DataFrame = {
    require(lineTokens >= 1, s"lineTokens must be >= 1, got $lineTokens")
    val n = lineTokens
    val lines = df
      .select(col(idCol), TextHash.tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 1)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, (size(__w) - 1) div $n), " +
          s"i -> array_join(slice(__w, i * $n + 1, $n), ' '))"))
        .as(Seq("idx", "line")))
    val boiler = lines.groupBy("line").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount)
      .select(col("line"), lit(true).as("__bp"))
    lines.join(boiler, Seq("line"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("__bp").isNull, 1)).as("n_kept"),
        expr("md5(cast(array_join(transform(array_sort(" +
          "collect_list(CASE WHEN __bp IS NULL THEN struct(idx, line) END)), " +
          "x -> x.line), ' ') AS binary))").as("kept_md5"))
  }

  def connectedComponents(nodes: DataFrame, idCol: String, pairs: DataFrame,
      maxIters: Int = 25): DataFrame = {
    // large-star: for each node u, attach every LARGER neighbor to
    // min(Γ(u) ∪ {u}); small-star: orient edges large→small and attach
    // each node's smaller neighbors (and itself) to its minimum neighbor.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy("a").agg(min("b").as("mb"))
        .select(col("a"), least(col("a"), col("mb")).as("m"))
      sym.join(mins, "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      val mins = or.groupBy("a").agg(min("b").as("m"))
      val joined = or.join(mins, "a")
      joined.select(col("b").as("a"), col("m").as("b"))
        .union(joined.select(col("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
        .distinct()
    }
    // order-independent exact fingerprint: count + XOR of per-edge hashes
    // (edges are distinct, so XOR never self-cancels; no overflow under ANSI)
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("a"), col("b")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // Eager checkpoint every round, not persist: each round's plan embeds
    // the previous round's several times (the two star joins reference
    // their input repeatedly), so lineage — and the plan STRING Spark
    // renders per action — grows exponentially and OOMs after a few
    // un-truncated rounds. Truncating to the materialized result keeps
    // every round's plan O(1). The strategy follows the session's
    // checkpoint configuration: with spark.sparkContext.setCheckpointDir
    // set, rounds land as RELIABLE checkpoints (executor loss survivable
    // — the multi-executor deployment mode); without one, eager
    // localCheckpoint (fastest, and the only option in local mode without
    // a shared filesystem). Superseded rounds are freed by the
    // ContextCleaner once unreferenced.
    //
    // r18: the checkpoint is LAZY and the convergence FINGERPRINT is the
    // action that materializes it — its full aggregate computes every
    // partition, storing the checkpoint blocks as a side effect. One job
    // per round instead of two (eager-materialize + fingerprint); at
    // small deltas the two job launches, not the star joins, dominated
    // wall time.
    def materializeWithSig(df: DataFrame): (DataFrame, (Long, Long)) = {
      val out =
        if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
          df.checkpoint(eager = false)
        else df.localCheckpoint(eager = false)
      (out, fingerprint(out))
    }
    var (edges, sig) = materializeWithSig(
      pairs.select(col("d1").as("a"), col("d2").as("b"))
        .filter(col("a") =!= col("b")).distinct())
    var iter = 0
    // the fingerprint already carries the exact edge count — no separate
    // isEmpty job
    var converged = sig._1 == 0L
    while (!converged && iter < maxIters) {
      val (next, nextSig) = materializeWithSig(smallStar(largeStar(edges)))
      edges = next
      converged = nextSig == sig
      sig = nextSig
      iter += 1
    }
    require(converged, s"star contraction did not converge in $maxIters rounds")
    // Fixed point is a star forest: every non-root points at its
    // component minimum; roots (and singletons) label themselves.
    nodes.select(col(idCol))
      .join(edges.select(col("a").as(idCol), col("b").as("lbl")), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("lbl"), col(idCol)).as("cluster"))
  }
}
