package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextHash
import graft.sources.Tables

/**
 * Text-analysis pack for LLM data pipelines: token statistics, quality
 * scoring, stopword-profile language scoring, and document fingerprinting
 * (normalized digest + winnowing). All per-row expression work — zero
 * shuffles besides the final presentation sort; at 100 TB these run in the
 * scan stage at full parallelism.
 *
 * Everything is oracle-checked in DuckDB: regex counts are integers,
 * ratios are single IEEE divisions of integers, winnowing hashes are
 * md5-derived (portable bit-for-bit).
 */
object TextQueries {

  private def nTokens(c: Column): Column = regexp_count(c, lit("\\S+"))

  /** Count standalone words from `words` (alternation inside \b...\b). */
  private def stopCount(c: Column, words: Seq[String]): Column =
    regexp_count(c, lit("\\b(" + words.mkString("|") + ")\\b"))

  private val stopwords = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "los", "de", "que", "y", "una"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"),
    "zh" -> Seq("de", "shi", "bu", "zai", "le"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val toks = TextHash.tokens(d("text"))
      d.select(
          d("doc_id"),
          nTokens(d("text")).as("n_tokens"),
          size(array_distinct(toks)).as("n_types"),
          (size(array_distinct(toks)).cast("double") /
            greatest(nTokens(d("text")), lit(1))).as("type_token_ratio"),
          length(d("text")).as("n_chars_measured"),
          (length(d("text")) === d("n_chars")).as("n_chars_consistent"),
          // BPE-style pre-tokenizer count: letter runs / digit runs /
          // punctuation runs, each with optional leading space
          regexp_count(d("text"),
            lit(" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+")).as("n_bpeish"))
        .orderBy("doc_id")
    }),
    // Corpus-familiarity quality signal (the CCNet/Gopher-style "is this
    // doc made of words the corpus knows" filter, without the LM): per
    // doc, the mean corpus frequency of its tokens and the share of
    // rare (corpus count ≤ 2) tokens. The aggregation core is ALL
    // integer (sum of corpus counts, rare-token count) — exact under
    // any partitioning and summation order, so it oracle-hashes across
    // engines; the two divisions happen once per output row. Shape:
    // scan-stage token explode → shuffle join on token against the
    // vocab-sized count table → one groupBy(doc_id). Two shuffles, all
    // codegen — at 100 TB the count table is vocabulary-sized, and AQE
    // broadcasts it when small.
    "text_familiarity" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val tok = d.select(d("doc_id"),
        explode(regexp_extract_all(lower(d("text")), lit("[a-z]+"), lit(0))).as("t"))
      val cnts = tok.groupBy("t").agg(count(lit(1)).as("c"))
      tok.join(cnts, "t")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_toks"),
          sum(col("c")).as("familiarity_sum"),
          sum(when(col("c") <= 2, 1L).otherwise(0L)).as("rare_toks"),
          (sum(col("c")).cast("double") / count(lit(1))).as("familiarity"),
          (sum(when(col("c") <= 2, 1L).otherwise(0L)).cast("double") /
            count(lit(1))).as("rare_ratio"))
        .orderBy("doc_id")
    }),
    // Sequence packing for training-data prep: assign docs to fixed
    // token-budget packs (8192 here), greedily in doc_id order WITHIN a
    // hash shard — the deterministic, distributed form of the packing
    // step (a single global running sum would serialize 100 TB through
    // one partition; per-shard windows keep every shard independent and
    // reuse one shuffle). pack_id = prior-tokens-in-shard div budget:
    // pure integer arithmetic over a running sum, so exact everywhere.
    "pipeline_pack_sequences" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val nt = nTokens(d("text")).cast("long")
      d.select(d("doc_id"), (d("doc_id") % 32).as("shard"), nt.as("n_tokens"))
        .withColumn("pack_id",
          expr("(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) div 8192"))
        .orderBy("doc_id")
    }),
    // Deterministic corpus shuffle + token-balanced contiguous shards —
    // the training-data EXPORT step: reproducible epoch-order
    // randomization (shuffle key = seeded hash of the doc id) and shard
    // boundaries from the GLOBAL running token sum in shuffle order, so
    // N parallel loaders each get ~equal token mass. The global cumsum
    // runs in TWO distributed phases — range-partition by key, one
    // per-partition window, O(partitions) prefix offsets broadcast back —
    // because a single global window would serialize 100 TB through one
    // task. The checkpoint pins the partition layout so the totals pass
    // and the cumsum pass see identical pids.
    "pipeline_shuffle_shards" -> ((s, dir) => {
      val nShards = 16L
      val d = Tables(s, dir, "documents")
      val nt = nTokens(d("text")).cast("long")
      val base = d.select(d("doc_id"),
          TextHash.hash60(concat_ws(":", lit("42"),
            d("doc_id").cast("string"))).as("skey"),
          nt.as("n_tokens"))
        .repartitionByRange(8, col("skey"), col("doc_id"))
        .sortWithinPartitions("skey", "doc_id")
        .withColumn("pid", spark_partition_id())
        .localCheckpoint(true)
      val parts = base.groupBy("pid").agg(sum("n_tokens").as("pt"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val total = parts.values.sum
      val shardSize = (total + nShards - 1) / nShards
      val offsets = (0 to parts.keys.maxOption.getOrElse(0))
        .scanLeft(0L)((acc, p) => acc + parts.getOrElse(p, 0L)).dropRight(1)
      val offDf = s.createDataFrame(
        offsets.zipWithIndex.map { case (off, p) => (p, off) })
        .toDF("pid", "poff")
      base.join(broadcast(offDf), "pid")
        .withColumn("cum_before", col("poff") + expr(
          "sum(n_tokens) OVER (PARTITION BY pid ORDER BY skey, doc_id " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)") -
          col("n_tokens"))
        .select(col("doc_id"), col("n_tokens"),
          expr(s"cum_before div $shardSize").as("shard"),
          col("cum_before").as("offset_in_epoch"))
        .orderBy("doc_id")
    }),
    // Hashed linear quality classifier — the fastText-shape inference
    // path: tokens hash into 4096 feature buckets, each bucket carries a
    // weight (deterministic arithmetic stand-ins here; a trained model
    // drops its weight table into the same expression), the doc's score
    // is the weight sum and `keep` its sign. The WHOLE forward pass is a
    // higher-order array expression in the scan stage — zero shuffles,
    // zero UDFs, zero joins: model inference at 100 TB costs exactly one
    // pass over the text. Integer-exact (weights bounded ±4096, sums
    // < 2^53); one IEEE divide for the normalized score.
    "text_quality_classifier" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      def w(t: Column): Column =
        (TextHash.hash60(t) % 4096L) * 2654435761L % 8192L - 4096L
      val toks = TextHash.tokens(d("text"))
      val score = aggregate(transform(toks, t => w(t)), lit(0L), (a, b) => a + b)
      val nt = size(toks)
      d.select(col("doc_id"), score.as("score"),
          nt.cast("long").as("n_tokens"),
          (score.cast("double") / greatest(nt, lit(1))).as("norm_score"),
          (score > 0).as("keep"))
        .orderBy("doc_id")
    }),
    // Document chunking (RAG / pretraining prep): fixed 64-token windows
    // with 8-token overlap, last chunk truncated — all scan-stage array
    // arithmetic (start = i·stride, sequence bound = how many strides fit
    // before the tail is already covered), zero shuffle before the final
    // order. Chunk text is emitted as an md5 so the row stays small; the
    // oracle recomputes every boundary AND digest from the same token
    // array.
    "pipeline_chunk_documents" -> ((s, dir) => {
      val cs = 64; val ov = 8; val st = cs - ov
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"), TextHash.tokens(d("text")).as("w"))
        .filter(size(col("w")) >= 1)
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, greatest((size(w) - $ov - 1) div $st, 0)), " +
            s"i -> struct(i * $st AS s, least($cs, size(w) - i * $st) AS l, " +
            s"md5(array_join(slice(w, i * $st + 1, " +
            s"least($cs, size(w) - i * $st)), ' ')) AS h))"))
          .as(Seq("chunk_idx", "c")))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("c.s").cast("long").as("start_tok"),
          col("c.l").cast("long").as("n_tokens_chunk"),
          col("c.h").as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    }),
    // Bigram-LM familiarity (perplexity proxy without floats in the hot
    // path): per doc, the ratio of corpus bigram occurrences to corpus
    // first-token occurrences over its adjacent token pairs — the
    // conditional-frequency analog of text_familiarity's unigram score.
    // Integer sums are exact under any partitioning; ONE IEEE divide at
    // the end keeps cross-engine hash parity. Shapes: positional bigram
    // explode (scan stage) → two count joins → per-doc aggregate; the
    // count tables are two-phase aggregates, so the corpus-wide shuffles
    // move (gram, count) pairs.
    "text_bigram_lm" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val base = d.select(col("doc_id"), TextHash.tokens(d("text")).as("w"))
        .filter(size(col("w")) >= 2)
      val bg = base.select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), " +
          "i -> array_join(slice(w, i + 1, 2), ' '))")).as("g"))
      val bgc = bg.groupBy("g").agg(count(lit(1)).as("cbg"))
      val tok = d.select(explode(TextHash.tokens(d("text"))).as("t"))
      val tc = tok.groupBy("t").agg(count(lit(1)).as("ct"))
      bg.join(bgc, "g")
        .join(tc, substring_index(col("g"), " ", 1) === col("t"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum("cbg").as("bigram_hits"),
          sum("ct").as("unigram_hits"),
          (sum("cbg").cast("double") / sum("ct")).as("lm_score"))
        .orderBy("doc_id")
    }),
    // Domain mixing under token budgets (the DoReMi/Pile-style mixture
    // step): each source contributes docs in deterministic doc_id order
    // until its token budget is exhausted — a per-source exclusive
    // running sum compared to the source's budget. One shuffle keyed by
    // source; every source's selection is independent, so 100 TB with
    // thousands of sources parallelizes per source (a skewed giant
    // source is one partition — shard its window like pack_sequences if
    // that ever binds). Budgets here: even-numbered sources 600 tokens,
    // odd 300 — a 2:1 mixture recipe.
    "pipeline_mix_sources" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val nt = nTokens(d("text")).cast("long")
      val budget = when(
        substring(col("source"), 4, 10).cast("int") % 2 === 0, 600L)
        .otherwise(300L)
      d.select(d("doc_id"), d("source"), nt.as("n_tokens"))
        .withColumn("cum_before",
          expr("sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)") - col("n_tokens"))
        .filter(col("cum_before") < budget)
        .select("doc_id", "source", "n_tokens")
        .orderBy("doc_id")
    }),
    // Gopher-style duplicate-n-gram signal: the share of a doc's
    // distinct 3-grams that appear in at least one OTHER doc —
    // boilerplate and template pages score high, original prose low.
    // Same exact-integer skeleton as text_familiarity, one level up:
    // shingle explode (distinct per doc, so a per-shingle row count IS
    // its distinct-doc count) → shuffle join on shingle → per-doc
    // aggregate. The shingle construction is the dedup_ngram_pairs one,
    // so cross-engine parity is already proven by that oracle.
    "text_shared_ngrams" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val sh = d.select(d("doc_id"),
        explode(TextHash.shingles(d("text"), 3)).as("g"))
      val docsPer = sh.groupBy("g").agg(count(lit(1)).as("ndocs"))
      sh.join(docsPer, "g")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_ngrams"),
          sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("shared_ngrams"),
          (sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).cast("double") /
            count(lit(1))).as("shared_ratio"))
        .orderBy("doc_id")
    }),
    // The Gopher quality-rule battery (Rae et al. 2021, arXiv:2112.11446
    // §A1.1): word-count bounds, mean-word-length bounds, symbol-to-word
    // ratio, alphabetic-word fraction, minimum distinct stopwords — each
    // rule in INTEGER form (3·n ≤ chars ≤ 10·n instead of a float mean),
    // so the keep flag is exact under any partitioning. One scan-stage
    // pass, zero shuffles before the final order — filtering 100 TB is
    // one pass over the text.
    "text_gopher_rules" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val t = d("text")
      val toks = regexp_extract_all(t, lit("\\S+"), lit(0))
      val nw = size(toks).cast("long")
      val wc = length(regexp_replace(t, lit("\\s"), lit(""))).cast("long")
      val sym = regexp_count(t, lit("[^a-z\\s]")).cast("long")
      val aw = size(filter(toks, w => w.rlike("[a-z]"))).cast("long")
      val sh = size(array_intersect(array_distinct(toks),
        array(lit("the"), lit("a"), lit("of"), lit("and"), lit("to"))))
        .cast("long")
      d.select(d("doc_id"),
          nw.as("n_words"), wc.as("word_chars"), sym.as("symbol_chars"),
          aw.as("alpha_words"), sh.as("stop_hits"),
          (nw >= 50 && nw <= 100000 &&
            wc >= nw * 3 && wc <= nw * 10 &&
            sym * 10 <= nw &&
            aw * 5 >= nw * 4 &&
            sh >= 2).as("keep"))
        .orderBy("doc_id")
    }),
    "text_quality" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val t = d("text")
      val nt = nTokens(t)
      val stops = stopCount(t, stopwords("en"))
      d.select(
          d("doc_id"),
          nt.as("n_tokens"),
          (regexp_count(t, lit("[.,;:!?]")).cast("double") / length(t)).as("punct_ratio"),
          (regexp_count(t, lit("[A-Z]")).cast("double") / length(t)).as("upper_ratio"),
          (stops.cast("double") / greatest(nt, lit(1))).as("stop_ratio"),
          when(nt < 30, "short")
            .when(stops.cast("double") / greatest(nt, lit(1)) > 0.02, "good")
            .otherwise("low_stop").as("quality"))
        .orderBy("doc_id")
    }),
    // Stopword-profile language scores + argmax (fixed tie-break order).
    "text_langid" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val t = lower(d("text"))
      val scores = Seq("en", "de", "es", "fr", "zh").map(l =>
        stopCount(t, stopwords(l)).as(s"s_$l"))
      val withScores = d.select((d("doc_id") +: scores): _*)
      withScores.withColumn("pred",
          when(col("s_en") >= greatest(col("s_de"), col("s_es"), col("s_fr"), col("s_zh")), "en")
            .when(col("s_de") >= greatest(col("s_es"), col("s_fr"), col("s_zh")), "de")
            .when(col("s_es") >= greatest(col("s_fr"), col("s_zh")), "es")
            .when(col("s_fr") >= col("s_zh"), "fr")
            .otherwise("zh"))
        .orderBy("doc_id")
    }),
    "text_fingerprint" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val norm = trim(regexp_replace(lower(d("text")), "\\s+", " "))
      d.select(d("doc_id"), md5(norm.cast("binary")).as("fp"))
        .orderBy("doc_id")
    }),
    // Winnowing (Schleimer et al.): k=5 char-gram hashes, min per w=4
    // window, distinct selected fingerprints — the standard local-fingerprint
    // scheme for plagiarism/near-dup detection, here summarized per doc.
    "text_winnow" -> ((s, dir) => {
      val k = 5
      val w = 4
      val d = Tables(s, dir, "documents")
      val norm = trim(regexp_replace(lower(d("text")), "\\s+", " "))
      val base = graft.sources.Tables.spread(d).select(d("doc_id"), norm.as("s"))
        .filter(length(col("s")) >= k + w - 1)
      val grams = transform(sequence(lit(1), length(col("s")) - (k - 1)),
        i => TextHash.hash60(col("s").substr(i, lit(k))))
      val withG = base.select(col("doc_id"), grams.as("h"))
      // native sliding-window minimum (monotone deque) — the interpreted
      // slice+array_min form allocates O(n·w) arrays per doc
      val fps = graft.plans.kernels.slidingMin(col("h"), w)
      withG.select(col("doc_id"), array_distinct(fps).as("fps"))
        .select(
          col("doc_id"),
          size(col("fps")).as("n_fp"),
          array_min(col("fps")).as("fp_min"),
          array_max(col("fps")).as("fp_max"))
        .orderBy("doc_id")
    }),
    // Corpus statistics: top terms by document frequency. explode → agg
    // has map-side partial aggregation, so the shuffle carries one row per
    // (partition, term), not per token occurrence.
    "text_top_terms" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      d.select(d("doc_id"), explode(array_distinct(TextHash.tokens(d("text")))).as("term"))
        .groupBy("term")
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("term").asc)
        .limit(25)
    }),
    // Document length histogram (fixed 100-char buckets, capped at 9).
    "text_length_hist" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      d.select(least(floor(d("n_chars") / 100), lit(9)).cast("int").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("bucket")
    }),
    // Normalization pass: lowercase, strip non-alphanumerics, collapse
    // whitespace — the canonical pre-dedup cleanup.
    "text_normalize" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val norm = trim(regexp_replace(
        regexp_replace(lower(d("text")), "[^a-z0-9 ]", " "), " +", " "))
      d.select(d("doc_id"), norm.as("norm_text"), length(norm).as("norm_len"))
        .orderBy("doc_id")
    }),
    // Gopher-style repetition stats: duplicate-token fraction, top-token
    // fraction, top-bigram fraction. explode → two-level aggregation keeps
    // the shuffle at one row per (doc, term), with map-side partial agg —
    // never a per-doc O(n²) lambda re-evaluation.
    "text_repetition" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val base = d.select(d("doc_id"), TextHash.tokens(d("text")).as("toks"))
        .filter(size(col("toks")) > 0)
      val tokAgg = base.select(col("doc_id"), explode(col("toks")).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"), max("c").as("top_tok"))
      val bigrams = transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1)))
      val biAgg = base.filter(size(col("toks")) > 1)
        .select(col("doc_id"), explode(bigrams).as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("top_bi"), sum("c").as("n_bigrams"))
      tokAgg.join(biAgg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("n_types"),
          (lit(1.0) - col("n_types").cast("double") / col("n_tokens")).as("dup_token_frac"),
          (col("top_tok").cast("double") / col("n_tokens")).as("top_token_frac"),
          coalesce(col("top_bi").cast("double") / col("n_bigrams"), lit(0.0)).as("top_bigram_frac"))
        .orderBy("doc_id")
    }),
    // PII redaction: emails/phones scrubbed with global regexp_replace at
    // the scan stage (zero shuffles). The synthetic corpus carries no PII,
    // so the contact string is composed from customer keys — the scrub
    // kernel itself is what is exercised and oracle-checked.
    "text_pii_scrub" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val contact = concat(
        col("c_name"), lit(" can be reached at user"),
        col("c_custkey").cast("string"),
        lit("@example.com or +1-555-"),
        lpad((col("c_custkey") % 10000).cast("string"), 4, "0"))
      c.select(col("c_custkey"), contact.as("contact"))
        .select(col("c_custkey"),
          regexp_replace(regexp_replace(col("contact"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>").as("scrubbed"),
          regexp_count(col("contact"), lit(EmailRe)).as("n_emails"),
          regexp_count(col("contact"), lit(PhoneRe)).as("n_phones"))
        .orderBy("c_custkey")
    }),
    // TF-IDF top-3 terms per doc. Log-free rational idf variant
    // ((N+1)/(df+1)) so the score is one exact integer product and one
    // IEEE division — ln() is not bit-portable across engines (§4).
    "text_tfidf" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val terms = d.select(d("doc_id"), explode(TextHash.tokens(d("text"))).as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = d.agg(countDistinct("doc_id").as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
      tf.join(dfreq, "term").join(broadcast(nDocs))
        .withColumn("tfidf",
          (col("tf") * (col("n_docs") + 1)).cast("double") / (col("df") + 1))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("doc_id", "rank", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", "rank")
    }),
    // Multimodal decode + bounded resize through the typed batch pipeline
    // (Multimodal.decodeAndResize over mapPartitions) — oracle-checked:
    // the stub codec's header math is SQL-expressible byte arithmetic.
    "media_decode" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val blobs = Multimodal.blobsFromText(d, "doc_id", "text", "image")
      Multimodal.decodeAndResize(blobs, maxSide = 64).toDF()
        .select(col("id"), col("kind"), col("nBytes").as("n_bytes"),
          col("width"), col("height"), col("durationMs").as("duration_ms"),
          col("valid"))
        .orderBy("id")
    }),
    // REAL image codec round trip (JDK javax.imageio — not the stub):
    // generate a deterministic PNG per sampled doc_id, decode its actual
    // pixels, rescale the long side to 12, re-encode, and read the dims
    // back from the RESIZED bytes. The oracle reproduces the expected
    // dimensions arithmetically (generated w=16+id%32 always exceeds both
    // h=8+id%16 and maxSide, so scale=12.0/w — same IEEE expression both
    // engines), which only matches if the whole pixel pipeline is real.
    "media_decode_imageio" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents")
        .filter(col("doc_id") % 100 === 0).select("doc_id").as[Long]
      val blobs = ids.map(id => Multimodal.MediaBlob(id, "png",
        Multimodal.ImageIoCodec.encodeTestPng(
          (16 + id % 32).toInt, (8 + id % 16).toInt)))
      Multimodal.decodeAndResizeReal(blobs, maxSide = 12).toDF()
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("valid"))
        .orderBy("doc_id")
    }),
    // Perceptual image dedup over REAL decoded pixels: dHash (8×9-grid
    // luminance gradients, exact integer math) per payload, duplicate
    // pairs by hash equi-join — robust to re-encoding because the hash
    // reads pixels, not bytes. The synthetic bit-row PNGs make every
    // hash arithmetically derivable, so the oracle predicts the FULL
    // pair set (planted +1000000 copies AND natural pattern collisions)
    // from doc_id bit arithmetic alone — it matches only if decode,
    // block sums, gradient bits, and the join are all correct.
    "media_dedup_dhash" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents")
        .filter(col("doc_id") % 10 === 0).select("doc_id").as[Long]
      val blobs = ids.flatMap { id =>
        val base = Multimodal.MediaBlob(id, "png",
          Multimodal.ImageIoCodec.encodeBitRowPng(id))
        if (id % 97 == 0)
          Seq(base, Multimodal.MediaBlob(id + 1000000L, "png",
            Multimodal.ImageIoCodec.encodeBitRowPng(id)))
        else Seq(base)
      }
      Multimodal.dHashDupPairs(Multimodal.dHashBatch(blobs))
        .orderBy("d1", "d2")
    }),
    // REAL audio codec round trip (JDK javax.sound.sampled): generate a
    // deterministic 16-bit mono PCM WAV per sampled doc (frames =
    // 8000 + (id%32)*400 at 8 kHz — duration divides exactly), parse the
    // header back, and report the decoded duration and container size.
    // The canonical PCM WAV header is 44 bytes, so n_bytes is arithmetic
    // too — both only match if the encode→parse pipeline is real.
    "media_decode_wav" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents")
        .filter(col("doc_id") % 100 === 0).select("doc_id").as[Long]
      val blobs = ids.map(id => Multimodal.MediaBlob(id, "wav",
        Multimodal.WavCodec.encodeTestWav((8000 + (id % 32) * 400).toInt)))
      Multimodal.decodeBatchReal(blobs).toDF()
        .select(col("id").as("doc_id"), col("durationMs").as("duration_ms"),
          col("nBytes").as("n_bytes"), col("valid"))
        .orderBy("doc_id")
    }),
    // Stratified systematic sampling: every 10th doc per language by
    // doc_id rank — the deterministic, resumable way to draw a balanced
    // subsample (random sampling isn't reproducible across engines or
    // re-runs; rank-based systematic sampling is). One shuffle on the
    // stratum key; at scale the window state per language is a counter.
    "text_sample_stratified" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
      d.select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("rn", row_number().over(w))
        .filter((col("rn") - 1) % 10 === 0)
        .drop("rn")
        .orderBy("doc_id")
    }),
    // Quality-weighted downsampling (the CCNet-style keep-rate-per-
    // quality-tier pass): every doc draws a DETERMINISTIC uniform from a
    // multiplicative hash of its id — reproducible (a doc's fate never
    // changes across corpus rebuilds, so incremental pipelines stay
    // consistent) and engine-portable (pure BIGINT arithmetic, no
    // engine-specific hash). good keeps all, low_stop 30%, short 5%.
    // Pure scan-stage expression work: sampling 100 TB costs one pass,
    // zero shuffles before the output order.
    "text_sample_weighted" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val t = d("text")
      val nt = nTokens(t)
      val stops = stopCount(t, stopwords("en"))
      val quality = when(nt < 30, "short")
        .when(stops.cast("double") / greatest(nt, lit(1)) > 0.02, "good")
        .otherwise("low_stop")
      val u = (col("doc_id") * lit(2654435761L) % 1000000L).cast("double") / 1e6
      val p = when(quality === "good", 1.0)
        .when(quality === "low_stop", 0.3).otherwise(0.05)
      d.select(col("doc_id"), quality.as("quality"), u.as("u"), p.as("p"))
        .filter(col("u") < col("p"))
        .select("doc_id", "quality")
        .orderBy("doc_id")
    }),
    // Benchmark decontamination: flag training docs sharing any 8-token
    // shingle with the eval set (doc_id % 50 == 0 stands in for the
    // benchmark). The eval shingle set is tiny relative to the corpus, so
    // it broadcasts — the 100 TB training side never shuffles; shingling
    // runs in the scan stage.
    "text_decontaminate" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val sh = d.select(col("doc_id"),
        explode(TextHash.shingles(col("text"), 8)).as("g"))
      val evalSet = sh.filter(col("doc_id") % 50 === 0).select("g").distinct()
      sh.filter(col("doc_id") % 50 =!= 0)
        .join(broadcast(evalSet), "g")
        .groupBy("doc_id")
        .agg(countDistinct("g").as("n_shared"))
        .orderBy("doc_id")
    }),
    // Multimodal frame sampling: bounded deterministic frame references
    // per video payload (every 250 ms, ≤ 8 frames) through the typed
    // batch pipeline; the stub codec's duration math is SQL-expressible.
    "media_frames" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val blobs = Multimodal.blobsFromText(d, "doc_id", "text", "video")
      Multimodal.frameSample(blobs, stepMs = 250, maxFrames = 8).toDF()
        .select(col("id"), col("frameIdx").as("frame_idx"), col("tsMs").as("ts_ms"))
        .orderBy("id", "frame_idx")
    }),
    // Multimodal metadata probe: opaque binary column + header-byte fields.
    "media_metadata" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val bin = d("text").cast("binary")
      d.select(
          d("doc_id"),
          length(bin).as("n_bytes"),
          ascii(substring(d("text"), 1, 1)).as("hdr_w"),
          ascii(substring(d("text"), 2, 1)).as("hdr_h"),
          md5(bin).as("digest"))
        .orderBy("doc_id")
    }),
  )

  // RE2-compatible (DuckDB) and java.util.regex-compatible (Spark) alike.
  private val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  private def sqlStops(l: String): String = "\\b(" + stopwords(l).mkString("|") + ")\\b"

  def oracle: Map[String, String] = Map(
    "text_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '\\S+')) AS INTEGER) AS n_tokens,
         |  CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+'))) AS INTEGER) AS n_types,
         |  len(list_distinct(regexp_extract_all(text, '[a-z]+'))) * 1.0
         |    / greatest(len(regexp_extract_all(text, '\\S+')), 1) AS type_token_ratio,
         |  CAST(length(text) AS INTEGER) AS n_chars_measured,
         |  length(text) = n_chars AS n_chars_consistent,
         |  CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+'))
         |    AS INTEGER) AS n_bpeish
         |FROM documents ORDER BY doc_id""".stripMargin,
    "pipeline_pack_sequences" ->
      """SELECT doc_id, doc_id % 32 AS shard,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |  CAST((sum(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT))
        |     OVER (PARTITION BY doc_id % 32 ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   - CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)) // 8192
        |    AS BIGINT) AS pack_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pipeline_shuffle_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS skey,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY skey, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
        |      AS BIGINT) AS cum_before
        |  FROM t),
        |tot AS (SELECT sum(n_tokens) AS total FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(cum_before // ((total + 15) // 16) AS BIGINT) AS shard,
        |  cum_before AS offset_in_epoch
        |FROM c, tot ORDER BY doc_id""".stripMargin,
    "text_quality_classifier" ->
      """SELECT doc_id,
        |  CAST(coalesce(list_sum(list_transform(
        |    regexp_extract_all(text, '[a-z]+'),
        |    t -> (CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) % 4096)
        |         * 2654435761 % 8192 - 4096)), 0) AS BIGINT) AS score,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(list_sum(list_transform(
        |    regexp_extract_all(text, '[a-z]+'),
        |    t -> (CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) % 4096)
        |         * 2654435761 % 8192 - 4096)), 0) AS DOUBLE)
        |    / greatest(len(regexp_extract_all(text, '[a-z]+')), 1) AS norm_score,
        |  coalesce(list_sum(list_transform(
        |    regexp_extract_all(text, '[a-z]+'),
        |    t -> (CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) % 4096)
        |         * 2654435761 % 8192 - 4096)), 0) > 0 AS keep
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pipeline_chunk_documents" ->
      """WITH words AS (
        |  SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS w FROM documents),
        |c AS (
        |  SELECT doc_id, w,
        |    unnest(range(0, greatest((len(w) - 9) // 56, 0) + 1)) AS chunk_idx
        |  FROM words WHERE len(w) >= 1)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(chunk_idx * 56 AS BIGINT) AS start_tok,
        |  CAST(least(64, len(w) - chunk_idx * 56) AS BIGINT) AS n_tokens_chunk,
        |  md5(array_to_string(
        |    w[chunk_idx * 56 + 1 : chunk_idx * 56 + least(64, len(w) - chunk_idx * 56)],
        |    ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_bigram_lm" ->
      """WITH words AS (
        |  SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS w FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |    i -> array_to_string(w[i:i+1], ' '))) AS g
        |  FROM words WHERE len(w) >= 2),
        |bgc AS (SELECT g, count(*) AS cbg FROM bg GROUP BY g),
        |tok AS (SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS t
        |        FROM documents),
        |tc AS (SELECT t, count(*) AS ct FROM tok GROUP BY t),
        |j AS (SELECT doc_id, cbg, ct FROM bg
        |      JOIN bgc USING (g)
        |      JOIN tc ON split_part(g, ' ', 1) = t)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(cbg) AS BIGINT) AS bigram_hits,
        |  CAST(sum(ct) AS BIGINT) AS unigram_hits,
        |  CAST(sum(cbg) AS DOUBLE) / sum(ct) AS lm_score
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "pipeline_mix_sources" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(sum(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT))
        |      OVER (PARTITION BY source ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |     - CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS BIGINT)
        |      AS cum_before
        |  FROM documents)
        |SELECT doc_id, source, n_tokens FROM t
        |WHERE cum_before < CASE WHEN CAST(substring(source, 4) AS INTEGER) % 2 = 0
        |                        THEN 600 ELSE 300 END
        |ORDER BY doc_id""".stripMargin,
    "text_shared_ngrams" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(regexp_extract_all(text, '[a-z]+')) - 1, 1)),
        |    i -> array_to_string(regexp_extract_all(text, '[a-z]+')[i:i+2], ' ')))) AS g
        |  FROM documents),
        |cnts AS (SELECT g, count(*) AS ndocs FROM tok GROUP BY g)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_ngrams,
        |  CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS shared_ngrams,
        |  CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |    AS shared_ratio
        |FROM tok JOIN cnts USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_familiarity" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
        |  FROM documents),
        |cnts AS (SELECT t, count(*) AS c FROM tok GROUP BY t)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(c) AS BIGINT) AS familiarity_sum,
        |  CAST(sum(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS rare_toks,
        |  CAST(sum(c) AS DOUBLE) / count(*) AS familiarity,
        |  CAST(sum(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |    AS rare_ratio
        |FROM tok JOIN cnts USING (t)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_gopher_rules" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
        |  CAST(len(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS word_chars,
        |  CAST(len(regexp_extract_all(text, '[^a-z\s]')) AS BIGINT) AS symbol_chars,
        |  CAST(len(list_filter(regexp_extract_all(text, '\S+'),
        |    w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS alpha_words,
        |  CAST(len(list_intersect(list_distinct(regexp_extract_all(text, '\S+')),
        |    ['the','a','of','and','to'])) AS BIGINT) AS stop_hits
        |FROM documents)
        |SELECT doc_id, n_words, word_chars, symbol_chars, alpha_words, stop_hits,
        |  (n_words BETWEEN 50 AND 100000
        |   AND word_chars BETWEEN 3*n_words AND 10*n_words
        |   AND 10*symbol_chars <= n_words
        |   AND 5*alpha_words >= 4*n_words
        |   AND stop_hits >= 2) AS keep
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '\\S+')) AS INTEGER) AS n_tokens,
         |  len(regexp_extract_all(text, '[.,;:!?]')) * 1.0 / length(text) AS punct_ratio,
         |  len(regexp_extract_all(text, '[A-Z]')) * 1.0 / length(text) AS upper_ratio,
         |  len(regexp_extract_all(text, '${sqlStops("en")}')) * 1.0
         |    / greatest(len(regexp_extract_all(text, '\\S+')), 1) AS stop_ratio,
         |  CASE WHEN len(regexp_extract_all(text, '\\S+')) < 30 THEN 'short'
         |       WHEN len(regexp_extract_all(text, '${sqlStops("en")}')) * 1.0
         |         / greatest(len(regexp_extract_all(text, '\\S+')), 1) > 0.02 THEN 'good'
         |       ELSE 'low_stop' END AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
         |  CASE WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
         |       WHEN s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
         |       WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
         |       WHEN s_fr >= s_zh THEN 'fr'
         |       ELSE 'zh' END AS pred
         |FROM (SELECT doc_id,
         |  CAST(len(regexp_extract_all(lower(text), '${sqlStops("en")}')) AS INTEGER) AS s_en,
         |  CAST(len(regexp_extract_all(lower(text), '${sqlStops("de")}')) AS INTEGER) AS s_de,
         |  CAST(len(regexp_extract_all(lower(text), '${sqlStops("es")}')) AS INTEGER) AS s_es,
         |  CAST(len(regexp_extract_all(lower(text), '${sqlStops("fr")}')) AS INTEGER) AS s_fr,
         |  CAST(len(regexp_extract_all(lower(text), '${sqlStops("zh")}')) AS INTEGER) AS s_zh
         |  FROM documents) t ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_winnow" ->
      """WITH n AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, list_transform(range(1, length(s) - 5 + 2),
        |    i -> CAST('0x' || substring(md5(substring(s, i, 5)), 1, 15) AS BIGINT)) AS h
        |  FROM n WHERE length(s) >= 8),
        |f AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(h) - 4 + 2),
        |    j -> list_min(h[j:j+3]))) AS fps
        |  FROM g)
        |SELECT doc_id, CAST(len(fps) AS INTEGER) AS n_fp,
        |  list_min(fps) AS fp_min, list_max(fps) AS fp_max
        |FROM f ORDER BY doc_id""".stripMargin,
    "text_top_terms" ->
      """SELECT term, count(*) AS doc_freq FROM (
        |  SELECT doc_id, unnest(list_distinct(regexp_extract_all(text, '[a-z]+'))) AS term
        |  FROM documents) t
        |GROUP BY term ORDER BY doc_freq DESC, term ASC LIMIT 25""".stripMargin,
    "text_length_hist" ->
      """SELECT CAST(least(floor(n_chars / 100), 9) AS INTEGER) AS bucket,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |       ' +', ' ', 'g')) AS norm_text,
        |  CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |       ' +', ' ', 'g'))) AS INTEGER) AS norm_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS toks FROM documents
        |  WHERE len(regexp_extract_all(text, '[a-z]+')) > 0),
        |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2),
        |ta AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         count(*) AS n_types, CAST(max(c) AS BIGINT) AS top_tok
        |       FROM tc GROUP BY 1),
        |bg AS (SELECT doc_id, list_transform(range(1, len(toks)),
        |         i -> toks[i] || ' ' || toks[i+1]) AS bis
        |       FROM t WHERE len(toks) > 1),
        |bu AS (SELECT doc_id, unnest(bis) AS bi FROM bg),
        |bc AS (SELECT doc_id, bi, count(*) AS c FROM bu GROUP BY 1, 2),
        |ba AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bi,
        |         CAST(sum(c) AS BIGINT) AS n_bigrams FROM bc GROUP BY 1)
        |SELECT ta.doc_id, n_tokens, n_types,
        |  1.0 - CAST(n_types AS DOUBLE) / n_tokens AS dup_token_frac,
        |  CAST(top_tok AS DOUBLE) / n_tokens AS top_token_frac,
        |  coalesce(CAST(top_bi AS DOUBLE) / n_bigrams, 0.0) AS top_bigram_frac
        |FROM ta LEFT JOIN ba ON ta.doc_id = ba.doc_id
        |ORDER BY ta.doc_id""".stripMargin,
    "text_pii_scrub" ->
      """WITH c AS (
        |  SELECT c_custkey,
        |    c_name || ' can be reached at user' || CAST(c_custkey AS VARCHAR)
        |      || '@example.com or +1-555-'
        |      || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS contact
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_replace(regexp_replace(contact,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(contact,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(contact,
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones
        |FROM c ORDER BY c_custkey""".stripMargin,
    "text_tfidf" ->
      """WITH u AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM u GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, term, tf, df,
        |         CAST(tf * (n_docs + 1) AS DOUBLE) / (df + 1) AS tfidf
        |       FROM tf JOIN dfq USING (term) CROSS JOIN nd)
        |SELECT doc_id, CAST(rn AS INTEGER) AS rank, term, tf, df, tfidf FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
        |  FROM sc) t
        |WHERE rn <= 3 ORDER BY doc_id, rank""".stripMargin,
    "media_decode_imageio" ->
      """SELECT doc_id,
        |  CAST(FLOOR((16 + doc_id % 32) * (12.0 / (16 + doc_id % 32)))
        |    AS INTEGER) AS width,
        |  CAST(FLOOR((8 + doc_id % 16) * (12.0 / (16 + doc_id % 32)))
        |    AS INTEGER) AS height,
        |  true AS valid
        |FROM documents WHERE doc_id % 100 = 0 ORDER BY doc_id""".stripMargin,
    "media_dedup_dhash" ->
      """WITH ids AS (
        |  SELECT doc_id, doc_id AS c FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, doc_id AS c FROM documents
        |  WHERE doc_id % 10 = 0 AND doc_id % 97 = 0),
        |pat AS (
        |  SELECT doc_id,
        |    ((CASE WHEN ((c >> 1) & 1) > (c & 1) THEN 1 ELSE 0 END)
        |   + (CASE WHEN ((c >> 2) & 1) > ((c >> 1) & 1) THEN 2 ELSE 0 END)
        |   + (CASE WHEN ((c >> 3) & 1) > ((c >> 2) & 1) THEN 4 ELSE 0 END)
        |   + (CASE WHEN ((c >> 4) & 1) > ((c >> 3) & 1) THEN 8 ELSE 0 END)
        |   + (CASE WHEN ((c >> 5) & 1) > ((c >> 4) & 1) THEN 16 ELSE 0 END)
        |   + (CASE WHEN ((c >> 6) & 1) > ((c >> 5) & 1) THEN 32 ELSE 0 END)
        |   + (CASE WHEN ((c >> 7) & 1) > ((c >> 6) & 1) THEN 64 ELSE 0 END)
        |   + (CASE WHEN ((c >> 8) & 1) > ((c >> 7) & 1) THEN 128 ELSE 0 END)) AS p
        |  FROM ids)
        |SELECT a.doc_id AS d1, b.doc_id AS d2
        |FROM pat a JOIN pat b ON a.p = b.p AND a.doc_id < b.doc_id
        |ORDER BY d1, d2""".stripMargin,
    "media_decode_wav" ->
      """SELECT doc_id,
        |  CAST(1000 + (doc_id % 32) * 50 AS INTEGER) AS duration_ms,
        |  CAST(44 + (8000 + (doc_id % 32) * 400) * 2 AS INTEGER) AS n_bytes,
        |  true AS valid
        |FROM documents WHERE doc_id % 100 = 0 ORDER BY doc_id""".stripMargin,
    "media_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS id, 'image' AS kind,
        |    CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |    octet_length(encode(text)) >= 4 AS valid,
        |    CASE WHEN octet_length(encode(text)) >= 4
        |         THEN ascii(substring(text, 1, 1)) ELSE 0 END AS w0,
        |    CASE WHEN octet_length(encode(text)) >= 4
        |         THEN ascii(substring(text, 2, 1)) ELSE 0 END AS h0,
        |    CASE WHEN octet_length(encode(text)) >= 4
        |         THEN ascii(substring(text, 3, 1)) * 256 + ascii(substring(text, 4, 1))
        |         ELSE 0 END AS dur
        |  FROM documents)
        |SELECT id, kind, n_bytes,
        |  CAST(CASE WHEN greatest(w0, h0) <= 64 THEN w0
        |       ELSE floor(w0 * (64.0 / greatest(w0, h0))) END AS INTEGER) AS width,
        |  CAST(CASE WHEN greatest(w0, h0) <= 64 THEN h0
        |       ELSE floor(h0 * (64.0 / greatest(w0, h0))) END AS INTEGER) AS height,
        |  CAST(dur AS INTEGER) AS duration_ms, valid
        |FROM m ORDER BY id""".stripMargin,
    "text_sample_stratified" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE (rn - 1) % 10 = 0 ORDER BY doc_id""".stripMargin,
    "text_sample_weighted" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    CASE WHEN len(regexp_extract_all(text, '\\S+')) < 30 THEN 'short'
         |         WHEN len(regexp_extract_all(text, '${sqlStops("en")}')) * 1.0
         |           / greatest(len(regexp_extract_all(text, '\\S+')), 1) > 0.02 THEN 'good'
         |         ELSE 'low_stop' END AS quality
         |  FROM documents)
         |SELECT doc_id, quality FROM q
         |WHERE (doc_id * 2654435761) % 1000000 / 1000000.0 <
         |  CASE quality WHEN 'good' THEN 1.0 WHEN 'low_stop' THEN 0.3
         |       ELSE 0.05 END
         |ORDER BY doc_id""".stripMargin,
    "text_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(toks) - 6, 1)),
        |    i -> array_to_string(toks[i:i+7], ' ')))) AS g
        |  FROM t WHERE len(toks) >= 8),
        |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % 50 = 0),
        |tr AS (SELECT doc_id, g FROM sh WHERE doc_id % 50 <> 0)
        |SELECT doc_id, count(DISTINCT g) AS n_shared
        |FROM tr JOIN ev USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "media_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS id,
        |    CASE WHEN octet_length(encode(text)) >= 4
        |         THEN ascii(substring(text, 3, 1)) * 256 + ascii(substring(text, 4, 1))
        |         ELSE 0 END AS dur,
        |    octet_length(encode(text)) >= 4 AS valid
        |  FROM documents)
        |SELECT id, CAST(i AS INTEGER) AS frame_idx, CAST(i * 250 AS INTEGER) AS ts_ms
        |FROM m, unnest(range(0, least(dur // 250 + 1, 8))) AS t(i)
        |WHERE valid ORDER BY id, frame_idx""".stripMargin,
    "media_metadata" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST(ascii(substring(text, 1, 1)) AS INTEGER) AS hdr_w,
        |  CAST(ascii(substring(text, 2, 1)) AS INTEGER) AS hdr_h,
        |  md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
