package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.sources.Tables

/**
 * Distributed TRAINING for the hashed linear quality classifier
 * (fastText-shape: tokens hash into buckets, doc score = weight sum —
 * the inference side has been `text_quality_classifier` since r10).
 * Full-batch logistic regression, Spark-first and bit-deterministic:
 *
 *  - [[features]] is the only pass over the corpus TEXT: tokens hash
 *    into `NumBuckets` buckets, per-doc (bucket, count) pairs build in
 *    the scan stage (explode → two-key groupBy → per-doc collect, the
 *    pair list sorted by bucket so every later fold has a fixed order),
 *    a bias pseudo-feature rides along. Persisted once; epochs never
 *    touch text again.
 *  - [[train]] runs one Spark job per epoch over the persisted
 *    features: per-doc sigmoid scores fold over the doc's OWN sorted
 *    pair list against the broadcast weight vector (a 4097-element
 *    literal array — model-sized by construction), the per-doc error
 *    quantizes to a FIXED-POINT long, and the per-bucket gradient is an
 *    INTEGER sum — exact under any partitioning and summation order, so
 *    distributed training equals a single-node replay bit-for-bit (the
 *    float work happens only per-doc in a fixed fold order and on the
 *    driver's O(buckets) update). The collect is O(buckets), never
 *    O(docs).
 *  - [[score]] applies a trained model in the scan stage — the same
 *    zero-shuffle shape as the r10 inference query.
 *
 * At 100 TB: features = one shuffle keyed (doc, bucket) with map-side
 * combine + one per-doc group; each epoch = one map-side-combined
 * integer aggregation to 4097 rows. Nothing doc-sized ever reaches the
 * driver.
 */
object TextClassifier {

  val NumBuckets = 4096
  /** Fixed-point scale for per-doc errors: errors live in [-1, 1], so
    * 2^24 keeps 7 significant decimal digits and a billion-doc gradient
    * sum stays far inside Long range (2^24 × 2^30 × counts ≪ 2^63). */
  val Scale: Long = 1L << 24

  /** weights(0) is the bias (the b = -1 pseudo-feature); weights(b + 1)
    * is bucket b. */
  final case class Model(weights: Array[Double], epochLoss: Seq[Double])

  private def bucket(t: Column): Column =
    (TextHash.hash60(t) % NumBuckets).cast("int")

  /**
   * Per-doc sparse features: (id, y, feats: array<struct<b,c>>) with
   * the pair list SORTED by bucket (fixed fold order ⇒ deterministic
   * per-doc float math) and a (b = -1, c = 1) bias feature appended.
   * `labelCol` must be 0.0/1.0.
   */
  def features(docs: DataFrame, labelCol: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = TextHash.tokens(col(textCol))
    docs
      .select(col(idCol).as("id"), col(labelCol).cast("double").as("y"),
        explode(concat(transform(toks, t => bucket(t)), array(lit(-1)))).as("b"))
      .groupBy("id", "b")
      .agg(first(col("y")).as("y"), count(lit(1)).as("c0"))
      // the bias count must be exactly 1 regardless of token count
      .select(col("id"), col("y"), col("b"),
        when(col("b") === -1, lit(1L)).otherwise(col("c0")).as("c"))
      .groupBy("id")
      .agg(first(col("y")).as("y"),
        sort_array(collect_list(struct(col("b"), col("c")))).as("feats"))
  }

  /** The per-doc sigmoid score against a literal weight vector, folded
    * over the doc's sorted pair list (deterministic order). Kept as the
    * REFERENCE formulation of the fold the native kernel replays
    * (TextClassifierSpec asserts the two agree bit-for-bit); the hot
    * path uses [[graft.plans.kernels.classifierErrFx]] — the same IEEE
    * op sequence as one fused codegen loop instead of a per-element
    * interpreted ArrayAggregate (r18). */
  private[graft] def pOf(weights: Array[Double]): Column = {
    val w = typedLit(weights.toSeq)
    val dot = aggregate(col("feats"), lit(0.0),
      (acc, f) => acc +
        element_at(w, f.getField("b") + 2) * f.getField("c").cast("double"))
    lit(1.0) / (lit(1.0) + exp(-dot))
  }

  /**
   * Full-batch gradient descent, `epochs` Spark jobs over the persisted
   * feature frame. Returns the model plus the per-epoch training loss
   * (mean squared error in fixed point — monotone trend is the
   * convergence check; cheap because it rides the same aggregation).
   */
  def train(feats: DataFrame, epochs: Int = 20, lr: Double = 0.5,
      l2: Double = 1e-4): Model = {
    require(epochs >= 1)
    val cached = feats.persist()
    val nDocs = cached.count().toDouble
    require(nDocs > 0, "no training docs")
    var w = new Array[Double](NumBuckets + 1)
    val losses = Seq.newBuilder[Double]
    (1 to epochs).foreach { _ =>
      // floor, not round: identical semantics in SQL and scala.math, so
      // the single-node replay can't diverge on an exact .5 quantum.
      // Native fused fold (r18): bit-identical to
      // floor((pOf(w) - y) * Scale).cast("long") — see ClassifierErrFx;
      // the weights array is cloned so the driver's in-place epoch update
      // can never alias a plan that might still execute.
      val errFx = graft.plans.kernels.classifierErrFx(
        col("feats"), col("y"), w.clone(), Scale.toDouble)
      // integer gradient: exact under any partitioning; O(buckets) rows
      val rows = cached
        .select(errFx.as("e"), explode(col("feats")).as("f"))
        .groupBy(col("f.b").as("b"))
        .agg(sum(col("e") * col("f.c")).as("g"),
          // loss tap: the bias feature appears once per doc, so its
          // group also carries Σ e² without a second job
          sum(when(col("f.b") === -1, col("e") * col("e"))
            .otherwise(lit(0L))).as("se"))
        .collect()
      val grad = new Array[Double](NumBuckets + 1)
      var sqErr = 0.0
      rows.foreach { r =>
        val b = r.getInt(0)
        grad(b + 1) = r.getLong(1).toDouble / Scale
        if (b == -1) sqErr = r.getLong(2).toDouble / Scale / Scale
      }
      losses += sqErr / nDocs
      var i = 0
      while (i < w.length) {
        // no L2 on the bias (index 0)
        val reg = if (i == 0) 0.0 else l2 * w(i)
        w(i) -= lr * (grad(i) / nDocs + reg)
        i += 1
      }
    }
    cached.unpersist()
    Model(w, losses.result())
  }

  /** Scan-stage inference with a trained model: doc_id, p, keep. */
  def score(docs: DataFrame, model: Model,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = typedLit(model.weights.toSeq)
    val toks = TextHash.tokens(col(textCol))
    val dot = aggregate(transform(toks, t => bucket(t)),
      element_at(w, 1), (acc, b) => acc + element_at(w, b + 2))
    val p = lit(1.0) / (lit(1.0) + exp(-dot))
    docs.select(col(idCol), p.as("p"), (p > 0.5).as("keep"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Train on weak labels (lang = 'en' as the positive class), emit the
    // learned weights in fixed point. Deterministic but float-iterative,
    // so spec-gated (TextClassifierSpec replays a single-node reference
    // bit-for-bit) rather than SQL-oracled; registered for bench.
    "text_classifier_train" -> ((s, dir) => {
      import s.implicits._
      val d = Tables(s, dir, "documents")
      val f = features(
        d.withColumn("y", (col("lang") === "en").cast("double")), "y")
      val m = train(f, epochs = 12)
      m.weights.zipWithIndex
        .map { case (v, i) => (i - 1, math.round(v * Scale)) }
        .toSeq.toDF("bucket", "weight_fx")
        .filter(col("weight_fx") =!= 0L)
        .orderBy("bucket")
    }))

  /**
   * DuckDB replay of the 12-epoch trainer (r17): the fixed-point design
   * makes the epochs SQL-replayable — per-doc float math folds over the
   * doc's OWN bucket-sorted feature list (the oracle reduces the same
   * term list left-to-right from an explicit 0.0 seed, matching the
   * Catalyst `aggregate` fold op-for-op), the per-doc error quantizes to
   * a 2^-24 fixed-point BIGINT via the same `floor`, and gradients are
   * INTEGER sums — order-free, so DuckDB's aggregation order cannot
   * diverge. Driver-side weight updates are replayed with the exact same
   * expression shape `w - 0.5 * (g / 2^24 / n + 1e-4 * w)`. Weights ride
   * between epochs as one 4097-element list. The only cross-engine float
   * surfaces are exp/division, shared IEEE-754 doubles whose sub-ULP
   * differences the fixed-point quantization absorbs.
   */
  private def classifierTrainOracle: String = {
    val epochs = 12
    // MATERIALIZED: each epoch's weight list feeds both the next epoch's
    // scoring and its own update — DuckDB 1.0 inlines CTEs by default,
    // which would re-evaluate the whole epoch chain exponentially
    val rounds = (1 to epochs).map { k =>
      s"""e$k AS MATERIALIZED (
         |  SELECT bs, cs, CAST(floor((1.0 / (1.0 + exp(-(
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(bs, (b, i) ->
         |        w${k - 1}.wl[b + 2] * CAST(cs[i] AS DOUBLE))),
         |      (a, t) -> a + t)))) - y) * 16777216.0) AS BIGINT) AS e
         |  FROM feats, w${k - 1}
         |), g$k AS MATERIALIZED (
         |  SELECT b, CAST(sum(e * c) AS BIGINT) AS g
         |  FROM (SELECT e, unnest(bs) AS b, unnest(cs) AS c FROM e$k)
         |  GROUP BY b
         |), w$k AS MATERIALIZED (
         |  SELECT list(w${k - 1}.wl[i + 1]
         |    - 0.5 * (CAST(COALESCE(g$k.g, 0) AS DOUBLE) / 16777216.0 / nn.n
         |             + CASE WHEN i = 0 THEN 0.0
         |               ELSE 0.0001 * w${k - 1}.wl[i + 1] END)
         |    ORDER BY i) AS wl
         |  FROM range(0, 4097) r(i)
         |  CROSS JOIN w${k - 1} CROSS JOIN nn
         |  LEFT JOIN g$k ON g$k.b = i - 1
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH fx AS (
       |  SELECT id, y, b, count(*) AS c0 FROM (
       |    SELECT doc_id AS id,
       |      CAST(lang = 'en' AS DOUBLE) AS y,
       |      unnest(CASE WHEN text IS NULL THEN NULL
       |        ELSE list_append(list_transform(
       |          regexp_extract_all(text, '[a-z]+'),
       |          t -> CAST(CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)
       |               % 4096 AS INTEGER)), -1) END) AS b
       |    FROM documents)
       |  GROUP BY id, y, b
       |), feats AS MATERIALIZED (
       |  SELECT id, y,
       |    list(b ORDER BY b) AS bs,
       |    list(CASE WHEN b = -1 THEN CAST(1 AS BIGINT)
       |         ELSE CAST(c0 AS BIGINT) END ORDER BY b) AS cs
       |  FROM fx GROUP BY id, y
       |), nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM feats),
       |w0 AS MATERIALIZED (
       |  SELECT list(CAST(0.0 AS DOUBLE) ORDER BY i) AS wl
       |  FROM range(0, 4097) r(i)),
       |$rounds
       |SELECT CAST(i - 1 AS INTEGER) AS bucket,
       |  CAST(floor(w$epochs.wl[i + 1] * 16777216.0 + 0.5) AS BIGINT)
       |    AS weight_fx
       |FROM range(0, 4097) r(i) CROSS JOIN w$epochs
       |WHERE CAST(floor(w$epochs.wl[i + 1] * 16777216.0 + 0.5) AS BIGINT) <> 0
       |ORDER BY bucket""".stripMargin
  }

  def oracle: Map[String, String] =
    Map("text_classifier_train" -> classifierTrainOracle)
}
