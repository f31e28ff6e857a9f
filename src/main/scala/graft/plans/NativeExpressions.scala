package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the hot kernels of the dedup/ANN
 * pipelines. The composable `transform`/`aggregate` higher-order functions
 * are interpreted per element; these generate tight Java loops over
 * primitive `ArrayData`, keeping the kernels inside whole-stage codegen
 * (single fused loop per row, no per-element virtual dispatch).
 *
 * Semantics are bit-identical to the higher-order formulations (and to the
 * DuckDB oracles): 64-bit integer arithmetic, same modulus, same tie rules.
 */

/** Exact integer dot product of two array<bigint> (length = min of both). */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |}
       """.stripMargin
    })
}

/**
 * Full MinHash signature in one pass: for each k, min over the input
 * hashes of (a(k) * (h mod P) + b(k)) mod P, P = 2^31-1. Empty input →
 * all-P signature (never collides with a real band). O(|hashes| × K) fused
 * primitive ops instead of K interpreted array traversals.
 */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {

  private val P = 2147483647L

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val k = a.length
    val out = Array.fill(k)(P)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i) % P
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[${a.length}];
         |java.util.Arrays.fill($out, ${P}L);
         |for (int $i = 0; $i < $hs.numElements(); $i++) {
         |  long $h = $hs.getLong($i) % ${P}L;
         |  for (int $j = 0; $j < ${a.length}; $j++) {
         |    long $v = ($aRef[$j] * $h + $bRef[$j]) % ${P}L;
         |    if ($v < $out[$j]) $out[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }
}

/**
 * Distinct n-word shingles from a token array, single pass. The
 * composable form — `transform(sequence(...), i -> slice(tokens, i, n))` —
 * re-evaluates the tokens child (a regexp extraction) for every sequence
 * element: O(doc²) regex work per document. Here the child is evaluated
 * exactly once. First-occurrence order, matching
 * `list_distinct(list_transform(...))` in the DuckDB oracles.
 */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i + n <= m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/**
 * All hyperplane-LSH sign bands in one pass: for band b and bit i, bit i
 * of band b's value is set iff dot(qv, plane[b*bits+i]) > 0. `planes` is
 * row-major (bands*bits × dim). Output: array<bigint> of length `bands`.
 * Replaces per-plane literal-array construction (interpreted per row) with
 * one fused loop.
 */
case class HyperplaneSignBands(child: Expression, seed: Long,
    bands: Int, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sign_bands"

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignBands =
    copy(child = newChild)

  // Plane coefficients are derived from the OBSERVED vector length instead
  // of a caller-probed dim — the probe was an extra Spark job per
  // invocation (a full stage launch to read one row's array length). The
  // seeded generation is deterministic per (seed, dim), so every row of
  // the same length signs against the same planes — identical results to
  // the static-dim variant on fixed-dim corpora. The cache is a volatile
  // (dim, planes) pair: races regenerate the same array (benign), and the
  // fast path is one volatile read per row against an O(bands·bits·dim)
  // signing loop.
  @transient @volatile private var cached: (Int, Array[Long]) = _

  def planesFor(dim: Int): Array[Long] = {
    var c = cached
    if (c == null || c._1 != dim) {
      // Ragged-corpus check — BEST-EFFORT and PER-TASK only: the cache is
      // @transient, so each task deserializes its own instance and the
      // throw fires only when a single task sees two different lengths.
      // If dimensions are segregated by partition no task ever sees both,
      // nothing throws, and rows sign against unrelated per-dim plane
      // sets (zero cross-dim candidate pairs). Callers that cannot
      // guarantee a fixed-dimension column must validate uniformity
      // themselves (e.g. a distinct-size aggregate) before relying on
      // the kernel; Dedup.embeddingPairs documents this contract.
      if (c != null) throw new IllegalStateException(
        s"mixed vector dimensions within one task: saw ${c._1} then $dim — " +
          "hyperplane LSH requires a fixed-dimension embedding column " +
          "(this check is best-effort per task; partition-segregated dims " +
          "pass it silently)")
      val rnd = new scala.util.Random(seed)
      c = (dim, Array.fill(bands * bits * dim)((rnd.nextInt(2001) - 1000).toLong))
      cached = c
    }
    c._2
  }

  override def nullSafeEval(input: Any): Any = {
    val qv = input.asInstanceOf[ArrayData]
    val n = qv.numElements()
    val planes = planesFor(n)
    val out = new Array[Long](bands)
    var p = 0
    while (p < bands * bits) {
      var dot = 0L
      var i = 0
      val off = p * n
      while (i < n) { dot += planes(off + i) * qv.getLong(i); i += 1 }
      if (dot > 0) out(p / bits) |= 1L << (p % bits)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("lshExpr", this,
      "graft.plans.HyperplaneSignBands")
    nullSafeCodeGen(ctx, ev, qv => {
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val off = ctx.freshName("off")
      val planes = ctx.freshName("planes")
      s"""
         |long[] $out = new long[$bands];
         |int $n = $qv.numElements();
         |long[] $planes = $selfRef.planesFor($n);
         |for (int $p = 0; $p < ${bands * bits}; $p++) {
         |  long $dot = 0L;
         |  int $off = $p * $n;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $planes[$off + $i] * $qv.getLong($i);
         |  }
         |  if ($dot > 0) $out[$p / $bits] |= 1L << ($p % $bits);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }
}

/**
 * Per-doc fixed-point sigmoid error for the hashed linear classifier
 * trainer (TextClassifier.train): floor((1/(1+exp(-dot)) - y) * scale)
 * as a long, where dot folds the doc's bucket-sorted (b, c) feature
 * pairs LEFT-TO-RIGHT as `acc + weights(b + 1) * (double) c` — the exact
 * IEEE op sequence of the higher-order `aggregate` fold it replaces
 * (same multiply-then-add per element, same fold order, same
 * `java.lang.Math.exp` / `Math.floor`), so the result is bit-identical
 * to the composable form AND to the DuckDB oracle's list_reduce replay.
 * Only the per-element interpreted dispatch goes away: the fold runs as
 * one fused primitive loop inside whole-stage codegen (r18 — the
 * interpreted ArrayAggregate was the dominant task time of
 * text_classifier_train, 12 epochs × corpus × features steps).
 */
case class ClassifierErrFx(feats: Expression, label: Expression,
    weights: Array[Double], scale: Double)
    extends BinaryExpression {

  override def left: Expression = feats
  override def right: Expression = label
  override def dataType: DataType = LongType
  override def prettyName: String = "classifier_err_fx"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ClassifierErrFx =
    copy(feats = newLeft, label = newRight)

  override def nullSafeEval(f: Any, y: Any): Any = {
    val arr = f.asInstanceOf[ArrayData]
    val yy = y.asInstanceOf[Double]
    var acc = 0.0
    var i = 0
    while (i < arr.numElements()) {
      val r = arr.getStruct(i, 2)
      acc = acc + weights(r.getInt(0) + 1) * r.getLong(1).toDouble
      i += 1
    }
    val p = 1.0 / (1.0 + java.lang.Math.exp(-acc))
    java.lang.Math.floor((p - yy) * scale).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("clsWeights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, (f, y) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val r = ctx.freshName("r")
      val p = ctx.freshName("p")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $f.numElements(); $i++) {
         |  org.apache.spark.sql.catalyst.InternalRow $r = $f.getStruct($i, 2);
         |  $acc = $acc + $wRef[$r.getInt(0) + 1] * (double) $r.getLong(1);
         |}
         |double $p = 1.0 / (1.0 + java.lang.Math.exp(-$acc));
         |${ev.value} = (long) java.lang.Math.floor(($p - $y) * ${scale}D);
       """.stripMargin
    })
  }
}

/**
 * Sliding-window minimum over array<bigint>: output[j] = min(input[j..j+w-1])
 * for j = 0..n-w (the winnowing selection step). Monotone-deque algorithm:
 * O(n) total instead of O(n·w) interpreted slice+min allocations.
 */
case class SlidingMin(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(w >= 1, "window must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sliding_min"

  override protected def withNewChildInternal(newChild: Expression): SlidingMin =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - w + 1)
    val deque = new Array[Int](n) // indices, increasing values
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = arr.getLong(deque(head))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val deque = ctx.freshName("deque")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |int $n = $arr.numElements();
         |long[] $out;
         |if ($n < $w) {
         |  $out = new long[0];
         |} else {
         |  $out = new long[$n - $w + 1];
         |  int[] $deque = new int[$n];
         |  int $head = 0, $tail = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = $arr.getLong($i);
         |    while ($tail > $head && $arr.getLong($deque[$tail - 1]) >= $v) $tail--;
         |    $deque[$tail++] = $i;
         |    if ($deque[$head] <= $i - $w) $head++;
         |    if ($i >= $w - 1) $out[$i - $w + 1] = $arr.getLong($deque[$head]);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
}

/**
 * 60-bit SimHash from an array of 60-bit token hashes: bit j set iff the
 * ±1 vote sum over tokens for bit j is positive. Single pass, 60 counters.
 */
case class SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](60)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 60) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) sim |= 1L << j; j += 1 }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
         |int[] $counts = new int[60];
         |for (int $i = 0; $i < $hs.numElements(); $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $j = 0; $j < 60; $j++) {
         |    if ((($h >> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $j = 0; $j < 60; $j++) {
         |  if ($counts[$j] > 0) ${ev.value} |= 1L << $j;
         |}
       """.stripMargin
    })
}
