package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}

/** Column-API facade over the native kernels, so call sites don't repeat
  * the Expression↔Column bridging. */
object kernels {

  def longArrayDot(a: Column, b: Column): Column =
    column(LongArrayDot(expression(a), expression(b)))

  def minhashSig(hashes: Column, a: Array[Long], b: Array[Long]): Column =
    column(MinHashSig(expression(hashes), a, b))

  def wordShingles(tokens: Column, n: Int): Column =
    column(WordShingles(expression(tokens), n))

  def simhash60(hashes: Column): Column =
    column(SimHash60(expression(hashes)))

  def hyperplaneSignBands(qv: Column, seed: Long,
      bands: Int, bits: Int): Column =
    column(HyperplaneSignBands(expression(qv), seed, bands, bits))

  def slidingMin(arr: Column, w: Int): Column =
    column(SlidingMin(expression(arr), w))

  def classifierErrFx(feats: Column, label: Column,
      weights: Array[Double], scale: Double): Column =
    column(ClassifierErrFx(expression(feats), expression(label), weights, scale))

  // roaring-bitmap primitives (rbm32/rbm64 merge-engine functions)
  def rbmBuild(values: Column, bits64: Boolean): Column =
    column(RbmBuild(expression(values), bits64))

  def rbmCardinality(bm: Column, bits64: Boolean): Column =
    column(RbmCardinality(expression(bm), bits64))

  def rbmToArray(bm: Column, bits64: Boolean): Column =
    column(RbmToArray(expression(bm), bits64))

  def rbmOr(bm: Column, bits64: Boolean): Column =
    column(RoaringOrAgg(expression(bm), bits64).toAggregateExpression())
}
