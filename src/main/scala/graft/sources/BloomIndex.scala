package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.collection.mutable

import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types._

/**
 * Per-file BLOOM-FILTER index for equality / IN predicates — the
 * Spark-native analog of Paimon's `file-index.bloom-filter.columns`
 * (the reference connector exposes every Paimon CoreOption as DDL,
 * TrinoTableOptionUtils.java:53, and Paimon's SnapshotReader consults
 * file indexes when `applyFilter` hands it an equality domain).
 *
 * Zone maps answer RANGE questions; on a column with no clustering —
 * a hash-distributed id on a 100 TB table — every dir spans the full
 * value range and min/max prunes nothing. A bloom filter answers the
 * MEMBERSHIP question those columns actually get asked (`id = X`,
 * `id IN (...)`): each data file carries one bitset per indexed column,
 * and a point lookup opens only the files whose bloom admits the
 * literal — O(1) files instead of O(table).
 *
 * Write side: [[build]] runs ONE distributed job over the freshly
 * committed dir (executors hash the indexed columns of their files into
 * per-file bitsets, sized from the footer row counts, OR-merged), and
 * the index lands as a dot-file sidecar INSIDE the dir — invisible to
 * parquet discovery, atomic with the dir's claim-rename, immutable like
 * the dir itself. The manifest records only {token, cols} per dir, so
 * planning knows which dirs are indexed without touching the FS; the
 * sidecar is opened lazily per candidate dir and cached by token (dirs
 * are immutable; the token changes if an ordinal is ever reused after
 * rollback).
 *
 * Read side is strictly conservative: a file is dropped only when EVERY
 * literal of some conjunctive equality/IN constraint on an indexed
 * column is PROVABLY absent (bloom filters have no false negatives).
 * Unknown columns, non-equality shapes, unreadable sidecars keep the
 * file. Deletion vectors compose (deletes only shrink a file's value
 * set). Hashing uses the same canonical domains as the zone evaluator
 * (integral/date/timestamp → Long, string → UTF-8 String), computed by
 * the SAME JVM code on both sides, so write/read hashes always agree.
 */
private[graft] object BloomIndex {

  val OptionKey = "file-index.bloom-filter.columns"
  val FileName = ".bloomidx.json"
  val FormatVersion = 1

  /** Hash-function count. With ~12 bits/key, k=5 gives FPP ≈ 0.5%. */
  val K = 5

  /** Columns whose canonical domain is Long or String — the domains the
    * build projection and the literal canonicalization both produce. */
  def indexable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | StringType => true
    case _ => false
  }

  /** Build-side projection to the canonical domain (matches
    * [[FileStats]]' literalDomain: date → epoch days, timestamp →
    * epoch micros, integrals → long, string as-is). */
  private def canonical(f: StructField): org.apache.spark.sql.Column = f.dataType match {
    case StringType => col(f.name)
    case DateType => col(f.name).cast(IntegerType).cast(LongType)
    case TimestampType => unix_micros(col(f.name))
    case _ => col(f.name).cast(LongType)
  }

  /** Bitset size for a file of `rows` keys: ~12 bits/key rounded up to a
    * power of two, clamped to [2^13, 2^23] bits (1 KiB – 1 MiB of
    * index per column; beyond the cap FPP degrades gracefully, never
    * soundness). */
  def bitsFor(rows: Long): Int = {
    val want = math.max(1L << 13, math.min(1L << 23, rows * 12))
    var m = 1L << 13
    while (m < want) m <<= 1
    m.toInt
  }

  private def bytesOf(v: Any): Array[Byte] = v match {
    case l: Long =>
      val b = new Array[Byte](8)
      var x = l; var i = 0
      while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
      b
    case s: String => s.getBytes(StandardCharsets.UTF_8)
  }

  /** Double hashing over two murmur3 seeds: bit_i = (h1 + i·h2) mod m.
    * Pure-Scala murmur3 is bit-stable across JVMs — the write job and
    * the planning-time lookup always agree. */
  private def setOrTest(words: Array[Long], mBits: Int, v: Any,
      set: Boolean): Boolean = {
    val b = bytesOf(v)
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(b, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(b, 0x85ebca6b) | 1
    var i = 0
    while (i < K) {
      val bit = (h1 + i * h2) & (mBits - 1) // mBits is a power of two
      if (set) words(bit >>> 6) |= 1L << (bit & 63)
      else if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def add(words: Array[Long], mBits: Int, v: Any): Unit = {
    setOrTest(words, mBits, v, set = true); ()
  }

  def mightContain(words: Array[Long], mBits: Int, v: Any): Boolean =
    setOrTest(words, mBits, v, set = false)

  /** Loaded index of one dir: file (dir-relative path) → column →
    * (bits, words). A file entry EXISTS for every file of the dir
    * (zero-row files carry empty column maps), so a missing column under
    * a present file means "no non-null value was ever added" — provably
    * empty for any literal. */
  final case class DirIndex(cols: Set[String],
      files: Map[String, Map[String, (Int, Array[Long])]])

  /**
   * Build the dir's bloom sidecar in ONE distributed job and write it
   * as `<dir>/.bloomidx.json`. `fileRows` are the footer row counts the
   * zone collection just produced (sizes each file's bitset). Returns
   * the indexed column names, or None when nothing was written (no
   * indexable columns / empty dir / job failure — all conservative:
   * readers simply don't bloom-prune this dir).
   */
  def build(spark: SparkSession, fs: FileSystem, dirPath: Path,
      schema: StructType, colsWanted: Set[String],
      fileRows: Map[String, Long]): Option[Seq[String]] = {
    val idxFields = schema.fields.filter(f =>
      colsWanted.contains(f.name.toLowerCase) && indexable(f.dataType))
    if (idxFields.isEmpty || fileRows.isEmpty) return None
    val names = idxFields.map(_.name.toLowerCase).toSeq
    // `/dirname/` is the unambiguous boundary in `_metadata.file_path`
    // regardless of URI scheme spelling (file:/ vs file:///)
    val marker = s"/${dirPath.getName}/"
    val sizes = fileRows.map { case (r, n) => r -> bitsFor(n) }
    try {
      val proj = col("_metadata.file_path") +:
        idxFields.toSeq.map(f => canonical(f))
      val df = spark.read.parquet(dirPath.toString).select(proj: _*)
      val bSizes = spark.sparkContext.broadcast(sizes)
      val nCols = names.length
      val merged: Array[((String, Int), Array[Long])] =
        df.rdd.mapPartitions { it =>
          val acc = mutable.HashMap[(String, Int), Array[Long]]()
          it.foreach { row =>
            val abs = row.getString(0)
            val cut = abs.indexOf(marker)
            if (cut >= 0) {
              val rel = abs.substring(cut + marker.length)
              val mBits = bSizes.value.getOrElse(rel, 0)
              if (mBits > 0) {
                var c = 0
                while (c < nCols) {
                  if (!row.isNullAt(c + 1)) {
                    val words = acc.getOrElseUpdate((rel, c),
                      new Array[Long](mBits >>> 6))
                    add(words, mBits, row.get(c + 1))
                  }
                  c += 1
                }
              }
            }
          }
          acc.iterator
        }.reduceByKey { (a, b) =>
          var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a
        }.collect()
      val byFile = merged.groupBy(_._1._1)
      val root = GraftCatalog.jsonMapper.createObjectNode()
      root.put("v", FormatVersion)
      root.put("k", K)
      val ca = root.putArray("cols")
      names.foreach(ca.add)
      val fn = root.putObject("files")
      // EVERY file gets an entry (empty cols = provably-empty bloom), so
      // readers can tell "file indexed, value absent" from "file unknown"
      fileRows.keys.toSeq.sorted.foreach { rel =>
        val fe = fn.putObject(rel)
        val cn = fe.putObject("cols")
        byFile.getOrElse(rel, Array.empty).foreach { case ((_, ci), words) =>
          val c = cn.putObject(names(ci))
          c.put("m", words.length << 6)
          val bytes = new Array[Byte](words.length * 8)
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          words.foreach(bb.putLong)
          c.put("b64", Base64.getEncoder.encodeToString(bytes))
        }
      }
      val out = fs.create(new Path(dirPath, FileName), true)
      try out.write(GraftCatalog.jsonMapper.writeValueAsBytes(root))
      finally out.close()
      Some(names)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // Sidecars are immutable once their dir lands; cache by manifest token
  // (a reused ordinal after rollback gets a fresh token). Crude size cap
  // keeps a long-lived driver bounded.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[DirIndex]]()

  def load(fs: FileSystem, dirPath: Path, token: String): Option[DirIndex] = {
    if (cache.size > 256) cache.clear()
    cache.computeIfAbsent(token, _ => loadUncached(fs, dirPath))
  }

  private def loadUncached(fs: FileSystem, dirPath: Path): Option[DirIndex] =
    try {
      val p = new Path(dirPath, FileName)
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val root = try GraftCatalog.jsonMapper.readTree(in) finally in.close()
      if (root.path("v").asInt(-1) != FormatVersion ||
          root.path("k").asInt(-1) != K) return None
      val cols = mutable.Set[String]()
      root.get("cols").forEach(n => cols += n.asText())
      val files = mutable.HashMap[String, Map[String, (Int, Array[Long])]]()
      val fn = root.get("files").asInstanceOf[ObjectNode]
      fn.fieldNames().forEachRemaining { rel =>
        val cn = fn.get(rel).get("cols").asInstanceOf[ObjectNode]
        val m = mutable.HashMap[String, (Int, Array[Long])]()
        cn.fieldNames().forEachRemaining { c =>
          val e = cn.get(c)
          val bytes = Base64.getDecoder.decode(e.get("b64").asText())
          val words = new Array[Long](bytes.length / 8)
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < words.length) { words(i) = bb.getLong; i += 1 }
          m += c -> (e.get("m").asInt(), words)
        }
        files += rel -> m.toMap
      }
      Some(DirIndex(cols.toSet, files.toMap))
    } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * Keep `rel` only if every applicable constraint admits at least one
   * literal. A file entry present but lacking the column has a
   * provably-empty bloom (only null values were written) — an equality
   * literal cannot match; a file UNKNOWN to the index is kept.
   */
  def fileMightMatch(di: DirIndex, rel: String,
      constraints: Seq[(String, Seq[Any])]): Boolean =
    di.files.get(rel) match {
      case None => true
      case Some(byCol) => constraints.forall { case (cn, vs) =>
        if (!di.cols.contains(cn)) true
        else byCol.get(cn) match {
          case None => false // indexed col, zero non-null values in file
          case Some((m, words)) => vs.exists(v => mightContain(words, m, v))
        }
      }
    }
}
