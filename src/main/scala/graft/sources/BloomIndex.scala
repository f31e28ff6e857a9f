package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

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
 * committed dir. Executors hash the indexed columns of their splits
 * into per-file bitsets (sized from the footer row counts), a single
 * shuffle OR-merges partial bitsets per file, and THE EXECUTOR THAT
 * HOLDS EACH FILE'S MERGED BITSETS WRITES THAT FILE'S SIDECAR —
 * `<dir>/.bloomidx/<relpath>.json`, dot-prefixed so parquet discovery
 * never sees it, inside the staging dir so the ordinal claim-rename
 * moves data and index atomically. No bitset ever crosses to the
 * driver (a bulk load landing 10⁵ files × 1 MiB/col would otherwise
 * collect tens of GiB — the same flaw class as a driver-side footer
 * pass); the job's only driver-visible result is the count of sidecars
 * written, and [[driverBitsetBytes]] stays 0 as the tripwire tests
 * assert. Paimon likewise writes per-file index files, consulted
 * lazily by SnapshotReader.
 *
 * Read side is strictly conservative and LAZY: planning loads only the
 * sidecars of files a query's zone/partition-admitted candidates name
 * ([[sidecarLoads]] counts opens), cached per (token, file). A file is
 * dropped only when EVERY literal of some conjunctive equality/IN
 * constraint on an indexed column is PROVABLY absent (bloom filters
 * have no false negatives). Unknown columns, non-equality shapes,
 * unreadable sidecars keep the file. Deletion vectors compose (deletes
 * only shrink a file's value set). Hashing uses the same canonical
 * domains as the zone evaluator (integral/date/timestamp → Long,
 * string → UTF-8 String), computed by the SAME JVM code on both sides,
 * so write/read hashes always agree.
 */
private[graft] object BloomIndex {

  val OptionKey = "file-index.bloom-filter.columns"

  /** Sidecar directory inside each data dir; the leading dot hides the
    * whole subtree from parquet discovery. One JSON per data file. */
  val DirName = ".bloomidx"
  val FormatVersion = 2

  /** Hash-function count. With ~12 bits/key, k=5 gives FPP ≈ 0.5%. */
  val K = 5

  /** Bytes of bitset materialized ON THE DRIVER during builds. The
    * executor-write design keeps this 0; tests assert it (the analog of
    * FileStats.driverFooterReads). */
  val driverBitsetBytes = new AtomicLong(0L)

  /** Per-file sidecar opens at planning time — lazy loading means a
    * query pays O(admitted files), not O(table). */
  val sidecarLoads = new AtomicLong(0L)

  /** High-water mark of concurrent sidecar loads — lets tests assert the
    * batch probe path actually overlaps its FS opens. */
  val peakConcurrentLoads = new AtomicLong(0L)
  private val inflightLoads = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Driver-side pool for batch sidecar probes. Sidecar opens are
    * latency-bound (small files, object-store round-trips), so a bounded
    * pool turns an O(files) serial planning stall into O(files /
    * parallelism); CPU cost is negligible. Daemon threads, shared across
    * queries, never shut down. */
  private val ProbeParallelism = 16
  private lazy val probePool = java.util.concurrent.Executors.newFixedThreadPool(
    ProbeParallelism,
    (r: Runnable) => {
      val t = new Thread(r, "bloom-sidecar-probe")
      t.setDaemon(true)
      t
    })

  def sidecarPath(dirPath: Path, rel: String): Path =
    new Path(dirPath, s"$DirName/$rel.json")

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

  /** One file's loaded index: column → (bits, words). A sidecar EXISTS
    * for every file of an indexed dir (zero-row / all-null files carry
    * empty column maps), so a missing column in a present sidecar means
    * "no non-null value was ever added" — provably empty for any
    * literal; a missing sidecar means "unknown", kept conservatively. */
  final case class FileBloom(cols: Map[String, (Int, Array[Long])])

  /**
   * Build the dir's bloom sidecars in ONE distributed job: per-split
   * partial bitsets → one shuffle OR-merge per file → the holding
   * executor writes `<dir>/.bloomidx/<rel>.json`. `fileRows` are the
   * footer row counts the zone collection just produced (sizes each
   * file's bitset). Every file in `fileRows` gets a sidecar — files
   * whose indexed columns are entirely null get an empty one, which is
   * the "provably empty" marker readers rely on. Returns the indexed
   * column names, or None when nothing was written (no indexable
   * columns / empty dir / job failure — all conservative: readers
   * simply don't bloom-prune this dir).
   */
  def build(spark: SparkSession, fs: FileSystem, dirPath: Path,
      schema: StructType, colsWanted: Set[String],
      fileRows: Map[String, Long],
      // Spark source provider of the dir's data files (r16: bloom
      // indexes are format-independent — the build needs only
      // `_metadata.file_path` plus the indexed columns, and `fileRows`
      // comes from the same zone collection that serves orc footers and
      // avro data-derived stats)
      provider: String = "parquet"): Option[Seq[String]] = {
    val idxFields = schema.fields.filter(f =>
      colsWanted.contains(f.name.toLowerCase) && indexable(f.dataType))
    if (idxFields.isEmpty || fileRows.isEmpty) return None
    val names = idxFields.map(_.name.toLowerCase).toSeq
    // `/dirname/` is the unambiguous boundary in `_metadata.file_path`
    // regardless of URI scheme spelling (file:/ vs file:///)
    val marker = s"/${dirPath.getName}/"
    val sizes = fileRows.map { case (r, n) => r -> bitsFor(n) }
    try {
      val sc = spark.sparkContext
      val proj = col("_metadata.file_path") +:
        idxFields.toSeq.map(f => canonical(f))
      val df = spark.read.format(provider).load(dirPath.toString)
        .select(proj: _*)
      val bSizes = sc.broadcast(sizes)
      val confB = sc.broadcast(new FileStats.SerConf(sc.hadoopConfiguration))
      val dirStr = dirPath.toString
      val nCols = names.length
      // Per-split partial bitsets, keyed by file: Map(colIdx -> words).
      val partial = df.rdd.mapPartitions { it =>
        val acc = mutable.HashMap[String, mutable.HashMap[Int, Array[Long]]]()
        it.foreach { row =>
          val abs = row.getString(0)
          val cut = abs.indexOf(marker)
          if (cut >= 0) {
            val rel = abs.substring(cut + marker.length)
            val mBits = bSizes.value.getOrElse(rel, 0)
            if (mBits > 0) {
              val byCol = acc.getOrElseUpdate(rel, mutable.HashMap())
              var c = 0
              while (c < nCols) {
                if (!row.isNullAt(c + 1)) {
                  val words = byCol.getOrElseUpdate(c,
                    new Array[Long](mBits >>> 6))
                  add(words, mBits, row.get(c + 1))
                }
                c += 1
              }
            }
          }
        }
        acc.iterator.map { case (rel, m) => rel -> m.toMap }
      }
      // Seed every file with an empty map so all-null / zero-row files
      // still land a (provably-empty) sidecar.
      val seeds = sc.parallelize(fileRows.keys.toSeq,
        math.max(1, math.min(fileRows.size, 32)))
        .map(rel => rel -> Map.empty[Int, Array[Long]])
      // One shuffle: OR-merge partials per file; the reducer that ends
      // up holding a file's bitsets writes its sidecar right there.
      val written = partial.union(seeds).reduceByKey { (a, b) =>
        if (a.isEmpty) b
        else if (b.isEmpty) a
        else {
          val out = mutable.HashMap[Int, Array[Long]]() ++= a
          b.foreach { case (ci, w) =>
            out.get(ci) match {
              case Some(ex) =>
                var i = 0; while (i < ex.length) { ex(i) |= w(i); i += 1 }
              case None => out += ci -> w
            }
          }
          out.toMap
        }
      }.map { case (rel, byCol) =>
        val conf = confB.value.value
        val target = sidecarPath(new Path(dirStr), rel)
        val fsx = target.getFileSystem(conf)
        val root = GraftCatalog.jsonMapper.createObjectNode()
        root.put("v", FormatVersion)
        root.put("k", K)
        val cn = root.putObject("cols")
        byCol.toSeq.sortBy(_._1).foreach { case (ci, words) =>
          val c = cn.putObject(names(ci))
          c.put("m", words.length << 6)
          val bytes = new Array[Byte](words.length * 8)
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          words.foreach(bb.putLong)
          c.put("b64", Base64.getEncoder.encodeToString(bytes))
        }
        val out = fsx.create(target, true)
        try out.write(GraftCatalog.jsonMapper.writeValueAsBytes(root))
        finally out.close()
        1L
      }.fold(0L)(_ + _)
      if (written == fileRows.size.toLong) Some(names) else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // Sidecars are immutable once their dir lands; cache per (manifest
  // token, file) — a reused ordinal after rollback gets a fresh token.
  // The size cap is enforced BETWEEN batches only (in
  // [[filterMightMatch]], before the warm): evicting inside loadFile
  // would let a batch warm larger than the cap thrash the very cache it
  // is warming, and the sequential decision pass after the warm would
  // reload evicted sidecars serially — the O(files) planning stall the
  // batch path exists to avoid. A single oversized batch may transiently
  // exceed the cap; the next batch's entry check reclaims it.
  private val CacheCap = 4096
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Option[FileBloom]]()

  def loadFile(fs: FileSystem, dirPath: Path, token: String,
      rel: String): Option[FileBloom] =
    cache.computeIfAbsent((token, rel), _ => loadFileUncached(fs, dirPath, rel))

  private def loadFileUncached(fs: FileSystem, dirPath: Path,
      rel: String): Option[FileBloom] =
    try {
      sidecarLoads.incrementAndGet()
      val cur = inflightLoads.incrementAndGet()
      peakConcurrentLoads.getAndUpdate(p => math.max(p, cur))
      try loadFileBody(fs, dirPath, rel)
      finally inflightLoads.decrementAndGet()
    } catch { case scala.util.control.NonFatal(_) => None }

  private def loadFileBody(fs: FileSystem, dirPath: Path,
      rel: String): Option[FileBloom] =
    try {
      val p = sidecarPath(dirPath, rel)
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val root = try GraftCatalog.jsonMapper.readTree(in) finally in.close()
      if (root.path("v").asInt(-1) != FormatVersion ||
          root.path("k").asInt(-1) != K) return None
      val cn = root.get("cols")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
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
      Some(FileBloom(m.toMap))
    } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * Keep `rel` only if every applicable constraint admits at least one
   * literal. A sidecar present but lacking the column has a
   * provably-empty bloom (only null values were written) — an equality
   * literal cannot match; a file with NO sidecar is kept.
   */
  def fileMightMatch(fs: FileSystem, dirPath: Path, token: String,
      indexedCols: Set[String], rel: String,
      constraints: Seq[(String, Seq[Any])]): Boolean =
    loadFile(fs, dirPath, token, rel) match {
      case None => true // missing / unreadable sidecar: conservative keep
      case Some(fb) => constraints.forall { case (cn, vs) =>
        if (!indexedCols.contains(cn)) true
        else fb.cols.get(cn) match {
          case None => false // indexed col, zero non-null values in file
          case Some((m, words)) => vs.exists(v => mightContain(words, m, v))
        }
      }
    }

  /**
   * Batch [[fileMightMatch]] over many files of one dir: uncached
   * sidecars are loaded through [[probePool]] (bounded concurrency, so a
   * 10⁵-file candidate set costs O(files / 16) object-store round-trips
   * of planning latency instead of O(files) serial opens), then the
   * per-file decision runs against the warmed (token, file) cache with
   * semantics identical to the sequential path. Returns kept rels in
   * input order.
   */
  def filterMightMatch(fs: FileSystem, dirPath: Path, token: String,
      indexedCols: Set[String], rels: Seq[String],
      constraints: Seq[(String, Seq[Any])]): Seq[String] = {
    var missing = rels.filterNot(r => cache.containsKey((token, r)))
    if (missing.nonEmpty && cache.size + missing.size > CacheCap) {
      cache.clear() // between-batch eviction: everything must re-warm
      missing = rels
    }
    if (missing.size > 1) {
      val tasks = new java.util.ArrayList[java.util.concurrent.Callable[Unit]](missing.size)
      missing.foreach { r =>
        tasks.add(() => { loadFile(fs, dirPath, token, r); () })
      }
      probePool.invokeAll(tasks) // blocks until all sidecars are cached
    }
    rels.filter(r => fileMightMatch(fs, dirPath, token, indexedCols, r, constraints))
  }
}
