package graft

import org.apache.spark.sql.SparkSession

/**
 * Warehouse-class cost ATTRIBUTION (r17): for the slowest `catalog_*`
 * bench queries — each of which builds tables and commits multiple
 * snapshots inside the timed query — break the wall time down against
 * the commit-protocol metadata counters, so round-over-round warehouse
 * drift is attributable to a NAMED step (commit count, manifest bytes,
 * sidecar opens, driver footer reads) instead of "the subtotal grew".
 *
 * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.WarehouseAttrib"
 * Prints one JSON line per query plus a summary line; the driver-style
 * single-line-JSON contract lets scripts collect it like Bench output.
 */
object WarehouseAttrib {
  // the 10 slowest catalog queries of the r16 sf0.1 calm artifact, plus
  // catalog_avro_mor (the largest r14→r16 calm ratio, 1.38x — it gained
  // write-time avro data-stats collection in r15 and avro bloom sidecars
  // in r16, so its commit path does strictly more named work than r14)
  val Targets: Seq[String] = Seq(
    "catalog_cross_partition", "catalog_bucket_compact",
    "catalog_bucketed_join", "catalog_dv_bucket_fold",
    "catalog_dynamic_bucket", "catalog_stream_changelog_full",
    "catalog_rescale", "catalog_partitioned_bucket",
    "catalog_bucketed_mor", "catalog_dv_sequence", "catalog_avro_mor")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => }
    import graft.sources.{BloomIndex, FileStats, GraftCatalog}
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(3)
    val rows = Targets.map { name =>
      val fn = SparkEntry.queries(name)
      // min-of-N wall time like Bench; counters from the LAST run (the
      // per-run metadata work is identical — fresh warehouse each run).
      // Failed runs are excluded from the min and surface as "err" in
      // the JSON line (r18, ADVICE): a broken query's fast-fail wall
      // time must never masquerade as a fast attribution row.
      var mw = 0L; var mb = 0L; var zl = 0L; var bl = 0L; var fr = 0L
      var err: Option[String] = None
      val secs = (1 to runs).flatMap { _ =>
        spark.catalog.clearCache()
        val mw0 = GraftCatalog.manifestWritesGlobal.get()
        val mb0 = GraftCatalog.manifestBytesGlobal.get()
        val zl0 = GraftCatalog.zoneSidecarLoads.get()
        val bl0 = BloomIndex.sidecarLoads.get()
        val fr0 = FileStats.driverFooterReads.get()
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[attrib] $name failed: ${e.getMessage}")
          err = Some(Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\n\r\t]", " ").take(200))
          false }
        val sec = (System.nanoTime() - t0) / 1e9
        mw = GraftCatalog.manifestWritesGlobal.get() - mw0
        mb = GraftCatalog.manifestBytesGlobal.get() - mb0
        zl = GraftCatalog.zoneSidecarLoads.get() - zl0
        bl = BloomIndex.sidecarLoads.get() - bl0
        fr = FileStats.driverFooterReads.get() - fr0
        if (ok) Some(sec) else None
      }
      val sec = if (secs.nonEmpty) secs.min else -1.0
      val errField = err.map(m => s""","err":"$m"""").getOrElse("")
      println(s"""{"query":"$name","sec":$sec,"manifest_writes":$mw,""" +
        s""""manifest_bytes":$mb,"zone_sidecar_loads":$zl,""" +
        s""""bloom_sidecar_loads":$bl,"driver_footer_reads":$fr,""" +
        s""""bytes_per_manifest":${if (mw == 0) 0 else mb / mw}$errField}""")
      (name, sec, mw, mb)
    }
    val total = rows.map(_._2).sum
    val writes = rows.map(_._3).sum
    println(s"""{"metric":"warehouse_attrib_sec","value":$total,""" +
      s""""unit":"sec","n_queries":${rows.size},"manifest_writes":$writes,""" +
      s""""sf":"${sfDir.split('/').last}"}""")
    spark.stop()
  }
}
