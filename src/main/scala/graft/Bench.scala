package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle partitions are sized with the DATA, not the thread count:
    // at 10x+ scale factors 32 partitions make individual tasks 10x
    // bigger (GC pressure, spill risk) exactly as an undersized
    // spark.sql.shuffle.partitions would on a real cluster.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // Ablation knob (r17, diagnostic only): SPARK_GRAFT_NO_EXTENSIONS=1
    // benches WITHOUT the GraftExtensions rules, isolating per-action
    // plan-time costs (stats pin, zone/bloom prune, runtime-filter
    // estimation) from execution cost. Catalog/SQL queries that need
    // the extensions will fail under it — use with SPARK_GRAFT_ONLY.
    val noExt = sys.env.get("SPARK_GRAFT_NO_EXTENSIONS").contains("1")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    val spark = (if (noExt) b0
      else b0.config("spark.sql.extensions", "graft.plans.GraftExtensions"))
      // Let AQE re-plan partitioning INSIDE cached subplans: the dedup
      // family persists small intermediates (simhash families, band
      // tables), and without this flag those pin the static shuffle
      // count — at SPARK_GRAFT_SHUFFLE=128 that made simhash 2.6× slower
      // than shuffle=32 purely from tiny-task overhead. With it, AQE
      // coalesces the small cached shuffles and the knob stops mattering.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT + codegen + parquet footer caches, so the first
    // timed query isn't charged for JVM cold start.
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => }
    // Optional local-iteration filter: SPARK_GRAFT_ONLY=q1,q2 benches a
    // subset. Unset (the driver's path) benches the full registry.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // min of N runs (default 3): single-shot times on this container are
    // dominated by co-tenant load / stage-scheduling jitter (observed
    // 64-114 s totals for identical code); the min is the reproducible
    // steady-state cost, and N=3 makes a >2x round-over-round delta a
    // decidable regression rather than a possible one-sample stall.
    // Each run still executes the full plan from the parquet scan up -
    // caches are cleared before every run, nothing is reused between them.
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(3)
    val results = selected.map { case (name, fn) =>
      val secs = (1 to runs).map { _ =>
        // isolate queries: drop persisted intermediates from earlier queries
        // so later ones aren't taxed by cache memory pressure
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // toRdd forces the full physical plan (sorts, all projected columns);
        // a plain count() would let Catalyst prune the very work being timed
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> secs.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Two subtotals so round-over-round drift is attributable per class:
    // `catalog_*` queries build a warehouse INSIDE the timed query
    // (create tables, commit snapshots, stream micro-batches) — their
    // cost is commit-protocol work; everything else is the pure
    // read/compute path whose trend should track the scan+shuffle
    // engine alone.
    val (wh, rp) = results.partition(_._1.startsWith("catalog_"))
    val whSec = wh.map(_._2).sum
    val rpSec = rp.map(_._2).sum
    // FIXED 32-query headline subset (frozen at round 13): one stable,
    // family-representative bar that registry growth can never move —
    // round-over-round comparisons use headline_sec; the full total only
    // tracks coverage. Do NOT edit this list; add new queries to the
    // registry, not here.
    val headline = Set(
      "q1_agg", "q3_shipping", "q6_forecast", "q9_product_profit",
      "q18_large_orders",
      "scan_filter_compound", "scan_projection", "topn",
      "join_shuffle", "join_broadcast", "join_asof", "join_runtime_filter",
      "agg_rollup", "window_ranks", "window_running",
      "dedup_exact", "dedup_minhash", "dedup_substring_spans", "dedup_clusters",
      "text_quality", "text_tokens", "text_tfidf",
      "ann_scalable", "ann_indexed",
      "pipeline_pack_sequences", "pipeline_shuffle_shards",
      "catalog_upsert_mor", "catalog_sql_mor", "catalog_bucketed_join",
      "catalog_dynamic_bucket", "catalog_stream_changelog",
      "media_dedup_dhash")
    val hl = results.filter(r => headline.contains(r._1))
    val hlSec = hl.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""subtotals":{"warehouse_catalog":$whSec,"read_path":$rpSec,""" +
        s""""n_warehouse":${wh.size},"n_read_path":${rp.size},""" +
        s""""headline_sec":$hlSec,"n_headline":${hl.size}},"sf":"$sfDir"}"""
    println(line)
    // Also persist to a file: the driver captures stdout's tail, which a
    // 130-query JSON line can overrun (BENCH_r07 was truncated mid-stream
    // and unparseable). The file is the durable copy of the same line.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, line + "\n")
    // Short trailing headline: even if a capture truncates the long JSON
    // line above, the tail still carries the round's key numbers.
    println(f"[bench-summary] queries=${results.size} total_sec=$total%.1f " +
      f"warehouse_sec=$whSec%.1f read_path_sec=$rpSec%.1f " +
      f"headline_sec=$hlSec%.1f(n=${hl.size}) runs=$runs sf=$sfDir")
    spark.stop()
  }
}
