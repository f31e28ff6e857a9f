package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Measurement tool (guide §1): runs named queries and reports, per query,
 * wall seconds vs SCHEDULED work — job / stage / task counts and summed
 * task time. A query whose summed task time is a small fraction of
 * wall × cores is bounded by fixed per-job overhead (launch, planning,
 * stage scheduling), not by data work — the optimization lever is then
 * FEWER actions/stages, not faster kernels. Dev tool only; the driver
 * uses Bench.
 *
 * Usage: sbt "runMain graft.JobProfile <sfDir> <query>..."
 */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
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
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val verbose = sys.env.get("SPARK_GRAFT_PROFILE_VERBOSE").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val cs = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          val nTasks = j.stageInfos.map(_.numTasks).sum
          println(s"[job] $cs stages=${j.stageInfos.size} tasks=$nTasks")
        }
        ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        Option(t.taskInfo).foreach(i => taskMs.addAndGet(i.duration))
        ()
      }
    })
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { run =>
        spark.catalog.clearCache()
        // let the listener bus drain so counters attribute to this run
        Thread.sleep(300)
        val (j0, s0, t0, m0) =
          (jobs.get(), stages.get(), tasks.get(), taskMs.get())
        val w0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - w0) / 1e9
        Thread.sleep(300)
        println(f"[jobprofile] $name run$run wall=$wall%.2fs " +
          f"jobs=${jobs.get - j0} stages=${stages.get - s0} " +
          f"tasks=${tasks.get - t0} taskTime=${(taskMs.get - m0) / 1e3}%.1fs " +
          f"(parallel-occupancy ${(taskMs.get - m0) / 1e3 / (wall * cpus.toInt) * 100}%.0f%%)")
      }
    }
    spark.stop()
  }
}
