package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Event-log profiling runner (measurement tooling only — never the
  * recorded bench). Runs the GRAFT_BENCH_ONLY queries once each under a
  * session identical to [[Bench]]'s plus `spark.eventLog.enabled`, so
  * `tools/evlog_jobs.py` can attribute per-job wall time. Each query's
  * jobs are labeled `profile: <query>`.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (Bench contract),
  * GRAFT_BENCH_ONLY (comma-separated filter), GRAFT_EVLOG_DIR
  * (default /tmp/graft-evlog), GRAFT_PROFILE_RUNS (default 1).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val only = sys.env.get("GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val evDir = sys.env.getOrElse("GRAFT_EVLOG_DIR", "/tmp/graft-evlog")
    val nRuns = sys.env.get("GRAFT_PROFILE_RUNS").map(_.toInt).getOrElse(1)
    Files.createDirectories(Paths.get(evDir))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", evDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (n, fn) =>
        var i = 0
        while (i < nRuns) {
          spark.sparkContext.setJobDescription(s"profile: $n")
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            System.err.println(
              f"[profile] $n run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
          } catch { case e: Throwable =>
            System.err.println(s"[profile] FAILED $n: ${e.getMessage}")
          } finally {
            spark.sparkContext.setJobDescription(null)
            spark.catalog.clearCache()
          }
          i += 1
        }
      }
    graft.streaming.HttpIngestSource.stopAll()
    println(s"eventlog: $evDir/${spark.sparkContext.applicationId}")
    spark.stop()
  }
}
