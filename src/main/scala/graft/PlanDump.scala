package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for declared queries to files — the
  * optimization-round evidence artifact (`plans/rNN/<query>_{before,after}.txt`).
  * Session config matches [[Bench]] so the captured plans are the plans the
  * bench actually times. Gate-style queries execute their build machinery as
  * a side effect of constructing the returned frame; the captured plan is
  * the final declared output's.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (Bench contract),
  * GRAFT_PLAN_DIR (default plans/r20), GRAFT_PLAN_SUFFIX (default before),
  * GRAFT_PLAN_ONLY (comma-separated query filter).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val outDir = sys.env.getOrElse("GRAFT_PLAN_DIR", "plans/r20")
    val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "before")
    val only = sys.env.get("GRAFT_PLAN_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      // local-FS file listing: a parallel-discovery JOB costs ~300 ms of
      // scheduling for path counts a serial local listing covers in
      // single-digit ms (measured: q110b paid 4 listing jobs x 280 ms for
      // 186 dirs). Local default only — on object stores at real scale
      // the parallel listing earns its keep, so deployments tune this per
      // storage (spark.sql.sources.parallelPartitionDiscovery.threshold).
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (n, fn) =>
        spark.sparkContext.setJobDescription(s"plandump: $n")
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            ExplainMode.fromString("formatted"))
          Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), txt)
          System.err.println(s"[plandump] wrote $n")
        } catch { case e: Throwable =>
          Files.writeString(Paths.get(outDir, s"${n}_$suffix.ERROR.txt"),
            Option(e.getMessage).getOrElse(e.getClass.getName))
          System.err.println(s"[plandump] FAILED $n: ${e.getMessage}")
        } finally spark.catalog.clearCache()
      }
    graft.streaming.HttpIngestSource.stopAll()
    spark.stop()
  }
}
