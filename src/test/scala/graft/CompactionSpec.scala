package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S6 at scale, the WRITE side (q23c's missing half): updates land as an
  * append log and reads go through the keyed-latest view — but a log grows
  * forever, so periodically the view is COMPACTED into the base and the log
  * truncated, exactly what MERGE INTO does on a table format. The protocol
  * demonstrated here is the table-format commit sequence on plain parquet:
  *
  *   1. materialize the keyed-latest view to a STAGING dir (never overwrite
  *      a dir you are lazily reading — stage then swap),
  *   2. swap staging into the base,
  *   3. truncate the log.
  *
  * Invariants asserted: the compacted base is row-identical to the
  * pre-compaction serving view, and the serving view over (compacted base +
  * now-empty log) is unchanged — readers never observe the compaction.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def diff(a: DataFrame, b: DataFrame): Long =
    a.exceptAll(b).count() + b.exceptAll(a).count()

  test("S6 write side: MERGE-shaped compaction folds the append log into the base") {
    val root = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val baseDir = s"$root/base"; val logDir = s"$root/log"; val stage = s"$root/stage"

    // q23c's exact write shape: base snapshot (ver 0), then two update
    // waves APPENDED to the log — no point writes, no base rewrite
    val emp = queries.RelationalPipeline.employeeView(spark, sf)
    emp.select($"id", $"name", $"salary", lit(0L).as("ver"))
      .write.mode("overwrite").parquet(baseDir)
    emp.filter($"segment" === "BUILDING")
      .select($"id", $"name",
        ($"salary" + lit(1000L) * $"yearsofexp").as("salary"), lit(1L).as("ver"))
      .write.mode("append").parquet(logDir)
    emp.filter($"id" % 10 === 0)
      .select($"id", concat(lit("upd_"), $"name").as("name"),
        ($"salary" + lit(500L)).as("salary"), lit(2L).as("ver"))
      .write.mode("append").parquet(logDir)

    def servingView(): DataFrame = {
      val w = Window.partitionBy($"id").orderBy(desc("ver"))
      spark.read.parquet(baseDir).unionAll(spark.read.parquet(logDir))
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"id", $"name", $"salary", $"ver")
    }
    val before = servingView().cache()
    val nKeys = before.count()
    assert(nKeys == emp.count(), "view must hold exactly one row per key")

    // compact: stage → swap → truncate
    servingView().write.mode("overwrite").parquet(stage)
    spark.read.parquet(stage).write.mode("overwrite").parquet(baseDir)
    before.select($"id", $"name", $"salary", lit(-1L).as("ver")).limit(0)
      .write.mode("overwrite").parquet(logDir) // truncated, schema kept

    val compacted = spark.read.parquet(baseDir)
    assert(compacted.count() == nKeys)
    assert(diff(compacted, before) == 0,
      "compacted base must equal the pre-compaction serving view")
    assert(spark.read.parquet(logDir).isEmpty, "log must be truncated")
    assert(diff(servingView(), before) == 0,
      "readers must not observe the compaction")
    before.unpersist()
  }
}
