package graft

import org.apache.spark.sql.execution.ExplainMode

/** The 100 TB co-location story for the big equi-joins (SURVEY J1/Q5): both
  * sides bucketed on the join key ⇒ the join plans with ZERO Exchange.
  * At cluster scale this is the difference between "shuffle 100 TB" and
  * "shuffle nothing"; locally we assert the plan shape that proves it.
  */
class BucketingSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  // AQE explain prints the plan twice (Final + Initial); census the final
  private def finalPlan(p: String): String = p.split("== Initial Plan ==")(0)

  test("bucketed orders ⋈ customer plans with no shuffle on either side") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      Tables.customer(spark, sf).write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").saveAsTable("customer_b")
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(sum(col("o_totalprice")).as("t"))
      joined.collect()
      val p = joined.queryExecution.explainString(ExplainMode.fromString("simple"))
      // count Exchanges over the WHOLE final plan (a section-scoped scan
      // misses the join's second child): the only allowed shuffle is the
      // post-join aggregation's — neither join input may add one
      val nExchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan(p)).size
      assert(nExchanges <= 1, s"bucketed join must not shuffle either side:\n$p")
      assert("Bucketed: true".r.findAllIn(finalPlan(p)).size == 2,
        s"both scans must report bucketed reads:\n$p")
    } finally {
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("q30's dominant shuffle: bucketed lineitem ⋈ orders joins with no Exchange") {
    // The flagship (q30) moves lineitem on l_orderkey — at 100 TB that IS
    // the job's cost (RelationalPipeline.scala's q30 note). Stored bucketed
    // on the join key, the fact-fact join plans with zero Exchange: scans
    // feed SortMergeJoin directly, so only the post-join agg shuffles its
    // (much smaller) grouped frame.
    val wh = java.nio.file.Files.createTempDirectory("graft_wh30").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.lineitem(spark, sf).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b30").saveAsTable("orders_b30")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b30"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(sum(col("l_extendedprice")).as("rev"))
      joined.collect()
      val p = joined.queryExecution.explainString(ExplainMode.fromString("simple"))
      // whole-final-plan Exchange census, not a join-to-first-scan slice:
      // a shuffle under the SECOND join child must also fail the test
      val nExchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan(p)).size
      assert(nExchanges <= 1, s"bucketed fact-fact join must not shuffle either side:\n$p")
      assert("Bucketed: true".r.findAllIn(finalPlan(p)).size == 2,
        s"both scans must report bucketed reads:\n$p")
    } finally {
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.sql("DROP TABLE IF EXISTS orders_b30")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
