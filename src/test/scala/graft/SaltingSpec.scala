package graft

import graft.functions.Salting
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // skew: one key owns 50k rows, the rest are uniform
    val fact = spark.range(0, 60000).toDF("row_id")
      .withColumn("k", when($"row_id" < 50000, lit(7L)).otherwise($"row_id" % 100))
      .withColumn("v", $"row_id" * 3)
    val dim = spark.range(0, 100).toDF("dk").withColumn("dv", $"dk" * 10)

    val plain = fact.join(dim, $"k" === $"dk")
      .select($"row_id", $"k", $"v", $"dv")
    val salted = Salting.saltedJoin(fact, dim, "k", "dk", $"row_id", salts = 8)
      .select($"row_id", $"k", $"v", $"dv")

    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("AQE splits a skewed join partition at runtime (OptimizeSkewedJoin)") {
    // The no-code-change alternative to manual salting: AQE detects the
    // oversized shuffle partition from runtime stats and splits it across
    // tasks. Thresholds are lowered so the ~50k-row hot key trips the
    // detector at test scale; at 100 TB the defaults (256 MB / factor 5)
    // play the same role. Broadcast is disabled to force the shuffle join —
    // on a real skewed fact⋈fact join neither side broadcasts.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val fact = spark.range(0, 60000).toDF("row_id")
        .withColumn("k", when($"row_id" < 50000, lit(7L)).otherwise($"row_id" % 100))
      val dim = spark.range(0, 20000).toDF("dk").withColumn("dv", $"dk" % 100)
      val joined = fact.join(dim, $"k" === $"dk")
      // execute THIS frame (count() would plan a different query) so the
      // adaptive plan is final when inspected
      assert(joined.collect().length == 60000) // dk unique: 1 dim row per fact row
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE should mark the skewed join (got:\n$finalPlan)")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
