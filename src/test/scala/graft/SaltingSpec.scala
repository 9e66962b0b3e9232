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
}
