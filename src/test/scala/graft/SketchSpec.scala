package graft

import org.apache.spark.sql.functions._

/** Pins the q15b serving-path contract. The gate's exact `percentile`
  * buffers every group's values — fine at oracle scale, an executor OOM at
  * 100 TB — so the serving path is `approx_percentile` (Greenwald-Khanna
  * quantile sketch: bounded memory, mergeable map-side combine). This spec
  * states the error that makes the sketch safe to substitute: with
  * accuracy A the sketch guarantees rank error ≤ 1/A, so the approx value
  * at quantile p must fall inside the exact value envelope
  * [percentile(p−ε), percentile(p+ε)] with ε = 100/A — a 100× margin on
  * the guarantee, still tight enough to catch a broken sketch.
  *
  * Runs at sf0.1 (150k orders, the driver's bench SF) so the per-group
  * envelopes are dense enough for the bound to bite.
  */
class SketchSpec extends SparkSpec {
  test("q15b serving path: approx_percentile inside the exact p±0.01 envelope for p∈{.25,.5,.75,.9}") {
    val dir = "/root/testdata/sf0.1"
    val acc = 10000 // guaranteed rank error ≤ 1/acc = 1e-4
    val eps = 0.01  // envelope half-width: 100× the guarantee
    val ps = Seq(0.25, 0.5, 0.75, 0.9)
    def arr(xs: Seq[Double]) = xs.mkString("array(", ",", ")")
    val lo = ps.map(p => math.max(0.0, p - eps))
    val hi = ps.map(p => math.min(1.0, p + eps))
    val rows = Tables.orders(spark, dir)
      .withColumn("v", Canon.cents(col("o_totalprice")))
      .groupBy(col("o_orderstatus"))
      .agg(
        expr(s"percentile(v, ${arr(lo)})").as("exact_lo"),
        expr(s"percentile(v, ${arr(hi)})").as("exact_hi"),
        expr(s"approx_percentile(v, ${arr(ps)}, $acc)").as("approx"),
        count(lit(1)).as("n"))
      .collect()
    assert(rows.length == 3, s"orders has 3 statuses at sf0.1, got ${rows.length}")
    rows.foreach { r =>
      val status = r.getString(0)
      val exLo = r.getSeq[Double](1)
      val exHi = r.getSeq[Double](2)
      val ap = r.getSeq[Long](3) // approx_percentile returns the input type
      val n = r.getLong(4)
      assert(n > 10000, s"group $status must be dense enough to test: $n")
      ps.indices.foreach { i =>
        assert(ap(i) >= exLo(i) && ap(i) <= exHi(i),
          f"status=$status p=${ps(i)} approx=${ap(i)} outside exact envelope " +
            f"[${exLo(i)}%.1f, ${exHi(i)}%.1f]")
      }
    }
  }

  test("q46 frequent-items sketch: merge-order independent and exact under capacity") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val words = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("w"))
    def topk(parts: Int): Seq[(String, Long)] =
      words.repartition(parts)
        .agg(expr("approx_top_k(w, 20, 1024)").as("tk"))
        .select(explode($"tk").as("e"))
        .select($"e.item", $"e.count").as[(String, Long)]
        .collect().sortBy(p => (-p._2, p._1)).toSeq
    // partial sketches merge in whatever order tasks finish — under
    // capacity (31 distinct << 1024) the merged sketch must be the exact
    // multiset regardless of partitioning
    val one = topk(1)
    assert(one == topk(13), "sketch must not depend on partition layout")
    val exact = words.groupBy($"w").count().as[(String, Long)]
      .collect().sortBy(p => (-p._2, p._1)).take(20).toSeq
    assert(one == exact, s"under-capacity sketch must be exact:\n$one\nvs\n$exact")
  }

  test("q15d probe: cms_estimate honors the one-sided error bound on every key, both key types") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.install(spark)
    val eps = 0.001
    val words = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("w"))
      .withColumn("wid", xxhash64($"w"))
    val n = words.count()
    val slack = math.ceil(eps * n).toLong
    for (keyCol <- Seq("w", "wid")) {
      val sk = words.select(
        expr(s"count_min_sketch($keyCol, ${eps}d, 0.999d, 7)").as("sk"))
        .head.getAs[Array[Byte]](0)
      val bad = words.groupBy(col(keyCol)).agg(count(lit(1)).as("exact"))
        .withColumn("est", call_function("cms_estimate", col(keyCol), lit(sk)))
        .filter($"est" < $"exact" || $"est" > $"exact" + lit(slack))
        .count()
      assert(bad == 0L, s"cms_estimate($keyCol) broke exact<=est<=exact+$slack on $bad keys")
    }
    // the probe and the sketch must agree across a repartition (merge path)
    val sk13 = words.repartition(13).select(
      expr(s"count_min_sketch(w, ${eps}d, 0.999d, 7)").as("sk"))
      .head.getAs[Array[Byte]](0)
    val sk1 = words.repartition(1).select(
      expr(s"count_min_sketch(w, ${eps}d, 0.999d, 7)").as("sk"))
      .head.getAs[Array[Byte]](0)
    val keys = words.select($"w").distinct().orderBy($"w")
    val probe13 = keys.select(
      call_function("cms_estimate", $"w", lit(sk13)).as("e")).as[Long].collect()
    val probe1 = keys.select(
      call_function("cms_estimate", $"w", lit(sk1)).as("e")).as[Long].collect()
    assert(probe13.sameElements(probe1),
      "CMS counters must be partition-layout independent (pure adds merge exactly)")
  }
}
