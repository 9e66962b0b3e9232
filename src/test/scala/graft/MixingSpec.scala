package graft

import org.apache.spark.sql.functions._

/** Invariants for the training-batch assembly operators (q53/q54/q55)
  * beyond what their correctness gates hash-check.
  */
class MixingSpec extends SparkSpec {

  test("q54 packing: bins are contiguous from 0 and conserve every token") {
    val out = Registry.all("q54_pack_sequences").build(spark, sf).cache()
    // per (source, shard): bins are exactly 0..max with no gaps
    val gaps = out.groupBy(col("source"), col("shard"))
      .agg(min("bin").as("lo"), max("bin").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1)
    assert(gaps.isEmpty, "bin ids must be gapless per (source, shard)")
    // token conservation: packed totals == corpus totals
    val packed = out.agg(sum("n_tokens"), sum("n_docs")).head()
    val corpus = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(sum("t"), count(lit(1))).head()
    assert(packed.getLong(0) == corpus.getLong(0), "token counts must be conserved")
    assert(packed.getLong(1) == corpus.getLong(1), "every doc lands in exactly one bin")
    out.unpersist()
  }

  test("q55 mixture: the scarcest language keeps everything, others subsample") {
    val out = Registry.all("q55_mixture_sample").build(spark, sf).cache()
    val rows = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // exactly one language at rate 1.0 (the mix anchor) and it keeps all docs
    val anchors = rows.filter(_._4 == 1.0)
    assert(anchors.nonEmpty, "max-ratio language must have rate exactly 1.0")
    anchors.foreach { case (_, before, kept, _) => assert(kept == before) }
    // every language: 0 < rate <= 1 and kept <= before
    rows.foreach { case (lang, before, kept, rate) =>
      assert(rate > 0.0 && rate <= 1.0, s"$lang rate=$rate")
      assert(kept <= before, s"$lang kept more than it had")
    }
    out.unpersist()
  }

  test("q53 semdedup: contract booleans hold and drops reproduce run-to-run") {
    val a = Registry.all("q53_semdedup").build(spark, sf)
    val rows = a.collect()
    assert(rows.forall(_.getBoolean(2)), "subset_ok must hold for every vector")
    assert(rows.forall(_.getBoolean(3)), "recall_ok must hold (>=60% of exact drops)")
    assert(rows.exists(_.getBoolean(1)), "testdata has a non-empty exact drop set")
    // deterministic k-means + hash tiebreaks ⇒ bit-identical reruns
    val b = Registry.all("q53_semdedup").build(spark, sf).collect()
    assert(rows.sameElements(b), "semdedup must be deterministic across runs")
  }
}
