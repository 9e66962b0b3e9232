package graft

import java.nio.file.Files

import graft.sources.ModelStore

/** ModelStore (sources/ModelStore.scala): bit-exact round-trips and
  * version pinning for the bounded model-state tables the ANN/tokenizer
  * gates (q26e/q26f/q77b) serve from.
  */
class ModelStoreSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("centroids round-trip bit-exactly and load in index order") {
    val root = tmp("graft_ms_cent")
    val cents = IndexedSeq(
      Array(1.5f, -2.25f, Float.MinPositiveValue),
      Array(0f, 3.75f, 1e-30f))
    ModelStore.saveCentroids(spark, root, cents)
    val back = ModelStore.loadCentroids(spark, root)
    assert(back.length == 2)
    assert(back(0).toSeq == cents(0).toSeq && back(1).toSeq == cents(1).toSeq)
  }

  test("codebook round-trips with (mm, j) ordering intact") {
    val root = tmp("graft_ms_book")
    val book = Seq.tabulate(3)(mm => Seq.tabulate(4)(j =>
      Array(mm.toFloat, j.toFloat, mm * 10f + j)))
    ModelStore.saveCodebook(spark, root, book)
    val back = ModelStore.loadCodebook(spark, root)
    assert(back.map(_.map(_.toSeq)) == book.map(_.map(_.toSeq)))
  }

  test("merges keep training rank order") {
    val root = tmp("graft_ms_merge")
    val merges = Seq("a" -> "b", "ab" -> "c", "abc" -> "d")
    ModelStore.saveMerges(spark, root, merges)
    assert(ModelStore.loadMerges(spark, root) == merges)
  }

  test("a pinned version survives a later retrain; latest serves the retrain") {
    val root = tmp("graft_ms_pin")
    val v0 = ModelStore.saveCentroids(spark, root, Seq(Array(1f, 2f)))
    assert(v0.version == 0L)
    val v1 = ModelStore.saveCentroids(spark, root, Seq(Array(9f, 9f)))
    assert(v1.version == 1L)
    assert(ModelStore.loadCentroids(spark, root, Some(0L)).head.toSeq == Seq(1f, 2f))
    assert(ModelStore.loadCentroids(spark, root).head.toSeq == Seq(9f, 9f))
  }
}
