package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** BPE tokenizer: the classic worked example (Sennrich et al. 2016 §3.2's
  * corpus shape), encode–train consistency, and cluster-size independence
  * of the distributed encode.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus =
    Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("training reproduces the textbook merge sequence") {
    val merges = Bpe.train(corpus, 4)
    // pair counts: (e,s)=9 (s,t)=9 (l,o)=7 (o,w)=7 …; ties break
    // lexicographically, so the sequence is fully determined
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")),
      s"unexpected merges: $merges")
  }

  test("encode applies merges in rank order: lowest -> [low, est]") {
    val rank = Bpe.train(corpus, 4).zipWithIndex.toMap
    assert(Bpe.encode("lowest", rank) == Vector("low", "est"))
    assert(Bpe.encode("newest", rank) == Vector("n", "e", "w", "est"))
    // unseen characters survive as singletons, round-trip intact
    assert(Bpe.encode("xyz", rank) == Vector("x", "y", "z"))
    assert(Bpe.encode("", rank).isEmpty || Bpe.encode("", rank) == Vector(""))
  }

  test("distributed encode is partition-independent and self-checks green") {
    val docs = (0L until 64L)
      .map(i => (i, s"newest lower widest low repeated$i lowest"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(corpus, 4)
    val one = Bpe.encodeBatch(docs.repartition(1), merges)
      .orderBy("doc_id").collect().toSeq
    val many = Bpe.encodeBatch(docs.repartition(13), merges)
      .orderBy("doc_id").collect().toSeq
    assert(one == many, "encode depends on partitioning")
    assert(one.forall(_.getBoolean(3)), "self-check failed on some doc")
    // "newest lower widest low … lowest" = 4+3+4+1(+1 word)+2 tokens
    val toks = one.head.getLong(2)
    assert(toks > 0 && toks < one.head.getLong(1), "no compression")
  }

  test("q77 gate: trained tokenizer compresses the corpus and self-checks") {
    val out = Registry.all("q77_bpe_tokenize").build(spark, sf)
    assert(out.filter(!col("ok")).isEmpty, "gate self-check has false rows")
  }
}
