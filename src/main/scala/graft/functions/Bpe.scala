package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

/** Byte-pair encoding: a REAL subword tokenizer (train + encode), the
  * operator behind every "token count" a training-data pipeline reports.
  * q28d's regex token counter approximates tokenization; this is the
  * actual algorithm (Sennrich et al. 2016, the public GPT-2/tiktoken
  * family's core loop) with the standard large-scale split:
  *
  *   - TRAIN on a bounded, deterministically-selected sample, driver-side.
  *     The merge table is MODEL STATE — a few hundred string pairs — the
  *     same scale class as k-means centroids (q26c) or PQ codebooks
  *     (q26d), and the only thing that ever touches the driver. Production
  *     trains on a fixed sample too (tokenizers are trained once on ~GBs,
  *     not per-corpus); distributing the pair-count loop would buy nothing
  *     at the model sizes that matter here.
  *   - ENCODE distributed: the ranks map broadcasts, each partition
  *     applies merges locally (per-row CPU, zero shuffle — the Multimodal
  *     codec shape). Encoding is deterministic given the merge table, so
  *     results are identical on any cluster size.
  *
  * Determinism: the training tie-break is (max count, then lexicographic
  * pair), so the merge sequence is a pure function of the sample.
  */
object Bpe {

  /** Train `numMerges` merges on weighted words. Classic algorithm: words
    * are char sequences; repeatedly merge the most frequent adjacent
    * symbol pair (ties: lexicographically smallest pair) across the
    * corpus. Returns merges in rank order.
    */
  def train(wordFreq: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var words: Map[Vector[String], Long] =
      wordFreq.map { case (w, n) => w.map(_.toString).toVector -> n }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    while (i < numMerges) {
      val counts = mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- words; j <- 0 until syms.length - 1)
        counts.updateWith((syms(j), syms(j + 1)))(c => Some(c.getOrElse(0L) + n))
      if (counts.isEmpty) i = numMerges
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, n) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
              out += joined; j += 2
            } else { out += syms(j); j += 1 }
          }
          out.result() -> n
        }.groupMapReduce(_._1)(_._2)(_ + _)
        i += 1
      }
    }
    merges.toSeq
  }

  /** Encode one word: start from characters, repeatedly apply the
    * LOWEST-RANK applicable merge (the canonical BPE encode order — rank
    * order, not position order, is what makes encode match training).
    */
  def encode(word: String, rank: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue; var bestAt = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
          syms.drop(bestAt + 2)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** Deterministic bounded training sample: the `sampleDocs` lowest doc_ids,
    * each truncated to `sampleChars` chars — a pure function of the table,
    * so retraining on any cluster yields byte-identical merges.
    */
  def trainOnSample(df: DataFrame, sampleDocs: Int = 200, sampleChars: Int = 400,
      numMerges: Int = 150): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    val sample = df.select(col("doc_id"), substring(col("text"), 1, sampleChars).as("t"))
      .orderBy(col("doc_id")).limit(sampleDocs)
      .collect().map(_.getString(1)) // bounded: sampleDocs × sampleChars chars
    val freq = sample.iterator.flatMap(_.split(" ").iterator).filter(_.nonEmpty)
      .foldLeft(Map.empty[String, Long]) { (m, w) =>
        m.updated(w, m.getOrElse(w, 0L) + 1L)
      }
    train(freq, numMerges)
  }

  private val outSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_chars", LongType),
    StructField("n_tokens", LongType),
    StructField("ok", BooleanType)))

  /** Distributed encode of (doc_id, text): broadcast the merge ranks, apply
    * per partition, and emit the self-check the gate hashes — `ok` folds
    * (a) round-trip identity: concatenating the tokens of every word
    * rebuilds the exact text, (b) sanity: 1 ≤ tokens ≤ chars per non-empty
    * word, (c) determinism: encoding the word twice agrees. Token counts
    * travel alongside for the bench-visible payload.
    */
  def encodeBatch(df: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val rankMap = merges.zipWithIndex.toMap
    val bc = df.sparkSession.sparkContext.broadcast(rankMap)
    df.select("doc_id", "text").mapPartitions { it =>
      val rank = bc.value
      it.map { r =>
        val text = r.getString(1)
        val words = text.split(" ", -1)
        var nTokens = 0L
        var ok = true
        words.foreach { w =>
          if (w.nonEmpty) {
            val toks = encode(w, rank)
            nTokens += toks.length
            ok &&= toks.mkString == w && toks.length >= 1 && toks.length <= w.length
            ok &&= encode(w, rank) == toks
          }
        }
        Row(r.getLong(0), text.length.toLong, nTokens, ok)
      }
    }(enc)
  }
}
