package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch assembly extensions over `documents`: deterministic
  * sequence packing (q54) and mixture reweighting (q55) — the two
  * operations that turn a filtered corpus into an actual training feed.
  *
  * Reference context: none (north-star surface; the reference's only
  * "batching" is one row per HTTP POST, Random/main.go:101-123).
  */
object Mixing {
  private def $(name: String) = col(name)

  val defs: Map[String, QueryDef] = Map(

    // Q54 [extension: sequence packing] Pack documents into fixed-size
    // token windows (the pre-tokenization step of every LLM trainer: docs
    // are concatenated and sliced into B-token sequences; a doc straddling
    // a boundary spills into the next bin). Packing is a running sum — a
    // serial fold — so the scalable unit is the (source, shard) group:
    // shard = doc_id range. Each group packs independently with a window
    // over its own ordered docs; parallelism = #groups (at 100 TB, tens of
    // thousands), the cost is one partial bin per shard boundary, and the
    // assignment is reproducible on any cluster size because it depends
    // only on (source, doc_id order), never on task scheduling. One
    // shuffle on the group key; bin stats come from the same hash agg.
    "q54_pack_sequences" -> QueryDef(
      build = (s, d) => {
        val binTokens = 256; val shardDocs = 250
        val w = Window.partitionBy($("source"), $("shard")).orderBy($("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.documents(s, d)
          .select($("source"), $("doc_id"),
            size(split($("text"), " ")).cast("long").as("n_tok"))
          .withColumn("shard", floor($("doc_id") / shardDocs))
          .withColumn("start_off", coalesce(sum($("n_tok")).over(w), lit(0L)))
          .withColumn("bin", floor($("start_off") / binTokens))
          .groupBy($("source"), $("shard"), $("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum($("n_tok")).as("n_tokens"),
            min($("doc_id")).as("first_doc"),
            max($("doc_id")).as("last_doc"))
          .orderBy($("source"), $("shard"), $("bin"))
      },
      oracle = Some(
        """WITH t AS (
          |  SELECT source, doc_id,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          |    doc_id // 250 AS shard
          |  FROM documents),
          |o AS (
          |  SELECT *, CAST(COALESCE(sum(n_tok) OVER (
          |      PARTITION BY source, shard ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
          |  FROM t)
          |SELECT source, shard, start_off // 256 AS bin,
          |  count(*) AS n_docs,
          |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
          |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
          |FROM o GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
      headline = true),

    // Q55 [extension: mixture reweighting] Deterministic downsampling to a
    // target language mix (the Pile/CC-style blend step): the most
    // underrepresented language (max target-weight/corpus-share ratio)
    // keeps 100% of its docs, every other language keeps
    // rate = ratio/max_ratio of its docs by hash-mod — the exact same
    // reproducible keep-set on any cluster size (df.sample is not). The
    // per-language shares are a tiny broadcast frame; the filter is a pure
    // per-row predicate, so the whole reweighting is one scan + one
    // 5-group agg at any corpus size. Doubles cross-check exactly: both
    // engines compute the identical IEEE754 expression tree from the same
    // integer counts and weight literals.
    "q55_mixture_sample" -> QueryDef(
      build = (s, d) => {
        val wt = element_at(
          map(lit("en"), lit(0.40), lit("de"), lit(0.20), lit("es"), lit(0.15),
            lit("fr"), lit(0.15), lit("zh"), lit(0.10)), $("lang"))
        val docs = Tables.documents(s, d).select($("doc_id"), $("lang"))
        val total = docs.agg(count(lit(1)).as("n_total"))
        val byLang = docs.groupBy($("lang")).agg(count(lit(1)).as("n_before"))
          .crossJoin(broadcast(total))
          .withColumn("ratio", wt / ($("n_before") / $("n_total")))
        val maxRatio = byLang.agg(max($("ratio")).as("max_ratio"))
        val rated = byLang.crossJoin(broadcast(maxRatio))
          .select($("lang"), $("n_before"), ($("ratio") / $("max_ratio")).as("rate"))
        val kept = docs.join(broadcast(rated.select($("lang"), $("rate"))), "lang")
          .filter(pmod($("doc_id") * 2654435761L, lit(1000000)) < $("rate") * 1000000)
          .groupBy($("lang")).agg(count(lit(1)).as("n_kept"))
        rated.join(kept, Seq("lang"), "left")
          .select($("lang"), $("n_before"),
            coalesce($("n_kept"), lit(0L)).as("n_kept"), $("rate"))
          .orderBy($("lang"))
      },
      oracle = Some(
        """WITH w(lang, wt) AS (VALUES
          |  ('en', CAST(0.40 AS DOUBLE)), ('de', CAST(0.20 AS DOUBLE)),
          |  ('es', CAST(0.15 AS DOUBLE)), ('fr', CAST(0.15 AS DOUBLE)),
          |  ('zh', CAST(0.10 AS DOUBLE))),
          |b AS (SELECT lang, count(*) AS n_before FROM documents GROUP BY lang),
          |r AS (
          |  SELECT b.lang, n_before,
          |    wt / (n_before / (SELECT count(*) FROM documents)) AS ratio
          |  FROM b JOIN w USING (lang)),
          |r2 AS (SELECT lang, n_before, ratio / (SELECT max(ratio) FROM r) AS rate
          |       FROM r),
          |k AS (
          |  SELECT d.lang, count(*) AS n_kept
          |  FROM documents d JOIN r2 USING (lang)
          |  WHERE (d.doc_id * 2654435761) % 1000000 < rate * 1000000
          |  GROUP BY d.lang)
          |SELECT r2.lang, n_before,
          |  CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept, rate
          |FROM r2 LEFT JOIN k USING (lang) ORDER BY lang""".stripMargin),
      headline = true))
}
