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
      headline = true),

    // Q56 [extension: importance resampling] DSIR-style data selection
    // (Xie et al. 2023, arXiv:2302.03169): score every document by how
    // target-like its hashed n-gram feature distribution is, then keep the
    // top-K. Features = DISTINCT word unigrams + bigrams per document
    // (binary features, the hashed-DSIR variant) bucketed into B=64 via
    // the native codegen'd shingle_poly_hashes — one static call per doc
    // per n instead of an interpreted per-token HOF chain (5.2 s → ~1.5 s
    // at sf0.1), mirrored bit-exactly in DuckDB by the q27c list_reduce
    // fold. Target = the lang='en' slice; weight(doc) =
    // Σ_f [ln(t_b(f)+1) − ln(s_b(f)+1)] + n_f·[ln(S+B) − ln(T+B)] — the
    // log-likelihood ratio of the doc's features under Laplace-smoothed
    // target vs corpus bucket distributions.
    //
    // Determinism: per-BUCKET logs are frozen to integer micro-nats
    // (round(ln·1e6) over 64+2 values), so every per-doc sum is pure
    // INTEGER arithmetic — exactly associative, no float-summation-order
    // drift between Spark's hash agg and DuckDB's — and the gate
    // hash-checks exact weights, not rounded approximations.
    //
    // Scale: the bucket tables are B-row broadcast MODEL state (two counts
    // passes, combinable aggs); scoring is explode → broadcast join →
    // one groupBy(doc_id). Selection is top-K = TakeOrderedAndProject
    // (distributed partial top-K per partition, no global sort) + a
    // broadcast semi-join to flag survivors.
    "q56_dsir_weights" -> QueryDef(
      build = (s, d) => {
        graft.GraftExtensions.install(s)
        val buckets = 64; val topK = 50
        val lnMicro = (c: org.apache.spark.sql.Column) =>
          round(log(c) * 1000000).cast("long")
        val feats = Tables.documents(s, d)
          .select($("doc_id"), $("lang"), explode(concat(
            call_function("shingle_poly_hashes", $("text"), lit(1)),
            call_function("shingle_poly_hashes", $("text"), lit(2)))).as("h"))
          .select($("doc_id"), $("lang"), pmod($("h"), lit(buckets)).as("bucket"))
        // ONE stats pass: corpus and target bucket counts from the same
        // combinable conditional agg; the totals fold from the 64-row
        // result, so the corpus is scanned exactly twice (stats + scoring)
        val stats = feats.groupBy($("bucket"))
          .agg(count(lit(1)).as("s_n"),
            count(when($("lang") === "en", 1)).as("t_n"))
        val btab = stats.select($("bucket"),
          lnMicro($("t_n") + 1).as("lt"),
          lnMicro($("s_n") + 1).as("ls"))
        val consts = stats.agg(
            lnMicro(sum($("s_n")) + buckets).as("l_s_tot"),
            lnMicro(sum($("t_n")) + buckets).as("l_t_tot"))
        val weights = feats.join(broadcast(btab), "bucket")
          .crossJoin(broadcast(consts))
          .groupBy($("doc_id"))
          .agg(count(lit(1)).as("n_feats"),
            (sum($("lt") - $("ls"))
              + count(lit(1)) * max($("l_s_tot") - $("l_t_tot"))).as("w_micro"))
        val top = weights.orderBy(desc("w_micro"), $("doc_id")).limit(topK)
          .select($("doc_id").as("top_id"))
        weights.join(broadcast(top), $("doc_id") === $("top_id"), "left")
          .select($("doc_id"), $("n_feats"), $("w_micro"),
            $("top_id").isNotNull.as("selected"))
          .orderBy($("doc_id"))
      },
      oracle = Some(
        """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
          |f AS (
          |  SELECT doc_id, lang,
          |    unnest(list_concat(list_distinct(w),
          |      list_distinct(list_transform(range(1, len(w)),
          |        i -> w[i] || ' ' || w[i+1])))) AS tok
          |  FROM d),
          |fb AS (
          |  SELECT doc_id, lang,
          |    (list_reduce(list_prepend(0::BIGINT,
          |        list_transform(string_split(tok, ''), c -> ascii(c)::BIGINT)),
          |      (a,b) -> (a*31+b) % 2147483647) * 2147483647
          |     + list_reduce(list_prepend(0::BIGINT,
          |        list_transform(string_split(tok, ''), c -> ascii(c)::BIGINT)),
          |      (a,b) -> (a*131+b) % 2147483647)) % 64 AS bucket
          |  FROM f),
          |tstat AS (SELECT bucket, count(*) AS t_n FROM fb WHERE lang = 'en' GROUP BY bucket),
          |sstat AS (SELECT bucket, count(*) AS s_n FROM fb GROUP BY bucket),
          |btab AS (
          |  SELECT s.bucket,
          |    CAST(round(ln(COALESCE(t_n, 0) + 1) * 1000000) AS BIGINT) AS lt,
          |    CAST(round(ln(s_n + 1) * 1000000) AS BIGINT) AS ls
          |  FROM sstat s LEFT JOIN tstat t USING (bucket)),
          |tot AS (SELECT
          |    CAST(round(ln((SELECT count(*) FROM fb) + 64) * 1000000) AS BIGINT) AS l_s_tot,
          |    CAST(round(ln((SELECT count(*) FROM fb WHERE lang = 'en') + 64) * 1000000) AS BIGINT) AS l_t_tot),
          |wts AS (
          |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
          |    CAST(sum(lt - ls) + count(*) * (SELECT l_s_tot - l_t_tot FROM tot) AS BIGINT) AS w_micro
          |  FROM fb JOIN btab USING (bucket) GROUP BY doc_id),
          |top AS (SELECT doc_id FROM wts ORDER BY w_micro DESC, doc_id LIMIT 50)
          |SELECT doc_id, n_feats, w_micro,
          |  doc_id IN (SELECT doc_id FROM top) AS selected
          |FROM wts ORDER BY doc_id""".stripMargin),
      headline = true),

    // Q58 [extension: RAG chunking] Split every document into overlapping
    // token windows (32 tokens, stride 24 — the retrieval-index unit): the
    // chunk table carries (doc_id, chunk_idx, start, length, md5) so the
    // embedding/index stages key on chunk ids and never re-tokenize. Pure
    // per-row explode arithmetic — embarrassingly parallel, no shuffle
    // before the output sort; chunk text is md5-pinned so the gate
    // hash-checks the exact reassembled window content cross-engine.
    "q58_chunk_rag" -> QueryDef(
      build = (s, d) => {
        val win = 32; val stride = 24
        val w = split($("text"), " ")
        Tables.documents(s, d)
          .select($("doc_id"), w.as("w"))
          .select($("doc_id"), explode(
            sequence(lit(0), size($("w")) - 1, lit(stride))).as("start_tok"), $("w"))
          .select($("doc_id"),
            ($("start_tok") / stride).cast("long").as("chunk_idx"),
            $("start_tok").cast("long"),
            size(slice($("w"), $("start_tok") + 1, lit(win))).cast("long").as("chunk_len"),
            md5(array_join(slice($("w"), $("start_tok") + 1, lit(win)), " ")).as("chunk_md5"))
          .orderBy($("doc_id"), $("chunk_idx"))
      },
      oracle = Some(
        """SELECT doc_id,
          |  start_tok // 24 AS chunk_idx,
          |  start_tok,
          |  CAST(len(w[start_tok + 1 : start_tok + 32]) AS BIGINT) AS chunk_len,
          |  md5(array_to_string(w[start_tok + 1 : start_tok + 32], ' ')) AS chunk_md5
          |FROM (
          |  SELECT doc_id, w, CAST(unnest(range(0, len(w), 24)) AS BIGINT) AS start_tok
          |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
          |ORDER BY doc_id, chunk_idx""".stripMargin),
      headline = true),

    // Q59 [extension: delete propagation] Right-to-erasure over a corpus
    // and its DERIVED tables: a deterministic ~5% tombstone set of doc_ids
    // cascades through documents AND embeddings (vec_id keys the same
    // entity); each leg is one anti-join (the scalable delete shape — no
    // broadcast of the big side, tombstones are the small side), and the
    // gate audits before/deleted/after counts plus a RESIDUAL count that
    // must be zero — deletion is only real if nothing keyed to a tombstone
    // survives anywhere downstream.
    "q59_delete_cascade" -> QueryDef(
      build = (s, d) => {
        val tomb = Tables.documents(s, d)
          .filter(pmod($("doc_id") * 2654435761L, lit(100)) < 5)
          .select($("doc_id").as("t_id"))
        def leg(name: String, df: org.apache.spark.sql.DataFrame, key: String) = {
          val survivors = df.join(tomb, df(key) === tomb("t_id"), "left_anti")
          val residual = survivors.join(tomb, survivors(key) === tomb("t_id"), "left_semi")
          df.agg(count(lit(1)).as("rows_before"))
            .crossJoin(survivors.agg(count(lit(1)).as("rows_after")))
            .crossJoin(residual.agg(count(lit(1)).as("residual")))
            .select(lit(name).as("tbl"), $("rows_before"),
              ($("rows_before") - $("rows_after")).as("rows_deleted"),
              $("rows_after"), $("residual"))
        }
        leg("documents", Tables.documents(s, d), "doc_id")
          .unionByName(leg("embeddings", Tables.embeddings(s, d), "vec_id"))
          .orderBy($("tbl"))
      },
      oracle = Some(
        """WITH tomb AS (
          |  SELECT doc_id AS t_id FROM documents
          |  WHERE (doc_id * 2654435761) % 100 < 5)
          |SELECT 'documents' AS tbl,
          |  (SELECT count(*) FROM documents) AS rows_before,
          |  (SELECT count(*) FROM documents WHERE doc_id IN (SELECT t_id FROM tomb)) AS rows_deleted,
          |  (SELECT count(*) FROM documents WHERE doc_id NOT IN (SELECT t_id FROM tomb)) AS rows_after,
          |  CAST(0 AS BIGINT) AS residual
          |UNION ALL
          |SELECT 'embeddings',
          |  (SELECT count(*) FROM embeddings),
          |  (SELECT count(*) FROM embeddings WHERE vec_id IN (SELECT t_id FROM tomb)),
          |  (SELECT count(*) FROM embeddings WHERE vec_id NOT IN (SELECT t_id FROM tomb)),
          |  CAST(0 AS BIGINT)
          |ORDER BY tbl""".stripMargin)),

    // Q61 [extension: deterministic training order] the epoch shuffle: every
    // trainer needs the corpus in a pseudorandom order that is (a) seeded —
    // change one constant for the next epoch, (b) identical on ANY cluster
    // size / input split layout — the shuffle key is a pure function of
    // doc_id, never of partition index or task schedule (the reason
    // `monotonically_increasing_id`/`rand()` are banned from this path),
    // and (c) shardable — shard k feeds data-parallel worker k. At 100 TB
    // this is exactly one hash-partition exchange on `shard` followed by a
    // partition-local sort on (h, doc_id) — `repartition(shard).
    // sortWithinPartitions(h, doc_id)` streams straight to the shard files,
    // nothing global. The gate pins the ENTIRE per-shard sequence (md5 of
    // the ordered id list, q17/q28f convention) so both engines must agree
    // on every position, not just counts.
    "q61_train_order" -> QueryDef(
      build = (s, d) =>
        Tables.documents(s, d)
          .select($("doc_id"),
            pmod($("doc_id") * lit(2654435761L) + lit(1000003L), lit(1000000007L)).as("h"))
          .withColumn("shard", pmod($("h"), lit(8L)))
          .groupBy($("shard"))
          .agg(count(lit(1)).as("n_docs"),
            expr("element_at(transform(sort_array(collect_list(struct(h, doc_id))), x -> x.doc_id), 1)")
              .as("first_id"),
            expr("md5(array_join(transform(sort_array(collect_list(struct(h, doc_id))), x -> cast(x.doc_id AS string)), ','))")
              .as("order_md5"))
          .orderBy($("shard")),
      oracle = Some(
        """WITH t AS (
          |  SELECT doc_id,
          |    (doc_id * 2654435761 + 1000003) % 1000000007 AS h
          |  FROM documents)
          |SELECT h % 8 AS shard, count(*) AS n_docs,
          |  (list(doc_id ORDER BY h, doc_id))[1] AS first_id,
          |  md5(array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY h, doc_id), ',')) AS order_md5
          |FROM t GROUP BY shard ORDER BY shard""".stripMargin)),

    // Q62 [extension: per-domain frequency cap] C4/Gopher-style curation
    // rule: no single domain may dominate the corpus — keep at most N docs
    // per source, chosen by a DETERMINISTIC priority (seeded hash, doc_id
    // tie-break), not "first N seen" (which depends on scan order and so
    // isn't reproducible across runs/clusters). One hash-partition shuffle
    // on `source`; within each domain the selection is a local top-N — at
    // 100 TB this is TakeOrderedAndProject per group via the rank window,
    // never a global sort. The gate emits the surviving rows themselves, so
    // both engines must agree on every kept (doc_id, rank).
    "q62_domain_cap" -> QueryDef(
      build = (s, d) => {
        val cap = 10
        val w = Window.partitionBy($("source"))
          .orderBy($("h"), $("doc_id"))
        Tables.documents(s, d)
          .select($("doc_id"), $("source"),
            pmod($("doc_id") * lit(2654435761L) + lit(7L), lit(1000000007L)).as("h"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter($("rk") <= cap)
          .select($("doc_id"), $("source"), $("rk"))
          .orderBy($("doc_id"))
      },
      oracle = Some(
        """WITH t AS (
          |  SELECT doc_id, source,
          |    (doc_id * 2654435761 + 7) % 1000000007 AS h
          |  FROM documents),
          |r AS (
          |  SELECT doc_id, source,
          |    CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS rk
          |  FROM t)
          |SELECT doc_id, source, rk FROM r WHERE rk <= 10
          |ORDER BY doc_id""".stripMargin)))
}
