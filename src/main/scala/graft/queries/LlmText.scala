package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.12 Q28 + extensions: text analysis over `documents`
  * (north-star surface — tokenization, quality scoring, language ID,
  * document fingerprinting).
  *
  * Everything hashes: token counts and ratios are integer arithmetic with a
  * single final IEEE division; the fingerprint is a left-fold polynomial
  * rolling hash mod 1e9+7 (integer, order-defined) computed identically in
  * DuckDB via list_reduce.
  *
  * Scale: all per-document work is embarrassingly parallel projections; the
  * only shuffles are the word-count groupBy (combinable, low cardinality)
  * and final sorts.
  */
object LlmText {
  private def $(name: String) = col(name)

  // ---- bigram language model (q28m/q28n) -------------------------------
  // tokens as arrays; bigrams via zip_with over the split array (per-row,
  // no positional self-join, no window — PlanSpec-locked); scoring = one
  // shuffle join of the bigram stream against the (w1,w2)-keyed counts,
  // with the left-token marginal derived FROM the bigram counts so
  // numerator and denominator stay consistent by construction. Integer
  // micro-nats throughout (q76's float-proof trick).
  private def lmTokens(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d).select($("doc_id"), split($("text"), " ").as("a"))

  private def lmBigrams(toks: org.apache.spark.sql.DataFrame) =
    toks.filter(size($("a")) >= 2)
      .select($("doc_id"), explode(zip_with(
        slice($("a"), lit(1), size($("a")) - 1),
        slice($("a"), lit(2), size($("a")) - 1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("z"))
      .select($("doc_id"), $("z.w1").as("w1"), $("z.w2").as("w2"))

  private def lmScore(big: org.apache.spark.sql.DataFrame,
      c2: org.apache.spark.sql.DataFrame,
      vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val lnu = (c: org.apache.spark.sql.Column) =>
      round(log(c) * 1000000).cast("long")
    val c1 = c2.groupBy($("w1")).agg(sum($("n2")).as("n1"))
    big.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy($("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(lnu($("n1") + $("vocab")) - lnu($("n2") + lit(1))).as("s"))
      .select($("doc_id"), $("n_bigrams"),
        expr("s div n_bigrams").as("nll_micro"))
      .orderBy($("doc_id"))
  }

  /** Shared by q28m (fresh-trained) and q28n (pinned-model) — the scores
    * must be identical by construction, so both gate against this SQL.
    */
  private val lmOracleSql: String = {
    def lnu(e: String) = s"CAST(round(ln($e) * 1000000) AS BIGINT)"
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS a FROM documents),
       |big AS (
       |  SELECT doc_id, u.z[1] AS w1, u.z[2] AS w2
       |  FROM (SELECT doc_id, unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS z
       |        FROM toks WHERE len(a) >= 2) u),
       |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n2
       |       FROM big GROUP BY w1, w2),
       |c1 AS (SELECT w1, CAST(sum(n2) AS BIGINT) AS n1 FROM c2 GROUP BY w1),
       |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab
       |      FROM (SELECT unnest(a) AS w FROM toks)),
       |scored AS (
       |  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(${lnu("c1.n1 + vocab")} - ${lnu("c2.n2 + 1")}) AS BIGINT) AS s
       |  FROM big b JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
       |  GROUP BY b.doc_id)
       |SELECT doc_id, n_bigrams, s // n_bigrams AS nll_micro
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(

    // Q28 [extension: quality scoring + fingerprint] per-document stats:
    // token counts, distinct-token ratio, stopword ratio, mean token length,
    // and a polynomial rolling-hash fingerprint of the full text.
    //
    // mean_tok_len is pure column arithmetic: tokens are split on single
    // spaces, so sum(len(token)) == length(text) - (n_tokens - 1) separators.
    // The fingerprint is the native codegen'd [[graft.plans.PolyHash]] —
    // same left fold as the interpreted per-character HOF it replaced
    // (7.9 s → sub-second at sf0.1).
    "q28_text_stats" -> QueryDef(
      build = (s, d) => {
        graft.GraftExtensions.install(s)
        val w = split($("text"), " ")
        val stop = array(lit("the"), lit("a"))
        Tables.documents(s, d)
          .withColumn("w", w)
          .withColumn("n_tokens", size($("w")).cast("long"))
          .withColumn("n_uniq", size(array_distinct($("w"))).cast("long"))
          .withColumn("n_stop",
            size(filter($("w"), t => array_contains(stop, t))).cast("long"))
          .withColumn("uniq_ratio", $("n_uniq").cast("double") / $("n_tokens").cast("double"))
          .withColumn("stop_ratio", $("n_stop").cast("double") / $("n_tokens").cast("double"))
          .withColumn("mean_tok_len",
            (length($("text")).cast("long") - ($("n_tokens") - 1))
              .cast("double") / $("n_tokens").cast("double"))
          .withColumn("fingerprint",
            call_function("poly_hash", $("text"), lit(31L), lit(1000000007L)))
          .select($("doc_id"), $("n_tokens"), $("n_uniq"), $("n_stop"),
            $("uniq_ratio"), $("stop_ratio"), $("mean_tok_len"), $("fingerprint"))
          .orderBy($("doc_id"))
      },
      oracle = Some(
        """SELECT doc_id,
          |  CAST(len(w) AS BIGINT) AS n_tokens,
          |  CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
          |  CAST(len(list_filter(w, t -> t IN ('the','a'))) AS BIGINT) AS n_stop,
          |  CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS uniq_ratio,
          |  CAST(len(list_filter(w, t -> t IN ('the','a'))) AS DOUBLE)
          |    / CAST(len(w) AS DOUBLE) AS stop_ratio,
          |  CAST(list_reduce(list_prepend(0::BIGINT,
          |      list_transform(w, t -> CAST(length(t) AS BIGINT))), (a,b) -> a+b) AS DOUBLE)
          |    / CAST(len(w) AS DOUBLE) AS mean_tok_len,
          |  list_reduce(list_prepend(0::BIGINT,
          |      list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
          |    (a,b) -> (a*31+b) % 1000000007) AS fingerprint
          |FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
          |ORDER BY doc_id""".stripMargin),
      headline = true),

    // Q28b [extension: tokenize + explode + count] corpus word frequencies
    // per lang — explode then combinable hash agg (map-side partial), the
    // canonical distributed word count.
    "q28b_wordcount" -> QueryDef(
      build = (s, d) =>
        Tables.documents(s, d)
          .select($("lang"), explode(split($("text"), " ")).as("word"))
          .groupBy($("lang"), $("word"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy($("lang"), desc("cnt"), $("word")),
      oracle = Some(
        """SELECT lang, word, count(*) AS cnt
          |FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
          |GROUP BY lang, word ORDER BY lang, cnt DESC, word""".stripMargin)),

    // Q28c [extension: language ID] n-gram/stopword-profile heuristic:
    // score = |tokens ∩ profile| per language, predict argmax with a
    // deterministic tie-break on profile order. (The synthetic corpus shares
    // one vocabulary, so scores tie a lot — the tie-break IS the semantics
    // under test; integer scores keep it hash-stable.)
    "q28c_lang_id" -> QueryDef(
      build = (s, d) => {
        val profiles = Seq(
          ("en", Seq("the", "a", "fast", "slow", "big", "small")),
          ("es", Seq("data", "table", "row", "column")),
          ("fr", Seq("query", "filter", "join", "group")))
        val w = array_distinct(split($("text"), " "))
        var df = Tables.documents(s, d).withColumn("w", w)
        for ((lang, prof) <- profiles) {
          val arr = array(prof.map(lit): _*)
          df = df.withColumn(s"score_$lang", size(array_intersect($("w"), arr)).cast("long"))
        }
        df.withColumn("pred_lang",
          when($("score_en") >= $("score_es") && $("score_en") >= $("score_fr"), "en")
            .when($("score_es") >= $("score_fr"), "es")
            .otherwise("fr"))
          .select($("doc_id"), $("lang"), $("score_en"), $("score_es"), $("score_fr"),
            $("pred_lang"))
          .orderBy($("doc_id"))
      },
      oracle = Some(
        """SELECT doc_id, lang,
          |  CAST(len(list_intersect(w, ['the','a','fast','slow','big','small'])) AS BIGINT) AS score_en,
          |  CAST(len(list_intersect(w, ['data','table','row','column'])) AS BIGINT) AS score_es,
          |  CAST(len(list_intersect(w, ['query','filter','join','group'])) AS BIGINT) AS score_fr,
          |  CASE
          |    WHEN len(list_intersect(w, ['the','a','fast','slow','big','small']))
          |           >= len(list_intersect(w, ['data','table','row','column']))
          |     AND len(list_intersect(w, ['the','a','fast','slow','big','small']))
          |           >= len(list_intersect(w, ['query','filter','join','group'])) THEN 'en'
          |    WHEN len(list_intersect(w, ['data','table','row','column']))
          |           >= len(list_intersect(w, ['query','filter','join','group'])) THEN 'es'
          |    ELSE 'fr' END AS pred_lang
          |FROM (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS w
          |      FROM documents)
          |ORDER BY doc_id""".stripMargin)),

    // Q28e [extension: corpus quality filter] the C4-style rule chain a
    // training-data pipeline runs after scoring: keep documents inside
    // token-count bounds, with enough distinct tokens and a sane stopword
    // rate. Pure projections + one filter — embarrassingly parallel, zero
    // shuffle before the output sort.
    "q28e_quality_filter" -> QueryDef(
      build = (s, d) => {
        val w = split($("text"), " ")
        val stop = array(lit("the"), lit("a"))
        Tables.documents(s, d)
          .withColumn("n_tokens", size(w).cast("long"))
          .withColumn("n_uniq", size(array_distinct(w)).cast("long"))
          .withColumn("n_stop", size(filter(w, t => array_contains(stop, t))).cast("long"))
          .filter($("n_tokens") >= 20 && $("n_tokens") <= 90 &&
            $("n_uniq") * 100 >= $("n_tokens") * 25 && // >=25% distinct
            $("n_stop") * 100 <= $("n_tokens") * 40) // <=40% stopwords
          .select($("doc_id"), $("lang"), $("n_tokens"), $("n_uniq"), $("n_stop"))
          .orderBy($("doc_id"))
      },
      oracle = Some(
        """SELECT doc_id, lang,
          |  CAST(len(w) AS BIGINT) AS n_tokens,
          |  CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
          |  CAST(len(list_filter(w, t -> t IN ('the','a'))) AS BIGINT) AS n_stop
          |FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
          |WHERE len(w) BETWEEN 20 AND 90
          |  AND len(list_distinct(w)) * 100 >= len(w) * 25
          |  AND len(list_filter(w, t -> t IN ('the','a'))) * 100 <= len(w) * 40
          |ORDER BY doc_id""".stripMargin)),

    // Q28f [extension: deterministic stratified sample] hash-mod sampling
    // per stratum — reproducible across runs/cluster sizes (unlike
    // df.sample), the standard way to cut eval slices from a 100 TB corpus.
    // The "hash" is modular arithmetic on the key so DuckDB agrees exactly.
    "q28f_stratified_sample" -> QueryDef(
      build = (s, d) =>
        Tables.documents(s, d)
          .filter(pmod($("doc_id") * 2654435761L, lit(100)) < 10) // ~10% per stratum
          .groupBy($("lang"))
          .agg(count(lit(1)).as("n_sampled"),
            // joined string, not a raw array — the driver's hasher is only
            // proven on scalar columns (q17 convention)
            expr("array_join(transform(sort_array(collect_list(doc_id)), x -> cast(x AS string)), ',')")
              .as("sampled_ids"))
          .orderBy($("lang")),
      oracle = Some(
        """SELECT lang, count(*) AS n_sampled,
          |  array_to_string(list_sort(list(doc_id)), ',') AS sampled_ids
          |FROM documents
          |WHERE ((doc_id * 2654435761) % 100 + 100) % 100 < 10
          |GROUP BY lang ORDER BY lang""".stripMargin)),

    // Q28d [extension: token counting, BPE-ish] whitespace tokens plus a
    // regex sub-token count (letter-runs and single non-space symbols —
    // the shape of a byte-pair pretokenizer), per doc and corpus-total.
    "q28d_token_count" -> QueryDef(
      build = (s, d) =>
        Tables.documents(s, d)
          .withColumn("ws_tokens", size(split($("text"), " ")).cast("long"))
          .withColumn("sub_tokens",
            size(filter(split($("text"), "[^a-z0-9]+"), t => length(t) > 0)).cast("long"))
          .groupBy($("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum($("ws_tokens")).as("ws_tokens"),
            sum($("sub_tokens")).as("sub_tokens"))
          .orderBy($("source")),
      oracle = Some(
        """SELECT source, count(*) AS n_docs,
          |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
          |  CAST(sum(len(list_filter(string_split_regex(text, '[^a-z0-9]+'),
          |    t -> length(t) > 0))) AS BIGINT) AS sub_tokens
          |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // Q28g [extension: TF-IDF corpus scoring] the retrieval/quality weight
    // a training-data pipeline computes corpus-wide: tf from one
    // explode+agg, df from a second agg over the SAME token frame
    // (both combinable, map-side partial), N via a one-row broadcast —
    // no driver-side count, no window until after the per-doc top-k cut.
    //
    // Determinism across engines: ln() can differ in the last ulp, so the
    // score is ROUND(tf * ln(N/df), 4) and BOTH the ranking and the
    // tie-break run on the ROUNDED value (score_r DESC, term ASC). The
    // 1e-4 grid leaves a ~1e-12-relative disagreement window per score at
    // the rounding boundary (the q15b percentile convention, measured
    // safe at all three SFs); a fully exact gate would need rational
    // arithmetic the SQL surface doesn't offer. Top-3 per doc via a
    // window confined to the (tiny) per-doc frame.
    //
    // Scale: token frame shuffles once on (doc_id, term) for tf and once
    // on term for df (both partial-agg'd); df table (|vocab| rows)
    // broadcasts back; the final per-doc window partitions by doc_id —
    // the natural key, no global sort before the output.
    "q28g_tfidf" -> QueryDef(
      build = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
        val tokens = docs.select($("doc_id"),
          explode(split($("text"), " ")).as("term")).filter(length($("term")) > 0)
        val tf = tokens.groupBy($("doc_id"), $("term"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = tokens.select($("doc_id"), $("term")).distinct()
          .groupBy($("term")).agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf
          .join(broadcast(dfreq), "term")
          .crossJoin(broadcast(n))
          .withColumn("score_r",
            round($("tf") * log($("n_docs").cast("double") / $("df")), 4))
        val w = Window.partitionBy($("doc_id"))
          .orderBy(desc("score_r"), $("term"))
        scored.withColumn("rnk", row_number().over(w))
          .filter($("rnk") <= 3)
          .select($("doc_id"), $("rnk").cast("long").as("rnk"), $("term"),
            $("tf"), $("df"), $("score_r"))
          .orderBy($("doc_id"), $("rnk"))
      },
      oracle = Some(
        """WITH tokens AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          |tok AS (SELECT doc_id, term FROM tokens WHERE length(term) > 0),
          |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
          |dfreq AS (SELECT term, count(*) AS df
          |          FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term),
          |n AS (SELECT count(*) AS n_docs FROM documents),
          |scored AS (
          |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
          |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 4) AS score_r
          |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
          |ranked AS (
          |  SELECT *, row_number() OVER
          |    (PARTITION BY doc_id ORDER BY score_r DESC, term) AS rnk
          |  FROM scored)
          |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term,
          |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score_r
          |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin)),

    // Q28h [extension: PII redaction] the scrub stage between crawl and
    // training set: emails → <EMAIL>, IPv4 → <IP>, long digit runs →
    // <NUM>, with per-kind match counts for audit. Pure per-row
    // projections — zero shuffle before the output sort, trivially
    // data-parallel at any scale. The synthetic corpus carries no PII, so
    // the query first injects deterministic PII-shaped strings (from
    // doc_id) and then must remove every one of them; the patterns are
    // kept inside the Java-regex ∩ RE2 dialect so both engines agree, and
    // replacement order (email → ip → num) is part of the contract.
    "q28h_pii_redact" -> QueryDef(
      build = (s, d) => {
        val email = "[a-z0-9]+@[a-z]+\\.[a-z]+"
        val ip = "\\d+\\.\\d+\\.\\d+\\.\\d+"
        val num = "\\b\\d{5,}\\b"
        Tables.documents(s, d)
          .withColumn("dirty", concat($("text"),
            lit(" contact user"), $("doc_id"), lit("@mail.com from 10."),
            $("doc_id") % 256, lit(".0."), $("doc_id") % 100,
            lit(" id "), $("doc_id") * $("doc_id")))
          .select($("doc_id"),
            regexp_count($("dirty"), lit(email)).cast("long").as("n_emails"),
            regexp_count($("dirty"), lit(ip)).cast("long").as("n_ips"),
            regexp_count($("dirty"), lit(num)).cast("long").as("n_nums"),
            md5(regexp_replace(regexp_replace(regexp_replace($("dirty"),
              email, "<EMAIL>"), ip, "<IP>"), num, "<NUM>")).as("redacted_md5"))
          .orderBy($("doc_id"))
      },
      oracle = Some(
        """SELECT doc_id,
          |  CAST(len(regexp_extract_all(dirty, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS BIGINT) AS n_emails,
          |  CAST(len(regexp_extract_all(dirty, '\d+\.\d+\.\d+\.\d+')) AS BIGINT) AS n_ips,
          |  CAST(len(regexp_extract_all(dirty, '\b\d{5,}\b')) AS BIGINT) AS n_nums,
          |  md5(regexp_replace(regexp_replace(regexp_replace(dirty,
          |    '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
          |    '\d+\.\d+\.\d+\.\d+', '<IP>', 'g'),
          |    '\b\d{5,}\b', '<NUM>', 'g')) AS redacted_md5
          |FROM (
          |  SELECT doc_id, text || ' contact user' || doc_id || '@mail.com from 10.'
          |    || (doc_id % 256) || '.0.' || (doc_id % 100)
          |    || ' id ' || (doc_id * doc_id) AS dirty
          |  FROM documents)
          |ORDER BY doc_id""".stripMargin)),

    // Q28i [extension: Gopher/RefinedWeb repetition signals] Per-document
    // word-bigram repetition: total bigrams, the most-frequent bigram's
    // share (top_frac), and the share of occurrences belonging to any
    // repeated bigram (dup_frac) — the two Rae et al. (Gopher) "repetition"
    // quality signals — plus the keep/drop verdict at top ≤ 0.06,
    // dup ≤ 0.10 (sf0.01 medians 0.033/0.056, so the verdict splits the
    // corpus instead of rubber-stamping it).
    //
    // Scale: explode → (doc_id, bigram) hash agg → (doc_id) hash agg; both
    // combinable map-side, keyed on doc_id so the second agg is a
    // near-no-op after the first's shuffle. No per-doc O(n²) HOF work.
    "q28i_repetition" -> QueryDef(
      build = (s, d) => {
        val w = split($("text"), " ")
        Tables.documents(s, d)
          .select($("doc_id"), w.as("w"))
          .filter(size($("w")) >= 2)
          .select($("doc_id"), explode(
            transform(sequence(lit(1), size($("w")) - 1),
              i => concat(element_at($("w"), i), lit(" "),
                element_at($("w"), i + 1)))).as("b"))
          .groupBy($("doc_id"), $("b")).agg(count(lit(1)).as("c"))
          .groupBy($("doc_id"))
          .agg(sum($("c")).as("n_bigrams"),
            max($("c")).as("top_cnt"),
            sum(when($("c") > 1, $("c")).otherwise(0L)).as("dup_occ"))
          .withColumn("top_frac",
            $("top_cnt").cast("double") / $("n_bigrams").cast("double"))
          .withColumn("dup_frac",
            $("dup_occ").cast("double") / $("n_bigrams").cast("double"))
          .withColumn("keep", $("top_frac") <= 0.06 && $("dup_frac") <= 0.10)
          .orderBy($("doc_id"))
      },
      oracle = Some(
        """WITH bg AS (
          |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
          |    i -> w[i] || ' ' || w[i+1])) AS b
          |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
          |  WHERE len(w) >= 2),
          |cnt AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b)
          |SELECT doc_id,
          |  CAST(sum(c) AS BIGINT) AS n_bigrams,
          |  CAST(max(c) AS BIGINT) AS top_cnt,
          |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_occ,
          |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_frac,
          |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
          |    / CAST(sum(c) AS DOUBLE) AS dup_frac,
          |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) <= 0.06
          |    AND CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
          |      / CAST(sum(c) AS DOUBLE) <= 0.10 AS keep
          |FROM cnt GROUP BY doc_id
          |ORDER BY doc_id""".stripMargin),
      headline = true),

    // Q28j [extension: benchmark decontamination] The GPT-3-style eval-set
    // overlap check: held-out docs (doc_id % 2 = 0 stands in for the
    // benchmark corpus) contribute their distinct 5-gram shingles to a SET;
    // every training doc is scored by the fraction of ITS distinct 5-grams
    // found in that set, and dropped at ≥ 0.5. The planted near-dup pairs
    // make this a real gate: partners of held-out docs score ~1.0, clean
    // docs ~0 (12 contaminated at sf0.01 — perfect separation).
    //
    // Scale: the eval side is a benchmark suite — thousands of docs, not a
    // corpus — so its distinct-shingle set broadcasts; the train side
    // streams through one explode + broadcast-hash left join + doc_id agg.
    // Nothing all-pairs, nothing driver-side.
    "q28j_decontaminate" -> QueryDef(
      build = (s, d) => {
        val w = split($("text"), " ")
        val sh = Tables.documents(s, d)
          .select($("doc_id"), w.as("w"))
          .filter(size($("w")) >= 5)
          .select($("doc_id"), explode(array_distinct(
            transform(sequence(lit(1), size($("w")) - 4),
              i => concat_ws(" ", element_at($("w"), i),
                element_at($("w"), i + 1), element_at($("w"), i + 2),
                element_at($("w"), i + 3), element_at($("w"), i + 4)))))
            .as("sh"))
        val evalSet = sh.filter($("doc_id") % 2 === 0)
          .select($("sh").as("ev_sh")).distinct()
        sh.filter($("doc_id") % 2 =!= 0)
          .join(broadcast(evalSet), $("sh") === $("ev_sh"), "left")
          .groupBy($("doc_id"))
          .agg(count(lit(1)).as("n_sh"), count($("ev_sh")).as("n_hit"))
          .withColumn("overlap_frac",
            $("n_hit").cast("double") / $("n_sh").cast("double"))
          .withColumn("contaminated", $("overlap_frac") >= 0.5)
          .orderBy($("doc_id"))
      },
      oracle = Some(
        """WITH sh AS (
          |  SELECT doc_id, unnest(list_distinct(list_transform(
          |    range(1, len(w) - 3),
          |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
          |      || w[i+3] || ' ' || w[i+4]))) AS s
          |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
          |  WHERE len(w) >= 5),
          |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0)
          |SELECT tr.doc_id,
          |  CAST(count(*) AS BIGINT) AS n_sh,
          |  CAST(count(ev.s) AS BIGINT) AS n_hit,
          |  CAST(count(ev.s) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS overlap_frac,
          |  CAST(count(ev.s) AS DOUBLE) / CAST(count(*) AS DOUBLE) >= 0.5
          |    AS contaminated
          |FROM (SELECT * FROM sh WHERE doc_id % 2 <> 0) tr
          |LEFT JOIN ev ON tr.s = ev.s
          |GROUP BY tr.doc_id
          |ORDER BY tr.doc_id""".stripMargin),
      headline = true),

    // Q28k [extension: Unicode text canonicalization] the zeroth stage of
    // corpus preprocessing: NFC composition + accent folding (native
    // codegen'd expressions, plans/NormalizeText.scala), proven CROSS-ENGINE
    // — Spark's JDK Normalizer and DuckDB's utf8proc must land on
    // byte-identical outputs. The gate manufactures non-ASCII deterministically
    // from the corpus itself: (1) `acc` swaps vowels for precomposed
    // accented ones (translate), (2) `deco` injects the DECOMPOSED form
    // (letter + U+0301 combining acute). Pins: md5(nfc(deco)) must equal
    // the precomposed bytes both engines build independently, and
    // md5(strip_accents(acc)) must round-trip to md5(original) — checked as
    // a value (`roundtrip_ok`) AND cross-engine via the hashes themselves.
    "q28k_normalize" -> QueryDef(
      build = (s, d) => {
        graft.GraftExtensions.install(s)
        // escaped, not literal accented chars \u2014 the gate must not depend on
        // the build's source-file charset. 00e1/00e9/00ed/00f3 = precomposed
        // a/e/i/o-acute; 0301 = the combining acute NFC must re-compose.
        val acc = translate($("text"), "aeio", "\u00e1\u00e9\u00ed\u00f3")
        val deco = regexp_replace($("text"), "a", "a\u0301")
        // 0915 093E = Devanagari KA + vowel sign AA: the vowel sign is a
        // SPACING combining mark (category Mc) \u2014 the class utf8proc
        // STRIPMARK removes but a naive Mn-only fold keeps (r8 ADVICE).
        // Pinning it cross-engine locks the Mn+Mc+Me semantics.
        val mc = concat(lit("\u0915\u093e"), substring($("text"), 1, 8))
        Tables.documents(s, d)
          .select($("doc_id"),
            md5(acc).as("acc_md5"),
            md5(call_function("nfc_normalize", deco)).as("nfc_md5"),
            md5(call_function("strip_accents", acc)).as("strip_md5"),
            (md5(call_function("strip_accents", acc)) === md5($("text")))
              .as("roundtrip_ok"),
            md5(call_function("strip_accents", mc)).as("mc_md5"),
            (md5(call_function("strip_accents", mc)) ===
              md5(concat(lit("\u0915"), substring($("text"), 1, 8))))
              .as("mc_ok"))
          .orderBy($("doc_id"))
      },
      oracle = Some(
        """WITH t AS (
          |  SELECT doc_id, text,
          |    translate(text, 'aeio', 'áéíó') AS acc,
          |    replace(text, 'a', 'a' || chr(769)) AS deco,
          |    chr(2325) || chr(2366) || substr(text, 1, 8) AS mc
          |  FROM documents)
          |SELECT doc_id,
          |  md5(acc) AS acc_md5,
          |  md5(nfc_normalize(deco)) AS nfc_md5,
          |  md5(strip_accents(acc)) AS strip_md5,
          |  (md5(strip_accents(acc)) = md5(text)) AS roundtrip_ok,
          |  md5(strip_accents(mc)) AS mc_md5,
          |  (md5(strip_accents(mc)) = md5(chr(2325) || substr(text, 1, 8)))
          |    AS mc_ok
          |FROM t ORDER BY doc_id""".stripMargin)),

    // Q28l [extension: percentile quality cut] relative quality filtering:
    // instead of q28e's absolute thresholds, keep each language's documents
    // at or above that language's own 25th-percentile length — the
    // distribution-aware cut real curation pipelines use so a rule tuned on
    // English doesn't decimate a shorter-sentence language. Two-pass shape:
    // a per-group percentile agg (bounded output: one row per lang; the
    // 100 TB serving path swaps in approx_percentile's fixed-size sketch —
    // q15b documents the pair), broadcast back over the corpus, filter.
    // The interpolated cutoff is emitted rounded (q15b convention) and the
    // kept set is exact-checked row-for-row; >= on the unrounded double is
    // safe cross-engine because both engines interpolate the same exact
    // rational and q15b pins their bit-equality.
    "q28l_percentile_cut" -> QueryDef(
      build = (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("n_tokens", size(split($("text"), " ")).cast("long"))
        val cuts = docs.groupBy($("lang"))
          .agg(expr("percentile(n_tokens, 0.25)").as("cut"))
        docs.join(broadcast(cuts), "lang")
          .filter($("n_tokens").cast("double") >= $("cut"))
          .select($("doc_id"), $("lang"), $("n_tokens"),
            round($("cut"), 4).as("lang_cut"))
          .orderBy($("doc_id"))
      },
      oracle = Some(
        """WITH t AS (
          |  SELECT doc_id, lang,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |  FROM documents),
          |c AS (
          |  SELECT lang, quantile_cont(n_tokens, 0.25) AS cut
          |  FROM t GROUP BY lang)
          |SELECT t.doc_id, t.lang, t.n_tokens, round(c.cut, 4) AS lang_cut
          |FROM t JOIN c USING (lang)
          |WHERE CAST(t.n_tokens AS DOUBLE) >= c.cut
          |ORDER BY t.doc_id""".stripMargin)),

    // Q77 [extension: BPE tokenizer] real subword tokenization, train +
    // encode (functions/Bpe.scala): 150 merges trained driver-side on a
    // bounded deterministic sample (merge table = model state, the
    // k-means-centroid scale class), then a broadcast-encode pass over the
    // whole corpus. BPE encode is not SQL-expressible, so the gate is the
    // q36b-style self-check shape: `ok` folds round-trip identity (token
    // concat rebuilds the exact word), per-word token bounds, and encode
    // determinism — computed per document on the engine side, asserted
    // TRUE by the oracle. The build additionally requires corpus-level
    // compression (merged tokens < naive char count), so a tokenizer that
    // degenerates to characters fails loudly rather than passing trivially.
    "q77_bpe_tokenize" -> QueryDef(
      build = (s, d) => {
        import graft.functions.Bpe
        val docs = Tables.documents(s, d)
        // 60 merges: the synthetic corpus has a ~50-word vocabulary that
        // fully merges by ~100, so 60 keeps the vocab genuinely subword
        // (some words stay multi-token) instead of degenerating whole-word
        val merges = Bpe.trainOnSample(docs, numMerges = 60)
        require(merges.length == 60, s"BPE training stopped at ${merges.length} merges")
        val out = Bpe.encodeBatch(docs.select($("doc_id"), $("text")), merges).cache()
        val totals = out.agg(sum($("n_tokens")), sum($("n_chars"))).head()
        val (tok, chars) = (totals.getLong(0), totals.getLong(1))
        require(tok < chars,
          s"BPE produced no compression ($tok tokens vs $chars chars)")
        out.select($("doc_id"), $("n_chars"), $("ok")).orderBy($("doc_id"))
      },
      oracle = Some(
        """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, TRUE AS ok
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // Q77b [extension: persisted+versioned tokenizer] q77's encode serving
    // from a PINNED ModelStore merge-table version — the production
    // tokenizer lifecycle (a trained vocabulary is an immutable artifact;
    // every corpus re-encode must use the exact deployed merge list, never
    // a retrain that would silently shift token ids). Version 0 is the
    // trained merge table; version 1 is a deliberate 1-merge retrain;
    // encode loads v0 by version. Same self-check gate as q77: round-trip
    // identity + determinism + corpus-level compression, which would all
    // break if the pin served the wrong version.
    "q77b_bpe_pinned" -> QueryDef(
      build = (s, d) => {
        import graft.functions.Bpe
        import graft.sources.ModelStore
        val docs = Tables.documents(s, d)
        val root = graft.GateTmp.freshDir("q77b_model")
        val pinned = ModelStore.saveMerges(s, root,
          Bpe.trainOnSample(docs, numMerges = 60))
        ModelStore.saveMerges(s, root,
          Bpe.trainOnSample(docs, numMerges = 1)) // degenerate v1 retrain
        val merges = ModelStore.loadMerges(s, root, Some(pinned.version))
        require(merges.length == 60, s"pinned merge table has ${merges.length} rows")
        val out = Bpe.encodeBatch(docs.select($("doc_id"), $("text")), merges).cache()
        val totals = out.agg(sum($("n_tokens")), sum($("n_chars"))).head()
        require(totals.getLong(0) < totals.getLong(1),
          "BPE from pinned merges produced no compression")
        out.select($("doc_id"), $("n_chars"), $("ok")).orderBy($("doc_id"))
      },
      oracle = Some(
        """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, TRUE AS ok
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // Q28m [extension: n-gram LM perplexity scoring] The CCNet-style
    // quality signal the heuristic filters (q28e) can't give: score every
    // document by its average per-token negative log-likelihood under a
    // bigram language model trained on the corpus itself, Laplace-smoothed
    // over the unigram vocabulary — P(w|u) = (c(u,w)+1)/(c(u)+V). Gibberish
    // and boilerplate-repetition outliers surface as NLL extremes where
    // stopword ratios stay blind. Float-proof like q76: every ln is
    // integerized to micro-nats (round(ln·1e6)) BEFORE summation, so the
    // per-doc score is pure integer arithmetic, bit-identical across
    // engines and partition orders.
    //
    // Scale shape: bigrams come from zip_with over the already-split token
    // array (no positional self-join, no window — zero extra shuffle to
    // form pairs); model training is two map-side-combinable groupBy
    // passes (bigram, then left-token marginal derived FROM the bigram
    // counts so the two stay consistent by construction); scoring is one
    // shuffle join of the bigram stream against the model keyed by
    // (w1,w2) — the canonical corpus-sized join, skew-handled by AQE. The
    // vocabulary scalar rides along as a broadcast. At 100 TB nothing
    // here is driver-side: the model lives as distributed state; only V
    // (one row) is collected.
    "q28m_ngram_perplexity" -> QueryDef(
      build = (s, d) => {
        val toks = lmTokens(s, d)
        val big = lmBigrams(toks)
        lmScore(big,
          big.groupBy($("w1"), $("w2")).agg(count(lit(1)).as("n2")),
          toks.select(explode($("a")).as("w"))
            .agg(count_distinct($("w")).as("vocab")))
      },
      oracle = Some(lmOracleSql)),

    // Q28n [extension: pinned LM scoring] The production lifecycle of
    // q28m's model: the trained bigram counts and vocabulary are PERSISTED
    // as SnapshotStore tables (the same train/serve split as q26e/q26f/
    // q77b — a scoring job must use the exact deployed model, never a
    // retrain that silently shifts every score), a deliberate degenerate
    // retrain lands on top as v1, and scoring loads the PINNED v0 —
    // adversarially proven: the gate's output is hash-identical to q28m's
    // fresh-trained scores (same oracle verbatim) even though the tables'
    // HEAD is now a one-row garbage model, and the build require()s the
    // retrain really landed. Model state is k-bigram-scale distributed
    // data, never driver-side; version pinning is the store's normal
    // time-travel read.
    "q28n_perplexity_pinned" -> QueryDef(
      build = (s, d) => {
        import graft.sources.SnapshotStore
        val toks = lmTokens(s, d)
        val big = lmBigrams(toks)
        val lmRoot = graft.GateTmp.freshDir("q28n_lm")
        val vRoot = graft.GateTmp.freshDir("q28n_vocab")
        SnapshotStore.init(s, lmRoot,
          big.groupBy($("w1"), $("w2")).agg(count(lit(1)).as("n2")))
        SnapshotStore.init(s, vRoot,
          toks.select(explode($("a")).as("w"))
            .agg(count_distinct($("w")).as("vocab")))
        // degenerate retrain on top: v1 is a one-row garbage model
        SnapshotStore.transact(s, lmRoot)(base => base.limit(1))
        SnapshotStore.transact(s, vRoot)(base =>
          base.select(($("vocab") * 1000000L).as("vocab")))
        require(SnapshotStore.latest(lmRoot).version == 1L &&
          SnapshotStore.latest(vRoot).version == 1L,
          "degenerate retrain must land as v1")
        lmScore(big,
          SnapshotStore.read(s, SnapshotStore.at(lmRoot, 0L)),
          SnapshotStore.read(s, SnapshotStore.at(vRoot, 0L)))
      },
      oracle = Some(lmOracleSql)),

    // Q101 [extension: e2e corpus pipeline] The batch twin of q91's
    // streaming closure: the whole training-data curation pipeline as ONE
    // DAG — quality rules (q28e) → language-id keep-list (q28c) → exact
    // dedup on normalized text (q27, first-occurrence winner) → per-domain
    // frequency cap (q62, deterministic hash priority) → fixed-budget
    // sequence packing (q54, running-sum bins) — with the DuckDB oracle
    // replaying every stage as CTE algebra. Each stage is individually
    // oracle-gated elsewhere; THIS gate pins that their composition is
    // deterministic end-to-end (every stage's keep-set and ordering is a
    // pure function of the data, never of scan order, task scheduling, or
    // cluster size — the property that makes a 100 TB curation run
    // reproducible and auditable).
    //
    // Scale shape: stages 1–2 are per-row projections fused into the scan
    // (zero shuffle); dedup is one hash shuffle on the normalized text;
    // cap and packing are per-source window ranks — one shuffle on
    // `source`, local top-N/running-sum within each domain, never a
    // global sort before the output ORDER BY.
    "q101_corpus_pipeline" -> QueryDef(
      build = (s, d) => {
        val w = split($("text"), " ")
        val stop = array(lit("the"), lit("a"))
        val profiles = Seq(
          ("en", Seq("the", "a", "fast", "slow", "big", "small")),
          ("es", Seq("data", "table", "row", "column")),
          ("fr", Seq("query", "filter", "join", "group")))
        var t = Tables.documents(s, d)
          .withColumn("n_tok", size(w).cast("long"))
          .withColumn("n_uniq", size(array_distinct(w)).cast("long"))
          .withColumn("n_stop",
            size(filter(w, x => array_contains(stop, x))).cast("long"))
          .filter($("n_tok") >= 20 && $("n_tok") <= 90 &&
            $("n_uniq") * 100 >= $("n_tok") * 25 &&
            $("n_stop") * 100 <= $("n_tok") * 40)
        val wd = array_distinct(w)
        for ((lang, prof) <- profiles)
          t = t.withColumn(s"score_$lang",
            size(array_intersect(wd, array(prof.map(lit): _*))).cast("long"))
        val en = t.filter(
          $("score_en") >= $("score_es") && $("score_en") >= $("score_fr"))
        val dd = en
          .withColumn("norm", regexp_replace(lower(trim($("text"))), "\\s+", " "))
          .withColumn("dup_rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($("norm")).orderBy($("doc_id"))))
          .filter($("dup_rn") === 1)
        val cap = dd
          .withColumn("h",
            pmod($("doc_id") * lit(2654435761L) + lit(7L), lit(1000000007L)))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($("source")).orderBy($("h"), $("doc_id"))).cast("long"))
          .filter($("rk") <= 40)
        val off = org.apache.spark.sql.expressions.Window
          .partitionBy($("source")).orderBy($("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        cap
          .withColumn("start_off", coalesce(sum($("n_tok")).over(off), lit(0L)))
          .withColumn("bin", floor($("start_off") / 256).cast("long"))
          .select($("doc_id"), $("source"), $("n_tok"), $("rk"), $("bin"))
          .orderBy($("doc_id"))
      },
      oracle = Some(
        """WITH t AS (
          |  SELECT doc_id, source, text, string_split(text, ' ') AS w
          |  FROM documents),
          |q AS (
          |  SELECT *, CAST(len(w) AS BIGINT) AS n_tok FROM t
          |  WHERE len(w) BETWEEN 20 AND 90
          |    AND len(list_distinct(w)) * 100 >= len(w) * 25
          |    AND len(list_filter(w, x -> x IN ('the','a'))) * 100 <= len(w) * 40),
          |l AS (
          |  SELECT *,
          |    len(list_intersect(list_distinct(w),
          |      ['the','a','fast','slow','big','small'])) AS s_en,
          |    len(list_intersect(list_distinct(w),
          |      ['data','table','row','column'])) AS s_es,
          |    len(list_intersect(list_distinct(w),
          |      ['query','filter','join','group'])) AS s_fr
          |  FROM q),
          |en AS (SELECT * FROM l WHERE s_en >= s_es AND s_en >= s_fr),
          |dd AS (
          |  SELECT * FROM (
          |    SELECT *, row_number() OVER (
          |      PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
          |      ORDER BY doc_id) AS dup_rn
          |    FROM en) WHERE dup_rn = 1),
          |cap AS (
          |  SELECT * FROM (
          |    SELECT *, CAST(row_number() OVER (PARTITION BY source
          |      ORDER BY (doc_id * 2654435761 + 7) % 1000000007, doc_id)
          |      AS BIGINT) AS rk
          |    FROM dd) WHERE rk <= 40),
          |packed AS (
          |  SELECT *, CAST(COALESCE(sum(n_tok) OVER (
          |      PARTITION BY source ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          |    AS start_off
          |  FROM cap)
          |SELECT doc_id, source, n_tok, rk, start_off // 256 AS bin
          |FROM packed ORDER BY doc_id""".stripMargin))
  )
}
