package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.MinHash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.12 Q27 + extensions: the deduplication family over `documents`
  * (north-star surface; the reference has no analogue).
  *
  * The testdata plants 25 near-duplicate pairs at 3-shingle Jaccard ≥ 0.5
  * with a clean gap to the ~0.1 background, so 0.5 is the family threshold.
  *
  * Scale design: nothing here is all-pairs on the big side. Exact dedup is a
  * hash groupBy on the normalized text (one shuffle, combinable). MinHash
  * candidates come from an equi-join on (band, band-signature) — the classic
  * banded-LSH bucket join; the quadratic blow-up is confined to rows sharing
  * a bucket. SimHash candidates come from an equi-join on 16-bit signature
  * chunks (any pair within Hamming distance 3 of a 64-bit signature must
  * agree on one of 4 chunks — pigeonhole).
  */
object LlmDedup {
  private def $(name: String) = col(name)

  /** doc_id → sorted distinct xxhash64 of its 3-shingles, via the native
    * codegen'd [[graft.plans.ShingleHashes]] (bit-compatible with hashing
    * the string shingles, ~15× less per-row overhead than the HOF chain).
    */
  private def shingleHashed(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.install(s)
    // documents is a few small parquet files ⇒ few scan partitions, but the
    // per-row work here (shingling + k×|shingles| universal hashing) is the
    // family's compute core — spread it over all task slots first. The
    // repartition shuffles only (doc_id, text); signatures/bands stay
    // shuffle-free after it.
    Tables.documents(s, d)
      .repartition($("doc_id"))
      .select($("doc_id"), call_function("shingle_hashes", $("text"), lit(3)).as("hs"))
  }

  /** Same shingling in DuckDB (1-based list indexing matches element_at). */
  private val shingledSql =
    """SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w)-1, 1)),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)""".stripMargin

  /** Banded MinHash-LSH near-duplicate pairs at Jaccard ≥ 0.5 (the q27b
    * construction, shared with q27e): signature → 64 bands × 2 rows →
    * bucket groupBy with in-bucket pair expansion → exact Jaccard verify.
    *
    * Signatures come from the native [[graft.plans.MinHashSigArr]] — one
    * codegen'd call per document, bit-identical to the A7 Aggregator path
    * (LlmSpec asserts equality) but with no explode/groupBy shuffle.
    */
  /** @param bandRows rows per LSH band (k/bandRows bands). Calibrate to the
    *   threshold AND the background similarity: candidate probability is
    *   1-(1-J^r)^b, so r=2/b=64 separates J≥0.5 pairs from a ~0.1
    *   background (q27b word shingles), while the denser char-n-gram space
    *   (background J≈0.3) needs r=8/b=16 — at r=2 virtually EVERY pair
    *   would become a candidate and the verify join goes quadratic.
    */
  private def nearDupPairs(sh: DataFrame, threshold: Double = 0.5,
      bandRows: Int = 2): DataFrame = {
    val k = 128; val bands = k / bandRows
    // Docs with no shingles (<3 tokens) can't be near-duplicates under
    // 3-shingle Jaccard — and, left in, they'd all share the degenerate
    // all-sentinel signature and pile into the SAME 64 buckets, turning a
    // short-doc-heavy corpus into one O(E²) candidate blow-up. Exclude them
    // from signature/banding entirely (the pre-r4 explode+groupBy path
    // dropped them implicitly; this restores that semantics explicitly).
    //
    // Exact-duplicate collapse before LSH: docs with IDENTICAL shingle sets
    // share the whole signature, so a class of c exact copies would land
    // together in all `bands` buckets and expand c²/2 candidate pairs in
    // EACH — the classic hot-bucket straggler (a boilerplate page repeated
    // 10^5 times turns one task into the whole job). One representative per
    // distinct set enters banding; the pairs the class implies are
    // reconstructed below (intra-class: jac exactly 1; cross-class: every
    // member pair inherits the representatives' Jaccard, since members'
    // sets are identical). Output is bit-identical to banding all docs.
    // class key = xxhash64 of the sorted hash array, NOT the array itself:
    // an 8-byte grouping key keeps the agg in HashAggregate (array keys
    // force a SortAggregate — a full sort of every shingle set, measured
    // 3× slower on the dense char-gram sets) and an order of magnitude
    // less shuffle-key weight. A 64-bit collision (~1e-9 at corpus scale,
    // the same budget the shingle hashing itself runs on) would merge two
    // classes and emit a wrong pair — acceptable for dedup the same way
    // the underlying shingle hashes are; widen to twin keys at 100 TB.
    // `first(hs)` is deterministic in value: class members share the set.
    val classes = sh.filter(size($("hs")) > 0)
      .groupBy(xxhash64($("hs")).as("ck"))
      .agg(sort_array(collect_list($("doc_id"))).as("ids"), first($("hs")).as("hs"))
      .select($("hs"), $("ids"), element_at($("ids"), 1).as("rep"))
      .cache()
    // intra-class pairs: identical sets ⇒ inter = uni = |set|, jac = 1.0
    // (≥ any threshold ≤ 1). Expansion is pure output materialization —
    // c²/2 rows ARE the answer for c exact copies — paid once, not per band.
    val intra = classes.filter(size($("ids")) > 1)
      .select(size($("hs")).as("n"), explode(flatten(transform($("ids"), (a, i) =>
        transform(slice($("ids"), i + 2, size($("ids"))), b =>
          struct(a.as("a_id"), b.as("b_id")))))).as("p"))
      .select($("p.a_id"), $("p.b_id"), $("n").as("inter"), $("n").as("uni"),
        lit(1.0).as("jac"))
    val sigs = classes
      .select($("rep").as("doc_id"), call_function("minhash_sig", $("hs"), lit(k)).as("sig"))
    // bucket key = xxhash64(band, slot1, slot2): an 8-byte long through the
    // shuffle instead of a ~40-byte concat string. A cross-band 64-bit
    // collision (~1e-9 at this key count) only MERGES two buckets, adding
    // false candidates that the exact-Jaccard verify removes — recall is
    // unaffected.
    val banded = sigs.select($("doc_id"), explode(
      transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(b +: (0 until bandRows).map(j =>
          element_at($("sig"), b * bandRows + j + 1)): _*))).as("bucket"))
    val cand = banded
      .groupBy($("bucket"))
      .agg(sort_array(collect_list($("doc_id"))).as("ids"))
      .filter(size($("ids")) > 1)
      .select(explode(flatten(transform($("ids"), (a, i) =>
        transform(slice($("ids"), i + 2, size($("ids"))), b =>
          struct(a.as("a_id"), b.as("b_id")))))).as("p"))
      .select($("p.a_id"), $("p.b_id"))
      .dropDuplicates("a_id", "b_id")
    val sa = classes.select($("rep").as("a_id"), $("hs").as("sa"), $("ids").as("aids"))
    val sb = classes.select($("rep").as("b_id"), $("hs").as("sb"), $("ids").as("bids"))
    // verify on representatives, then expand to member pairs (classes are
    // disjoint, so intra/cross can't collide and no dedup pass is needed);
    // least/greatest restores the a_id < b_id convention — class membership
    // doesn't follow representative order.
    val cross = cand.join(sa, "a_id").join(sb, "b_id")
      .withColumn("inter", size(array_intersect($("sa"), $("sb"))))
      .withColumn("uni", size($("sa")) + size($("sb")) - $("inter"))
      .withColumn("jac", $("inter").cast("double") / $("uni").cast("double"))
      .filter($("jac") >= threshold)
      .select($("inter"), $("uni"), $("jac"), explode(flatten(transform($("aids"), a =>
        transform($("bids"), b =>
          struct(least(a, b).as("a_id"), greatest(a, b).as("b_id")))))).as("p"))
      .select($("p.a_id"), $("p.b_id"), $("inter"), $("uni"), $("jac"))
    intra.unionByName(cross)
  }

  val defs: Map[String, QueryDef] = Map(

    // Q27 [extension: exact dedup] hash-groupBy on the normalized text —
    // ONE shuffle on the group key with map-side partial aggregation; the
    // canonical exact-dedup shape at any scale. keep = min doc_id.
    "q27_dedup_exact" -> QueryDef(
      build = (s, d) =>
        Tables.documents(s, d)
          .withColumn("norm", regexp_replace(lower(trim($("text"))), "\\s+", " "))
          .groupBy($("norm"))
          .agg(min($("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .select($("keep_id"), $("n_copies"))
          .orderBy($("keep_id")),
      oracle = Some(
        """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
          |FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
          |      FROM documents)
          |GROUP BY norm ORDER BY keep_id""".stripMargin)),

    // Q27b [extension: MinHash-LSH near-dedup; A7 Aggregator] the full
    // banded pipeline: shingle → hash to 64-bit → explode → MinHashSigAgg
    // (custom typed Aggregator, k=128) → 64 bands × 2 rows → bucket groupBy
    // with in-bucket pair generation → exact Jaccard verify ≥ 0.5. Bands
    // with r=2 give miss-probability (1-s²)^64 ≤ 1e-8 at s=0.5, so the LSH
    // output equals the brute-force oracle with overwhelming margin.
    // Jaccard = |∩| / |∪| is one integer division → bit-identical doubles.
    //
    // Scale/perf notes: shingle SETS travel as sorted 64-bit hashes, not
    // strings (xxhash64 collisions are ~1e-9 at 1e5 shingles — far below
    // the gate's tolerance; at 100 TB you'd widen to 128-bit). Candidate
    // pairs come from groupBy(bucket)+collect_list — one shuffle keyed by
    // bucket, pairs expand only inside a bucket (bounded by band width),
    // never a global self-join.
    "q27b_dedup_minhash" -> QueryDef(
      build = (s, d) =>
        nearDupPairs(shingleHashed(s, d).cache())
          .select($("a_id"), $("b_id"), $("inter").cast("long").as("inter"),
            $("uni").cast("long").as("uni"), $("jac"))
          .orderBy($("a_id"), $("b_id")),
      oracle = Some(
        s"""WITH sh AS ($shingledSql)
           |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |  CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS inter,
           |  CAST(len(a.shingles) + len(b.shingles)
           |    - len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS uni,
           |  CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
           |    / CAST(len(a.shingles) + len(b.shingles)
           |        - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) AS jac
           |FROM sh a, sh b
           |WHERE a.doc_id < b.doc_id
           |  -- mirror the engine's empty-shingle exclusion: <3-token docs
           |  -- have no 3-shingles, and 0/0 Jaccard is NaN (which DuckDB
           |  -- orders above all doubles — it must not pass the threshold)
           |  AND len(a.shingles) > 0 AND len(b.shingles) > 0
           |  AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
           |    / CAST(len(a.shingles) + len(b.shingles)
           |        - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) >= 0.5
           |ORDER BY a_id, b_id""".stripMargin),
      headline = true),

    // Q27g [extension: character n-gram Jaccard near-dedup] the same banded
    // MinHash-LSH pipeline as q27b but over 5-CHARACTER n-grams — the
    // dedup-literature variant that is robust to tokenization and
    // whitespace drift word shingles miss (a doc re-wrapped or
    // re-punctuated keeps ~all its char 5-grams but loses word shingles).
    // Character grams are much denser than word shingles, so near-dup
    // Jaccard runs far higher (planted pairs measure ≥ 0.93 vs ~0.31
    // background) — the 0.6 threshold sits in that gap, and the banding is
    // recalibrated to the denser space: r=8 rows × 16 bands keeps the
    // ~0.31 background out of the candidate set (P ≈ 1-(1-0.31^8)^16 ≈
    // 1.4e-3 per pair) while missing a planted J≥0.93 pair with
    // probability (1-0.93^8)^16 ≈ 2e-6 — so the banded output still
    // equals the brute-force oracle, without the quadratic candidate
    // blow-up r=2 would produce here (at r=2, J=0.3 pairs become
    // candidates with P≈0.998). The n-gram set is built by the native codegen'd
    // [[graft.plans.CharNgramHashes]] (one call per row; same xxhash64
    // convention as q27b — the oracle intersects the string lists instead).
    "q27g_dedup_char_ngram" -> QueryDef(
      build = (s, d) => {
        graft.GraftExtensions.install(s)
        val sh = Tables.documents(s, d)
          .repartition($("doc_id"))
          .select($("doc_id"),
            call_function("char_ngram_hashes", $("text"), lit(5)).as("hs"))
        nearDupPairs(sh.cache(), threshold = 0.6, bandRows = 8)
          .select($("a_id"), $("b_id"), $("inter").cast("long").as("inter"),
            $("uni").cast("long").as("uni"), $("jac"))
          .orderBy($("a_id"), $("b_id"))
      },
      oracle = Some(
        """WITH g AS (SELECT doc_id, list_distinct(list_transform(
          |    range(1, greatest(length(text) - 5 + 2, 1)),
          |    i -> substring(text, i, 5))) AS ng FROM documents)
          |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          |  CAST(len(list_intersect(a.ng, b.ng)) AS BIGINT) AS inter,
          |  CAST(len(a.ng) + len(b.ng)
          |    - len(list_intersect(a.ng, b.ng)) AS BIGINT) AS uni,
          |  CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
          |    / CAST(len(a.ng) + len(b.ng)
          |        - len(list_intersect(a.ng, b.ng)) AS DOUBLE) AS jac
          |FROM g a, g b
          |WHERE a.doc_id < b.doc_id
          |  -- mirror the engine's empty-set exclusion (q27b convention)
          |  AND len(a.ng) > 0 AND len(b.ng) > 0
          |  AND CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
          |    / CAST(len(a.ng) + len(b.ng)
          |        - len(list_intersect(a.ng, b.ng)) AS DOUBLE) >= 0.6
          |ORDER BY a_id, b_id""".stripMargin)),

    // Q27e [extension: corpus dedup end-to-end] near-dup pairs → connected
    // components (iterative min-label propagation — the Pregel pattern, a
    // handful of bounded join+agg rounds since component diameter is tiny)
    // → keep the min-doc_id representative per component. This is the
    // operator a training-data pipeline actually runs: "give me the corpus
    // with near-duplicates collapsed". All-integer ⇒ hash-safe; oracle
    // computes the same closure with a recursive CTE over brute-force pairs.
    "q27e_dedup_corpus" -> QueryDef(
      build = (s, d) => {
        val sh = shingleHashed(s, d).cache()
        val pairs = nearDupPairs(sh).select($("a_id"), $("b_id")).cache()
        // Components via the SHARED alternating star contraction
        // (Graph.starContract — Kiveris et al.): the contraction runs ONLY
        // over edge-touched vertices — the dup graph, typically a sliver
        // of the corpus (~10% of docs here; far less at 100 TB) — and its
        // cycle count is O(log² n) REGARDLESS of component diameter. The
        // min-label propagation loop this replaces was O(ecc(min)) — ample
        // for cliquey near-dup clusters, silently wrong on a pathological
        // pairwise dup CHAIN longer than its round cap (the q86 lesson; see
        // Graph.starContract's doc). Every untouched doc is trivially its
        // own component and joins back in one final pass.
        val labels = Graph.starContract(
          pairs.toDF("src", "dst"),
          Graph.labelPartitions(pairs.count()))
        sh.select($("doc_id"))
          .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
          .select($("doc_id"), coalesce($("rep"), $("doc_id")).as("rep"))
          .withColumn("kept", $("doc_id") === $("rep"))
          .orderBy($("doc_id"))
      },
      oracle = Some(
        s"""WITH RECURSIVE sh AS ($shingledSql),
           |pairs AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
           |  FROM sh a, sh b
           |  WHERE a.doc_id < b.doc_id
           |    -- mirror the engine's empty-shingle exclusion (see q27b)
           |    AND len(a.shingles) > 0 AND len(b.shingles) > 0
           |    AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
           |      / CAST(len(a.shingles) + len(b.shingles)
           |          - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) >= 0.5),
           |edges(a, b) AS (SELECT a_id, b_id FROM pairs UNION SELECT b_id, a_id FROM pairs),
           |reach(a, b) AS (
           |  SELECT a, b FROM edges
           |  UNION
           |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
           |reps AS (SELECT a AS doc_id, least(a, min(b)) AS rep FROM reach GROUP BY a)
           |SELECT d.doc_id, coalesce(r.rep, d.doc_id) AS rep,
           |  coalesce(r.rep, d.doc_id) = d.doc_id AS kept
           |FROM documents d LEFT JOIN reps r ON d.doc_id = r.doc_id
           |ORDER BY d.doc_id""".stripMargin)),

    // Q27f [extension: exact span dedup] the C4 / "Deduplicating Training
    // Data" (Lee et al. 2022) line-level pass: split every document into
    // 10-token spans, keep only the corpus-wide FIRST occurrence of each
    // distinct span (min (doc_id, pos)), and reassemble documents from
    // their surviving spans. This removes boilerplate that near-dup DOC
    // dedup (q27b/e) cannot see — repeated spans inside otherwise-distinct
    // documents.
    //
    // Scale shape: chunking is a pure projection; the dedup is ONE
    // combinable groupBy (min(struct) has a map-side partial) keyed by the
    // span text, and reassembly is one groupBy(doc_id). At 100 TB the
    // group key becomes a 128-bit span hash (shuffle bytes), the same
    // trade q27b documents for shingles; the gate keys on the exact string
    // so the DuckDB oracle replicates byte-for-byte.
    "q27f_dedup_spans" -> QueryDef(
      build = (s, d) => {
        val docs = Tables.documents(s, d)
        val w = split($("text"), " ")
        val nTotal = (((size(w) - 1) / 10).cast("int") + 1)
        val chunked = docs.select($("doc_id"),
          posexplode(transform(sequence(lit(0), nTotal - 1),
            i => array_join(slice(w, i * 10 + 1, lit(10)), " ")))
            .as(Seq("pos", "chunk")))
        val keepers = chunked.groupBy($("chunk"))
          .agg(min(struct($("doc_id"), $("pos"))).as("k"))
        val kept = chunked.join(keepers, "chunk")
          .filter($("doc_id") === $("k.doc_id") && $("pos") === $("k.pos"))
        val rebuilt = kept.groupBy($("doc_id"))
          .agg(count(lit(1)).as("n_kept"),
            md5(array_join(transform(
              sort_array(collect_list(struct($("pos"), $("chunk")))),
              x => x.getField("chunk")), " ")).as("m"))
        docs.select($("doc_id"), nTotal.cast("long").as("n_total"))
          .join(rebuilt, Seq("doc_id"), "left")
          .select($("doc_id"), $("n_total"),
            coalesce($("n_kept"), lit(0L)).as("n_kept"),
            ($("n_total") - coalesce($("n_kept"), lit(0L))).as("n_dropped"),
            coalesce($("m"), md5(lit(""))).as("rebuilt_md5"))
          .orderBy($("doc_id"))
      },
      oracle = Some(
        """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          |chunks AS (
          |  SELECT doc_id, i AS pos, array_to_string(w[i*10+1 : i*10+10], ' ') AS chunk
          |  FROM docs, unnest(range(0, (len(w)-1)//10 + 1)) AS t(i)),
          |ranked AS (
          |  SELECT *, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
          |  FROM chunks),
          |kept AS (SELECT doc_id, pos, chunk FROM ranked WHERE rn = 1),
          |rebuilt AS (
          |  SELECT doc_id, count(*) AS n_kept,
          |    md5(array_to_string(list(chunk ORDER BY pos), ' ')) AS m
          |  FROM kept GROUP BY doc_id),
          |totals AS (SELECT doc_id, (len(w)-1)//10 + 1 AS n_total FROM docs)
          |SELECT t.doc_id, CAST(t.n_total AS BIGINT) AS n_total,
          |  CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
          |  CAST(t.n_total - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped,
          |  coalesce(r.m, md5('')) AS rebuilt_md5
          |FROM totals t LEFT JOIN rebuilt r USING (doc_id)
          |ORDER BY doc_id""".stripMargin)),

    // Q27c [extension: SimHash near-dedup] SimHash over shingle hashes;
    // candidate pairs share one of four 16-bit signature chunks (pigeonhole:
    // Hamming ≤ 3 ⇒ some chunk equal), verified at Hamming ≤ 3.
    //
    // Shingles are hashed with the native
    // [[graft.plans.ShinglePolyHashes]] double polynomial (62 usable bits)
    // rather than xxhash64 PRECISELY so DuckDB can replicate the whole
    // pipeline with list_reduce folds (the q28 fingerprint convention) —
    // this turned q27c from a rows-only gate row into a full hash-checked
    // one. The oracle rebuilds the signatures bit-for-bit (62 majority-vote
    // terms, generated below) and brute-forces the Hamming-≤3 pairs.
    "q27c_dedup_simhash" -> QueryDef(
      build = (s, d) => {
        graft.GraftExtensions.install(s)
        val sig = Tables.documents(s, d)
          .repartition($("doc_id"))
          .select($("doc_id"),
            explode(call_function("shingle_poly_hashes", $("text"), lit(3))).as("h"))
          .groupBy($("doc_id"))
          .agg(MinHash.simhashSig($("h")).as("sig"))
        val chunkCols = (0 to 3).map(c => concat_ws(":", lit(c),
          shiftrightunsigned($("sig"), 16 * c).bitwiseAND(lit(0xFFFFL))))
        val chunks = sig.select($("doc_id"), $("sig"),
          explode(array(chunkCols: _*)).as("chunk"))
        val cand = chunks.as("a")
          .join(chunks.as("b"),
            col("a.chunk") === col("b.chunk") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
            col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
          .dropDuplicates("a_id", "b_id")
        cand
          .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
          .filter($("hamming") <= 3)
          .select($("a_id"), $("b_id"), $("hamming").cast("long").as("hamming"))
          .orderBy($("a_id"), $("b_id"))
      },
      oracle = Some(simhashOracleSql)),

    // Q27h [extension: cross-corpus bloom dedup] "which docs in the NEW
    // crawl shard already exist in the reference corpus" — the incremental
    // flavor of exact dedup, and at 100 TB the one where a plain join is
    // wasteful: the reference corpus is petabyte-class but its KEY SET
    // compresses to a bloom filter (~1.2 GB per 10⁹ keys at 1% fpp, built
    // with one aggregation job), so the new shard is pre-filtered by a
    // codegen'd probe (`bloom_might_contain`, the same expression Spark's
    // InjectRuntimeFilter plants) before anything shuffles. Only the ~fpp
    // survivors reach the exact confirm join, which removes bloom/hash
    // false positives — so the OUTPUT is exact (blooms have no false
    // negatives) and the oracle is a plain semi-join. Dedup key = md5 of
    // the 8-word prefix (the fingerprint family of q28's rolling hash;
    // full-text md5 finds zero dups in this synthetic corpus).
    "q27h_dedup_bloom" -> QueryDef(
      build = (s, d) => {
        graft.GraftExtensions.install(s)
        val fp = md5(array_join(slice(split($("text"), " "), 1, 8), " "))
        val docs = Tables.documents(s, d)
        val ref = docs.filter(pmod($("doc_id"), lit(2L)) === 0)
          .select($("doc_id").as("ref_id"), fp.as("fp"))
        val neu = docs.filter(pmod($("doc_id"), lit(2L)) === 1)
          .select($("doc_id"), fp.as("fp"))
        val bloom = ref.select(xxhash64($("fp")).as("h"))
          .stat.bloomFilter("h", 1 << 17, 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos)
        neu.filter(call_function("bloom_might_contain",
            lit(bos.toByteArray), xxhash64($("fp"))))
          .join(ref.select($("fp")).distinct(), Seq("fp"), "left_semi")
          .select($("doc_id"), $("fp").as("dup_fp"))
          .orderBy($("doc_id"))
      },
      oracle = Some(
        """WITH d AS (
          |  SELECT doc_id,
          |    md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp
          |  FROM documents)
          |SELECT doc_id, fp AS dup_fp FROM d
          |WHERE doc_id % 2 = 1
          |  AND fp IN (SELECT fp FROM d WHERE doc_id % 2 = 0)
          |ORDER BY doc_id""".stripMargin))
  )

  /** DuckDB replica of the full q27c pipeline. The per-shingle hash is the
    * [[graft.plans.ShinglePolyHashes]] double polynomial; the signature is
    * the per-bit majority over a doc's shingle hashes (bits 62-63 are
    * structurally zero, so 62 generated terms suffice); pairs are
    * brute-forced (the oracle need not be sub-quadratic, only exact).
    */
  private def simhashOracleSql: String = {
    val mod = graft.plans.ShinglePolyHashes.Mod
    def poly(mult: Long): String =
      "list_reduce(list_prepend(0::BIGINT, " +
        "list_transform(string_split(s, ''), c -> ascii(c)::BIGINT)), " +
        s"(a,b) -> (a*$mult+b) % $mod)"
    val hash = s"${poly(graft.plans.ShinglePolyHashes.Mult1)} * $mod " +
      s"+ ${poly(graft.plans.ShinglePolyHashes.Mult2)}"
    val sigTerms = (0 until 62).map { j =>
      s"(CASE WHEN 2*len(list_filter(hs, h -> ((h >> $j) & 1) = 1)) > len(hs) " +
        s"THEN (1::BIGINT << $j) ELSE 0::BIGINT END)"
    }.mkString("\n    + ")
    s"""WITH sh AS ($shingledSql),
       |hs AS (
       |  SELECT doc_id, list_transform(shingles, s -> $hash) AS hs
       |  FROM sh WHERE len(shingles) > 0),
       |sigs AS (
       |  SELECT doc_id, $sigTerms AS sig FROM hs)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |FROM sigs a, sigs b
       |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sig, b.sig)) <= 3
       |ORDER BY a_id, b_id""".stripMargin
  }
}
