package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.12 Q26 + extensions: similarity search over `embeddings`
  * (64-dim float vectors; reference has no analogue — north-star surface).
  *
  * Float determinism: cosine is computed as a LEFT FOLD in element order with
  * double accumulation — `0.0 + x1*y1 + x2*y2 + …` — on both engines
  * (Spark `aggregate(zip_with(...))`, DuckDB `list_reduce(list_prepend(0.0,
  * list_transform(list_zip(...))))`). IEEE-754 ops are deterministic given
  * identical operand order, so the doubles are bit-identical and hash-safe.
  * The final `dot / (norm_q * norm_c)` is the same association both sides.
  */
object LlmSimilarity {
  private def $(name: String) = col(name)

  /** Left-fold dot product of two float-array columns, double accumulation —
    * the native codegen'd [[graft.plans.FloatDotProduct]] (a HOF
    * `aggregate(zip_with(...))` computes the identical value but runs its
    * lambda interpreted: 60× slower on the all-pairs scan at sf0.1).
    */
  def dot(a: Column, b: Column): Column = call_function("float_dot", a, b)

  /** L2 norm with the identical fold. */
  def norm(a: Column): Column = sqrt(call_function("float_dot", a, a))

  /** embeddings with a precomputed norm column (one pass, reused). */
  private[queries] def normed(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.install(s)
    Tables.embeddings(s, d).select($("vec_id"), $("embedding"), norm($("embedding")).as("nrm"))
  }

  private[queries] val normedSql =
    """SELECT vec_id, embedding,
      |  sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
      |    x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))), (a,b)->a+b)) AS nrm
      |FROM embeddings""".stripMargin

  private[queries] val dotSql =
    """list_reduce(list_prepend(0.0, list_transform(
      |    list_zip(q.embedding, c.embedding),
      |    p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE))), (a,b)->a+b)""".stripMargin

  /** MRL truncated-retrieval: leading-16-dim shortlist (top-512 — 1% of
    * the sf0.1 corpus — by truncated cosine) → exact full-dim rerank to
    * top-3. See q26g.
    *
    * Stage-1 ranking is a BOUNDED partial top-k ([[graft.plans
    * .TopKByScore]]: a size-512 heap per query, combinable map-side), not
    * a per-qid Window sort — the Window form puts every query's full
    * candidate set through partition sorts, the all-rows-per-key shape
    * that stragglers at 100× data (VERDICT r12). The shuffle carries one
    * 512-pair buffer per (query, map partition); nothing downstream of
    * the scan depends on corpus size. The tie rule (score desc, id asc)
    * is identical to the old `row_number` ordering, so results are
    * bit-stable.
    */
  def mrlTopK(s: SparkSession, d: String): DataFrame = {
    val dims = 16; val shortlist = 512
    val n = normed(s, d)
    val t = n.select($("vec_id"),
      slice($("embedding"), 1, dims).as("te"))
      .withColumn("tn", norm($("te")))
    val qT = t.filter($("vec_id") % 50 === 0)
      .select($("vec_id").as("qid"), $("te").as("qte"), $("tn").as("qtn"))
    val topk = org.apache.spark.sql.GraftSqlShim.column(
      graft.plans.TopKByScore(
        org.apache.spark.sql.GraftSqlShim.expression(
          dot($("qte"), $("te")) / ($("qtn") * $("tn"))),
        org.apache.spark.sql.GraftSqlShim.expression($("vec_id")),
        shortlist).toAggregateExpression())
    val short = t.join(broadcast(qT), $("vec_id") =!= $("qid"))
      .groupBy($("qid")).agg(topk.as("top"))
      .select($("qid"), explode($("top.id")).as("cid")) // ids only into the rerank join
    val qF = n.filter($("vec_id") % 50 === 0)
      .select($("vec_id").as("qid"), $("embedding").as("qe"), $("nrm").as("qn"))
    val w2 = Window.partitionBy($("qid")).orderBy(desc("cos"), $("cid"))
    short
      .join(n.select($("vec_id").as("cid"), $("embedding").as("ce"),
        $("nrm").as("cn")), "cid")
      .join(broadcast(qF), "qid")
      .select($("qid"), $("cid"),
        (dot($("qe"), $("ce")) / ($("qn") * $("cn"))).as("cos"))
      .withColumn("rnk", row_number().over(w2).cast("long"))
      .filter($("rnk") <= 3)
  }

  /** Exact brute-force cosine top-3 per query vector (q26's body; also the
    * in-engine referee the q26b/q26c self-checking gates compare against).
    */
  def exactTopK(s: SparkSession, d: String): DataFrame = {
    val n = normed(s, d)
    val q = n.filter($("vec_id") % 50 === 0)
      .select($("vec_id").as("qid"), $("embedding").as("qe"), $("nrm").as("qn"))
    val w = Window.partitionBy($("qid")).orderBy(desc("cos"), $("cid"))
    n.join(broadcast(q), $("vec_id") =!= $("qid"))
      .select($("qid"), $("vec_id").as("cid"),
        (dot($("qe"), $("embedding")) / ($("qn") * $("nrm"))).as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($("rnk") <= 3)
      .orderBy($("qid"), $("rnk"))
  }

  /** Self-checking gate row per ANN query id: did the approximate top-3
    * recover at least `minHits` of the exact top-3? This turns the
    * inherently non-oracle-able approximate result into a hashable
    * contract (`SELECT qid, true`): the DuckDB oracle asserts every row is
    * `(qid, true)`, and the engine side only produces `true` when the ANN
    * structure actually holds its measured per-query recall. The exact
    * referee is computed in-engine (brute force) — at 100 TB you'd sample
    * the query set, which is what vec_id % 50 already is.
    */
  private def recallGate(s: SparkSession, d: String,
      approx: DataFrame, minHits: Int): DataFrame = {
    val hits = approx.select($("qid"), $("cid"))
      .join(exactTopK(s, d).select($("qid"), $("cid")), Seq("qid", "cid"))
      .groupBy($("qid")).agg(count(lit(1)).as("hits"))
    normed(s, d).filter($("vec_id") % 50 === 0)
      .select($("vec_id").as("qid"))
      .join(hits, Seq("qid"), "left")
      .select($("qid"), (coalesce($("hits"), lit(0L)) >= minHits).as("recall_ok"))
      .orderBy($("qid"))
  }

  private val recallGateOracle =
    """SELECT vec_id AS qid, true AS recall_ok FROM embeddings
      |WHERE vec_id % 50 = 0 ORDER BY qid""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // Q52 [extension: pre-filtered ANN] Vector search restricted by a
    // metadata predicate — the "filtered ANN" every retrieval stack needs
    // (search only docs passing a quality/lang gate). Candidates =
    // embeddings keyed-equi-joined to the filtered documents table
    // (vec_id = doc_id, both sides shuffle-partitioned on the key at
    // scale — no broadcast of a corpus-sized side); query vectors stay
    // broadcast. Exact top-3 among survivors so the gate is oracle-exact;
    // the same pre-filter composes with the q26b/q26c/q26d sketch paths
    // unchanged since it only shrinks the candidate set.
    "q52_filtered_ann" -> QueryDef(
      build = (s, d) => {
        val nm = normed(s, d)
        val keep = Tables.documents(s, d)
          .filter($("lang") === "en").select($("doc_id"))
        val cand = nm.join(keep, nm("vec_id") === keep("doc_id"), "left_semi")
        val q = nm.filter($("vec_id") % 50 === 0)
          .select($("vec_id").as("qid"), $("embedding").as("qe"), $("nrm").as("qn"))
        val w = Window.partitionBy($("qid")).orderBy(desc("cos"), $("cid"))
        cand.join(broadcast(q), $("vec_id") =!= $("qid"))
          .select($("qid"), $("vec_id").as("cid"),
            (dot($("qe"), $("embedding")) / ($("qn") * $("nrm"))).as("cos"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter($("rnk") <= 3)
          .orderBy($("qid"), $("rnk"))
      },
      oracle = Some(
        s"""WITH n AS ($normedSql),
           |pairs AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS cid,
           |    $dotSql / (q.nrm * c.nrm) AS cos
           |  FROM n q, n c
           |  WHERE q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id
           |    AND c.vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en'))
           |SELECT qid, cid, cos, rnk FROM (
           |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
           |  FROM pairs)
           |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin),
      headline = true),

    // Q26 [J8 + extension] brute-force cosine top-3 per query vector.
    // The query side (vec_id % 50 = 0) is tiny and BROADCAST; the candidate
    // side streams — so the "cross join" is really a broadcast nested loop
    // over the big side with no shuffle of the candidates. This is the exact
    // oracle/baseline path; the 100 TB path is q26b (LSH-pruned).
    "q26_ann_topk" -> QueryDef(
      build = (s, d) => exactTopK(s, d),
      oracle = Some(
        s"""WITH n AS ($normedSql),
           |pairs AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS cid,
           |    $dotSql / (q.nrm * c.nrm) AS cos
           |  FROM n q, n c WHERE q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id)
           |SELECT qid, cid, cos, rnk FROM (
           |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
           |  FROM pairs)
           |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin),
      headline = true),

    // Q26b [extension, scale path] multi-table random-hyperplane LSH ANN:
    // L=6 hash tables × k=4 sign bits. A vector lands in one bucket per
    // table; candidates = vectors sharing any (table, bucket) with the
    // query. At 100 TB `(table, bucket)` is the shuffle/partition key and
    // each bucket is searched locally — no all-pairs anywhere; the L-way
    // row amplification is the classic LSH space-for-pruning trade. Planes
    // are hash-derived (no data dependence, identical on every executor).
    // Approximate ⇒ the gate row is the SELF-CHECK `(qid, recall_ok)`:
    // recall_ok = the LSH top-3 recovered ≥2 of the exact top-3 for that
    // query (measured: 3/3 at sf0.001/0.01/0.1 — planes are seeded, so the
    // result is deterministic). Aggregate recall floors stay in LlmSpec.
    "q26b_ann_lsh" -> QueryDef(
      build = (s, d) => recallGate(s, d, lshTopK(s, d), minHits = 2),
      oracle = Some(recallGateOracle)),

    // Q26c [extension, scale path #2] IVF (inverted-file) ANN — see
    // [[ivfTopK]] for the full design. Same self-checking gate as q26b:
    // recall_ok = the IVF probe set recovered ≥1 of the exact top-3
    // (uniform-random embeddings are IVF's worst case; per-query hits
    // measured 1-3 across SFs, aggregate 0.80-0.93 pinned in LlmSpec).
    "q26c_ann_ivf" -> QueryDef(
      build = (s, d) => recallGate(s, d, ivfTopK(s, d), minHits = 1),
      oracle = Some(recallGateOracle)),

    // Q26d [extension, scale path #3] Product-Quantization ANN — the
    // memory-compression leg of the ANN family (q26b prunes candidates,
    // q26c partitions them, q26d shrinks them). Vectors are chopped into
    // m=16 4-dim subspaces, each quantized to one of 16 trained centroids:
    // the serving index is 16×4 bits of codes + an 8-byte norm per vector
    // (~16 B) instead of 64 floats (256 B) — a 16× compression that is what
    // makes an in-memory exhaustive scan feasible at 100 TB (FAISS
    // IndexPQ's asymmetric-distance design; composes with q26c by scanning
    // codes only inside probed IVF cells). The ADC scan never touches raw
    // embeddings: queries precompute per-subspace lookup tables against the
    // broadcast codebook and each candidate costs m table lookups. A
    // shortlist of the top-128 approximate hits is then reranked with exact
    // cosine (touching 128 full vectors per query, not N). Same
    // self-checking `(qid, recall_ok)` gate as q26b/c; minHits=1 from the
    // measured worst case across SFs (3/3 at sf0.001/0.01; sf0.1 dist
    // 1×1, 6×2, 33×3 — uniform-random vectors are PQ's worst case, the
    // 4-dim/16-centroid quantizer has nothing to exploit; a real clustered
    // corpus concentrates codebook mass where the data lives). Aggregate
    // recall floor pinned in LlmSpec.
    "q26d_ann_pq" -> QueryDef(
      build = (s, d) => recallGate(s, d, pqTopK(s, d), minHits = 1),
      oracle = Some(recallGateOracle)),

    // Q26g [extension, scale path #4] Matryoshka-style truncated-dimension
    // retrieval: stage 1 scans only the LEADING 16 of 64 dims (4× less
    // arithmetic and — the real win at 100 TB — 4× less vector I/O and
    // cache footprint per candidate, the serving trick MRL embeddings are
    // trained for) to build a top-512 shortlist per query (~1% of the
    // sf0.1 corpus; at scale the RATIO is the knob); stage 2 reranks the
    // shortlist with exact full-dim cosine, touching 512 full vectors per
    // query instead of N. Shortlist travels as (qid, cid) ids only — full
    // vectors re-join by key, never ride the wide stage-1 shuffle.
    // Uniform-random embeddings are the WORST case (no energy
    // concentration in leading dims — a trained MRL model front-loads
    // information; the truncated cosine here is a noisy √(16/64)-strength
    // estimate): a 64-wide shortlist measured 8/40 zero-hit queries at
    // sf0.1, 512 measured zero misses at every SF — the calibration trail
    // q26d also documents.
    "q26g_ann_mrl" -> QueryDef(
      build = (s, d) => recallGate(s, d, mrlTopK(s, d), minHits = 1),
      oracle = Some(recallGateOracle)),

    // Q26e [extension: persisted+versioned index state] q26c's IVF serving
    // from a PINNED ModelStore version instead of retraining per query —
    // the production index lifecycle (train once per corpus snapshot,
    // persist the bounded k×dim model, serve deterministically from a
    // pinned version while the corpus keeps moving). The gate proves the
    // pin semantics adversarially: version 0 is the real trained model,
    // version 1 is a deliberately-degenerate retrain (all-zero centroids —
    // every score collapses), and serving loads v0 by version. Floats
    // round-trip parquet bit-exactly, so the pinned-load result is
    // hash-identical to q26c's inline-trained serve against the same exact
    // referee.
    "q26e_ann_ivf_pinned" -> QueryDef(
      build = (s, d) => {
        import graft.sources.ModelStore
        val nm = normed(s, d).cache()
        val root = graft.GateTmp.freshDir("q26e_model")
        val pinned = ModelStore.saveCentroids(s, root, trainCells(nm, 16, 2))
        // a later degenerate retrain lands as v1; serving stays pinned to v0
        ModelStore.saveCentroids(s, root, IndexedSeq.fill(16)(new Array[Float](64)))
        val cents = ModelStore.loadCentroids(s, root, Some(pinned.version))
        recallGate(s, d, ivfServe(nm, cents), minHits = 1)
      },
      oracle = Some(recallGateOracle)),

    // Q26f [extension: persisted+versioned index state] q26d's PQ serving
    // from a pinned ModelStore codebook version — same lifecycle and same
    // adversarial pin proof as q26e (v1 is an all-zero codebook; ADC
    // against it would shortlist garbage).
    "q26f_ann_pq_pinned" -> QueryDef(
      build = (s, d) => {
        import graft.sources.ModelStore
        val nm = normed(s, d).cache()
        val root = graft.GateTmp.freshDir("q26f_model")
        val pinned = ModelStore.saveCodebook(s, root, pqTrain(nm).map(_.toSeq))
        ModelStore.saveCodebook(s, root,
          Seq.fill(PqM)(Seq.fill(PqKsub)(new Array[Float](PqDsub))))
        val book = ModelStore.loadCodebook(s, root, Some(pinned.version))
        recallGate(s, d, pqServe(nm, book), minHits = 1)
      },
      oracle = Some(recallGateOracle)),

    // Q27d [extension] embedding-cosine near-duplicate pairs: all pairs with
    // cos >= 0.45 (testdata max pairwise cos is ~0.513, so the output is
    // small but non-empty).
    //
    // Plan: TRIANGLE BLOCKING, not a nested-loop join. Vectors hash into P
    // blocks; the P(P+1)/2 ordered block pairs are a tiny broadcast frame;
    // each vector streams to the block pairs it participates in (≈ P/2 + 1
    // keys per row) and the pair set is a hash EQUI-join on (bi, bj).
    // Guarantees vs the all-pairs BNLJ it replaces: recall is exactly 1.0
    // (every pair meets in exactly one block pair — no LSH miss risk against
    // the exact oracle), per-task memory is O(N/P) rows (no whole-table
    // broadcast), shuffle is O(N·P) rows, and compute spreads over P²
    // tasks. Exact all-pairs cosine is inherently O(N²) compare work; at a
    // REAL near-dup threshold (cos ≥ 0.9) you'd swap candidate generation to
    // q26b's multi-probe LSH buckets and keep the exact verify — at 0.45
    // (θ ≈ 63°, barely tighter than random in 64-dim) no sub-quadratic
    // method holds recall 1.0, so the honest scale path is blocking.
    // cos is symmetric bit-identically (IEEE mult commutes, fold order
    // fixed), so emitting (least, greatest) ids preserves the oracle hash.
    "q27d_dedup_embedding" -> QueryDef(
      build = (s, d) => exactNearDupPairs(s, d, 0.45).orderBy($("a_id"), $("b_id")),
      oracle = Some(
        s"""WITH n AS ($normedSql)
           |SELECT q.vec_id AS a_id, c.vec_id AS b_id,
           |  $dotSql / (q.nrm * c.nrm) AS cos
           |FROM n q, n c
           |WHERE q.vec_id < c.vec_id
           |  AND $dotSql / (q.nrm * c.nrm) >= 0.45
           |ORDER BY a_id, b_id""".stripMargin))
  )

  /** Exact embedding near-dup pairs at `cos >= tau` via triangle blocking
    * (q27d's body; also the exact referee for the q53 SemDeDup gate).
    * Returns unordered-unique (a_id < b_id, cos) — see the q27d entry for
    * the full blocking design rationale.
    */
  private[queries] def exactNearDupPairs(s: SparkSession, d: String, tau: Double): DataFrame = {
    import s.implicits._
    val blocks = 8
    val bp = (for { i <- 0 until blocks; j <- i until blocks } yield (i, j))
      .toDF("bi", "bj")
    val n = normed(s, d).withColumn("blk", pmod($("vec_id"), lit(blocks)))
    val aSide = n.join(broadcast(bp), $("blk") === $("bi"))
      .select($("bi"), $("bj"), $("vec_id").as("aid"),
        $("embedding").as("ae"), $("nrm").as("an"))
    val bSide = n.join(broadcast(bp), $("blk") === $("bj"))
      .select($("bi").as("bi2"), $("bj").as("bj2"), $("vec_id").as("bid"),
        $("embedding").as("be"), $("nrm").as("bn"))
    aSide.join(bSide, $("bi") === $("bi2") && $("bj") === $("bj2"))
      // cross-block pairs meet once; same-block pairs twice → keep one
      .filter($("bi") < $("bj") || $("aid") < $("bid"))
      .select(least($("aid"), $("bid")).as("a_id"),
        greatest($("aid"), $("bid")).as("b_id"),
        (dot($("ae"), $("be")) / ($("an") * $("bn"))).as("cos"))
      .filter($("cos") >= tau)
  }

  /** Multi-table random-hyperplane LSH ANN top-3 (q26b's structure). */
  def lshTopK(s: SparkSession, d: String): DataFrame = {
        val nTables = 6
        val nPlanes = 4
        // Hyperplanes are data-independent constants: generated driver-side
        // from a fixed seed and shipped as array<float> literals, so each
        // projection is one codegen'd float_dot instead of an interpreted
        // 64-element lambda fold per (table, plane).
        val planes: IndexedSeq[IndexedSeq[Array[Float]]] =
          IndexedSeq.tabulate(nTables) { t =>
            IndexedSeq.tabulate(nPlanes) { p =>
              val rnd = new scala.util.Random(1000L * t + p)
              Array.fill(64)(rnd.nextFloat() * 2f - 1f)
            }
          }
        val buckets: Column = array((0 until nTables).map { t =>
          struct(lit(t).as("tbl"), concat((0 until nPlanes).map { p =>
            when(dot($("embedding"), typedlit(planes(t)(p))) >= 0, lit("1"))
              .otherwise(lit("0"))
          }: _*).as("bkt"))
        }: _*)
        val nm = normed(s, d)
        // candidate generation runs on (id, bucket-key) ONLY — the 64-float
        // embeddings never enter the candidate join/dedup shuffle
        val nKeys = nm.select($("vec_id"), explode(buckets).as("tb"))
          .select($("vec_id"), concat($("tb.tbl"), lit("|"), $("tb.bkt")).as("key"))
        // multi-probe on the QUERY side only: each query also probes the
        // nPlanes buckets at Hamming distance 1 — (1 + k)× keys on the tiny
        // broadcast side buys most of the recall of doubling L for free on
        // the big side
        val flip: Column = {
          val base = $("tb.bkt")
          val probes = (0 until nPlanes).map { b =>
            concat(
              substring(base, 1, b),
              when(substring(base, b + 1, 1) === "1", "0").otherwise("1"),
              substring(base, b + 2, nPlanes - b - 1))
          }
          explode(array((base +: probes).map(bk => concat($("tb.tbl"), lit("|"), bk)): _*))
        }
        val qKeys = nm.filter($("vec_id") % 50 === 0)
          .select($("vec_id").as("qid"), explode(buckets).as("tb"))
          .select($("qid"), flip.as("key"))
          .dropDuplicates("qid", "key")
        val cand = nKeys.join(broadcast(qKeys),
            nKeys("key") === qKeys("key") && $("vec_id") =!= $("qid"))
          .select($("qid"), $("vec_id").as("cid"))
          .dropDuplicates("qid", "cid") // a pair can collide in several buckets
        // scoring join re-attaches vectors: candidates by cid, queries broadcast
        val qVecs = nm.filter($("vec_id") % 50 === 0)
          .select($("vec_id").as("qid2"), $("embedding").as("qe"), $("nrm").as("qn"))
        val w = Window.partitionBy($("qid")).orderBy(desc("cos"), $("cid"))
        cand.join(nm, $("cid") === nm("vec_id"))
          .join(broadcast(qVecs), $("qid") === $("qid2"))
          .select($("qid"), $("cid"),
            (dot($("qe"), $("embedding")) / ($("qn") * $("nrm"))).as("cos"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter($("rnk") <= 3)
          .orderBy($("qid"), $("rnk"))
  }

  /** Product-Quantization ANN top-3 (q26d's structure).
    *
    * Training (per subspace, L2 k-means — the quantizer minimizes
    * reconstruction error, independent of the search metric): deterministic
    * init from the 16 lowest-vec_id subvectors, then two Lloyd rounds. One
    * distributed pass per round — every subspace is assigned in the same
    * projection (m argmin expressions over codegen'd float_dot) and all
    * subspace means come out of ONE posexplode/groupBy. The collected
    * model is m×16×4 floats (1 KB) — bounded codebook state, like q26c's
    * centroids.
    *
    * Serving: the codes table (vec_id, codes[16], nrm) IS the index.
    * ADC scan = broadcast the query LUTs (m arrays of 16 precomputed
    * query-subvector·centroid dots), score = Σ_m lut[m][code_m] — m
    * element_at lookups per candidate, no floats ride the scan. Exact
    * rerank on the shortlist restores true-cosine ordering.
    */
  private val PqM = 16; private val PqDsub = 4
  private val PqKsub = 16; private val PqShortlist = 128

  // codebook flattened [mm][j][t] for the native pq_encode/pq_luts
  // workers — a declarative m×ksub dot-expression tree spends seconds in
  // Janino PER LLOYD ROUND (fresh literals ⇒ fresh generated class);
  // the native expression is one static call whatever m/ksub are
  private def pqFlat(cs: IndexedSeq[IndexedSeq[Array[Float]]]): Array[Float] =
    cs.flatMap(_.flatMap(_.toIndexedSeq)).toArray
  private def pqCodesCol(cs: IndexedSeq[IndexedSeq[Array[Float]]]): Column =
    call_function("pq_encode", $("embedding"), typedlit(pqFlat(cs)), lit(PqDsub))

  def pqTopK(s: SparkSession, d: String): DataFrame = {
    val nm = normed(s, d).cache()
    pqServe(nm, pqTrain(nm))
  }

  /** PQ codebook training (q26d's Lloyd half): deterministic init from the
    * ksub smallest vec_ids, two Lloyd rounds. Returns book(mm)(j) — bounded
    * m×ksub×dsub model state (the ModelStore persistence class).
    */
  private[queries] def pqTrain(nm: DataFrame): IndexedSeq[IndexedSeq[Array[Float]]] = {
    val m = PqM; val dsub = PqDsub; val ksub = PqKsub

    // deterministic init: subvectors of the ksub smallest vec_ids (distinct
    // real points — uniform data gives no better seeds, and mean-based init
    // would start all 16 centroids at the same point)
    val seedRows = nm.filter($("vec_id") < ksub)
      .select($("vec_id"), $("embedding")).collect().sortBy(_.getLong(0))
    var cents: IndexedSeq[IndexedSeq[Array[Float]]] =
      IndexedSeq.tabulate(m) { mm =>
        IndexedSeq.tabulate(ksub) { j =>
          val e = seedRows(j).getSeq[Float](1)
          Array.tabulate(dsub)(i => e(mm * dsub + i))
        }
      }

    for (_ <- 1 to 2) { // Lloyd rounds
      val prev = cents
      val rows = nm.select(pqCodesCol(prev).as("codes"),
          posexplode($("embedding")).as(Seq("pos", "x")))
        .select(floor($("pos") / dsub).cast("int").as("mm"),
          pmod($("pos"), lit(dsub)).cast("int").as("p"),
          element_at($("codes"), floor($("pos") / dsub).cast("int") + 1).as("cell"),
          $("x"))
        .groupBy($("mm"), $("cell"), $("p")).agg(avg($("x")).as("mu"))
        .collect()
      val next = Array.tabulate(m, ksub)((mm, j) => prev(mm)(j).clone())
      rows.foreach(r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3).toFloat)
      cents = next.map(_.toIndexedSeq).toIndexedSeq // empty cells keep prior
    }
    cents
  }

  /** Serving half of q26d against a GIVEN codebook (trained inline, or a
    * pinned ModelStore version — q26f): encode, ADC scan, exact rerank.
    */
  private[queries] def pqServe(nm: DataFrame,
      cents: IndexedSeq[IndexedSeq[Array[Float]]]): DataFrame = {
    val m = PqM; val dsub = PqDsub; val shortlist = PqShortlist
    def flat = pqFlat _
    def codesCol = pqCodesCol _

    // compressed index: 16 nibble codes + norm per vector (~16 B vs 256 B)
    val codes = nm.select($("vec_id"), codesCol(cents).as("codes"), $("nrm"))

    // query-side LUTs: lut[mm][j] = q_sub_mm · c_mm_j (m×ksub dots on the
    // tiny broadcast side only, via the native pq_luts)
    val qSide = nm.filter($("vec_id") % 50 === 0)
      .select($("vec_id").as("qid"),
        call_function("pq_luts", $("embedding"), typedlit(flat(cents)), lit(dsub))
          .as("luts"),
        $("nrm").as("qn"))

    // ADC scan: m lookups per (candidate, query); codes never decompressed
    val adc = (0 until m).map(mm =>
        element_at(element_at($("luts"), mm + 1), element_at($("codes"), mm + 1) + 1))
      .reduce(_ + _)
    val w = Window.partitionBy($("qid")).orderBy(desc("approx"), $("cid"))
    val short = codes.join(broadcast(qSide), $("vec_id") =!= $("qid"))
      .select($("qid"), $("vec_id").as("cid"), (adc / ($("qn") * $("nrm"))).as("approx"))
      .withColumn("rnk", row_number().over(w))
      .filter($("rnk") <= shortlist)
      .select($("qid"), $("cid"))

    // exact rerank of the shortlist: touches `shortlist` full vectors per
    // query, not N
    val qVecs = nm.filter($("vec_id") % 50 === 0)
      .select($("vec_id").as("qid2"), $("embedding").as("qe"), $("nrm").as("qn"))
    val w2 = Window.partitionBy($("qid")).orderBy(desc("cos"), $("cid"))
    short.join(nm, $("cid") === nm("vec_id"))
      .join(broadcast(qVecs), $("qid") === $("qid2"))
      .select($("qid"), $("cid"),
        (dot($("qe"), $("embedding")) / ($("qn") * $("nrm"))).as("cos"))
      .withColumn("rnk", row_number().over(w2).cast("long"))
      .filter($("rnk") <= 3)
      .orderBy($("qid"), $("rnk"))
  }

  /** IVF (inverted-file) ANN top-3 (q26c's structure): a coarse k-means
    * quantizer partitions vectors into cells; queries probe only the nprobe
    * nearest cells and exact-rank inside them. The classic FAISS-style
    * alternative to q26b's LSH: data-adaptive cells beat data-oblivious
    * hyperplanes when the corpus clusters.
    *
    * Training: deterministic init (cell = vec_id mod k → cell means), then
    * two Lloyd rounds. Each round is one distributed assign (k codegen'd
    * float_dot per row, centroids broadcast as literals) + one
    * posexplode/groupBy mean. Collecting the k×64 centroid matrix to the
    * driver is model state, not data — bounded at k rows regardless of
    * corpus size (what MLlib's KMeans does too).
    *
    * Serving: cell is THE partition key. At 100 TB the assignment write is
    * one pass, each cell is a parquet partition, and a query touches
    * nprobe partitions — candidate generation joins on ids only, so
    * embeddings never ride the shuffle (q26b convention). Recall vs exact
    * q26 pinned in LlmSpec (0.80 at sf0.001 / 0.93 at sf0.1 measured).
    *
    * Parameter honesty: the synthetic embeddings are uniform-random — the
    * IVF worst case, with no cluster structure to exploit — so nprobe is
    * high (10 of 16 cells) to hold recall. On a real clustered corpus the
    * operating point is k ≈ √N cells with nprobe ≈ √k, where cells are
    * tight and the probe fraction (and compute) drops by orders of
    * magnitude; the plan shape here is unchanged by those constants.
    */
  private[queries] def nrm2(c: Array[Float]): Double =
    math.sqrt(c.map(x => x.toDouble * x).sum).max(1e-12)

  /** Per-cell cosine scores against a broadcast centroid matrix — spherical
    * k-means assigns/probes by angle (cos(v,c) up to the row-constant
    * 1/||v||), matching the cosine search metric better than euclidean
    * scores when norms vary.
    */
  private[queries] def scoreArr(cents: IndexedSeq[Array[Float]]): Column =
    array(cents.map(c =>
      dot($("embedding"), typedlit(c)) / lit(nrm2(c))): _*)

  private[queries] def cellCol(cents: IndexedSeq[Array[Float]]): Column = {
    val a = scoreArr(cents)
    (array_position(a, array_max(a)) - 1).cast("int")
  }

  /** Deterministic spherical k-means over a [[normed]] frame: init cell =
    * vec_id mod k, then `rounds` Lloyd iterations. Each round is one
    * distributed assign (k codegen'd float_dot per row, centroids broadcast
    * as literals) + one posexplode/groupBy mean. The collected k×dim
    * centroid matrix is MODEL state, not data — bounded at k rows regardless
    * of corpus size (the same shape MLlib's KMeans collects).
    */
  private[queries] def trainCells(nm: DataFrame, k: Int, rounds: Int): IndexedSeq[Array[Float]] = {
    // mean per (cell, dim) → k×dim rows → driver-side centroid matrix
    def centroidsOf(assigned: DataFrame): IndexedSeq[Array[Float]] = {
      val rows = assigned
        .select($("cell"), posexplode($("embedding")).as(Seq("pos", "x")))
        .groupBy($("cell"), $("pos")).agg(avg($("x")).as("m"))
        .collect()
      val dim = rows.map(_.getInt(1)).max + 1
      val m = Array.fill(k)(new Array[Float](dim))
      rows.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat)
      m.toIndexedSeq
    }
    var cents = centroidsOf(
      nm.withColumn("cell", pmod($("vec_id"), lit(k)).cast("int")))
    for (_ <- 1 to rounds)
      cents = centroidsOf(nm.withColumn("cell", cellCol(cents)))
    cents
  }

  def ivfTopK(s: SparkSession, d: String): DataFrame = {
    val nm = normed(s, d).cache()
    ivfServe(nm, trainCells(nm, k = 16, rounds = 2))
  }

  /** Serving half of q26c against a GIVEN centroid matrix — trained inline
    * (q26c) or loaded from a pinned ModelStore version (q26e). Splitting
    * train from serve is the production shape: the index is trained once
    * (corpus-sized pass), persisted as bounded model state, and every query
    * serves from the pinned version.
    */
  private[queries] def ivfServe(nm: DataFrame,
      cents: IndexedSeq[Array[Float]]): DataFrame = {
        val nprobe = 10

        // nprobe nearest cells per query: sort (score, idx) structs desc
        val probed: Column = {
          val a = array(cents.zipWithIndex.map { case (c, i) =>
            struct((dot($("embedding"), typedlit(c)) / lit(nrm2(c))).as("s"),
              lit(i).as("i"))
          }: _*)
          transform(slice(reverse(array_sort(a)), 1, nprobe), x => x("i"))
        }
        val nKeys = nm.select($("vec_id"), cellCol(cents).as("cell"))
        val qKeys = nm.filter($("vec_id") % 50 === 0)
          .select($("vec_id").as("qid"), explode(probed).as("cell"))
        val cand = nKeys.join(broadcast(qKeys),
            nKeys("cell") === qKeys("cell") && $("vec_id") =!= $("qid"))
          .select($("qid"), $("vec_id").as("cid"))
        val qVecs = nm.filter($("vec_id") % 50 === 0)
          .select($("vec_id").as("qid2"), $("embedding").as("qe"), $("nrm").as("qn"))
        val w = Window.partitionBy($("qid")).orderBy(desc("cos"), $("cid"))
        cand.join(nm, $("cid") === nm("vec_id"))
          .join(broadcast(qVecs), $("qid") === $("qid2"))
          .select($("qid"), $("cid"),
            (dot($("qe"), $("embedding")) / ($("qn") * $("nrm"))).as("cos"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter($("rnk") <= 3)
          .orderBy($("qid"), $("rnk"))
  }
}
