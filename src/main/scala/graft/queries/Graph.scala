package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph operators over a deterministic synthetic link graph on `documents`
  * (extension family; the reference has no graph surface). A training-data
  * pipeline uses exactly these two shapes on the web graph behind a crawl:
  * PageRank-style centrality as a document-quality signal (the classic
  * crawl-filtering feature) and triangle counting as a community/spam
  * signal. Both are implemented as *exact integer* computations so the
  * DuckDB oracle hash-matches bit-for-bit — the iterative float PageRank
  * would diverge across engines through summation order alone.
  *
  * Graph construction (identical in both engines): each doc gets out-edges
  * to `(doc_id * 2654435761 + k) % 1000000007 % N` for k = 1..3, self-loops
  * dropped, deduped — a pseudo-random 3-regular-ish digraph that is a pure
  * function of the table, so no side files are needed.
  */
object Graph {
  private def $(name: String) = col(name)

  private val Scale = 1000000000000L // pr fixed-point: 1.0 == 10^12
  private val Iters = 10

  /** (docs, edges) as DataFrames: docs(doc_id), edges(src, dst). Memoized
    * per (session, dir) with both frames cached: five graph gates share
    * one edge set, and the cache is a few thousand long-pairs, so building
    * it once per bench session shaves four redundant scans + counts (the
    * VERDICT r9 "shared cached graph" note). Cluster analogue: you
    * materialize the edge layout once and run every graph metric over it.
    */
  private val graphCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, DataFrame, DataFrame)]

  private def linkGraph(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val (_, docs, edges) = linkGraphN(s, d)
    (docs, edges)
  }

  private def linkGraphN(s: SparkSession, d: String): (Long, DataFrame, DataFrame) = {
    val (n, docs, edges) = graphCache.getOrElseUpdate((s, d), {
      val docs = Tables.documents(s, d).select($("doc_id")).cache()
      val n = docs.count() // one tiny job; N pins the dst modulus
      val edges = docs
        .select($("doc_id").as("src"), explode(sequence(lit(1), lit(3))).as("k"))
        .select($("src"),
          (($("src") * lit(2654435761L) + $("k")) % 1000000007L % n).as("dst"))
        .filter($("dst") =!= $("src"))
        .distinct()
        .cache()
      (n, docs, edges)
    })
    (n, docs, edges)
  }

  /** Derived frames shared across gates on top of the memoized graph
    * (edges+degree layout for q73/q84, oriented undirected edges for
    * q73b/q83), cached once per (session, dir).
    */
  private val derivedCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** `reassert = true` re-marks the cache on every access: memoized
    * frames outlive Bench's per-repetition clearCache(), so without it
    * every repetition after the first ran UNcached. Worth it ONLY for
    * frames an iterative gate references many times per run (edgesDeg:
    * 10 joins per q73/q84 run — measured q84 3.9 s → 2.8 s); for one- or
    * two-reference frames (oriented: one self-join) the eager
    * materialization barrier costs MORE than the duplicate computation
    * it saves (measured q73b/q83 +1.7 s each), so those stay lazy.
    */
  private def cachedDerived(s: SparkSession, d: String, key: String,
      reassert: Boolean = false)(build: => DataFrame): DataFrame = {
    val df = derivedCache.getOrElseUpdate((s, d, key), build.cache())
    if (reassert) df.cache()
    df
  }

  /** Shuffle-partition count for |V|-row iterative label/dist frames,
    * derived from the vertex count instead of pinned to a gate-volume
    * constant: ~1M 16-byte rows (~16 MB) per partition, floor 4 so tiny
    * runs stay off the per-round task-overhead cliff (measured sf0.1:
    * 32 partitions 10.4 s vs 4-8 partitions ~5.2 s — pure scheduling
    * overhead on kB-sized frames). 1e9 vertices derive ~1000 partitions.
    * Scoped per loop frame via repartition(), never via session conf, so
    * concurrent queries on the same session are unaffected.
    */
  private[graft] def labelPartitions(n: Long): Int =
    math.max(4L, math.min(n / 1000000L, 100000L)).toInt

  /** Materialize one loop iteration: flat lineage AND bounded stats.
    *
    * Two distinct failure modes stalk unbounded iterative DataFrame loops,
    * and each of the obvious materializers fixes only one:
    *
    *   - `cache()` keeps the FULL logical plan. Each round here references
    *     the previous frame ~4× (labels + frontier twice + update join), so
    *     the plan TREE grows 4^r — by round 5 merely rendering the plan
    *     string for the UI listener OOMs the driver. Lineage must be CUT,
    *     which localCheckpoint does (LogicalRDD leaf).
    *   - but localCheckpoint's LogicalRDD carries `originStats` = the
    *     checkpointed plan's ESTIMATED sizeInBytes. A join's estimate is
    *     the product of its inputs, so with checkpoint-only materialization
    *     the estimate's bit-length DOUBLES every round; past ~15 rounds the
    *     driver grinds million-digit BigInteger multiplies inside
    *     SizeInBytesOnlyStatsPlanVisitor (observed: q86 at sf0.001, 500
    *     docs, never finished). The ≤10-round q73/q84/q85 loops stay under
    *     this radar (≤ ~1k-digit numbers), 40-round caps do not.
    *
    * So: localCheckpoint every round (flat tree, eager materialization,
    * hash partitioning preserved for the next round's update join), and on
    * `resetStats` rounds re-wrap the materialized RDD via the public
    * `createDataFrame(rdd, schema)` — a fresh LogicalRDD with NO origin
    * stats (falls back to a constant default), re-basing the estimate chain
    * so compounding is bounded by the reset cadence (~2^4 growth ≈ 1k-bit
    * numbers, microseconds). The wrapper costs one Row conversion and loses
    * the partitioning property for that round only — the cadence keeps 3 of
    * 4 rounds shuffle-free on the label side. Returns (frame-for-plan,
    * checkpoint-handle): unpersist the HANDLE of round r-1 after round r
    * materializes; on reset rounds the two differ.
    */
  private def iterCheckpoint(df: DataFrame, resetStats: Boolean): (DataFrame, DataFrame) = {
    val ck = df.localCheckpoint(true)
    if (resetStats) (ck.sparkSession.createDataFrame(ck.rdd, ck.schema), ck)
    else (ck, ck)
  }

  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — THE
    * scale-correct distributed connected-components shape, shared by q86
    * (document link graph) and q27e (near-dup similarity graph).
    *
    * Why not min-label propagation: over a STATIC edge set — even with
    * pointer-doubling pulls — label flooding is O(ecc(min)), not
    * O(log n): pointer shortcuts only help nodes the min's flood has
    * already reached. The sf0.1 functional graph has a 4905-node component
    * of diameter ≥ 401; the propagation loop's 20-round cap was silently
    * returning unconverged labels at bench scale. Star contraction
    * rewrites the EDGE SET each round, which is what makes the cycle
    * count genuinely logarithmic regardless of diameter:
    *   large-star(v): every neighbor w > v re-attaches to
    *     m(v) = min(N(v) ∪ {v}) — tall chains fold toward local minima;
    *   small-star(v): every neighbor w ≤ v (plus v) attaches to m(v) —
    *     local minima merge downward.
    * Both preserve connectivity, the edge multiset stays O(m), and
    * alternation converges in O(log² n) cycles w.h.p. (measured: 6 cycles
    * at sf0.01, 9 at the diameter-400+ sf0.1 graph). At fixpoint every
    * component is a star rooted at its minimum id.
    *
    * Per cycle: one L+S plan (groupBy mins + re-attach join per phase,
    * edge-count rows, hash-partitioned by `parts`) materialized ONCE via
    * iterCheckpoint — duplicates between phases are harmless under min
    * (idempotent) so dedup lands once per cycle at the checkpoint; NOT
    * unrolling two cycles into one plan is deliberate (the un-deduplicated
    * union/join chain squares edge multiplicity: measured 12-17 s per
    * doubled plan vs ~0.7 s single). Convergence (per-node min map stable
    * across a full cycle) is enforced with a loud require.
    *
    * @param directed edge list (src, dst); symmetrized + deduped here
    * @return (node, rep) for every node with ≥1 non-loop edge — callers
    *         re-attach isolated nodes with a left join + coalesce
    */
  private[graft] def starContract(directed: DataFrame, parts: Int,
      maxCycles: Int = 15): DataFrame = {
    def sym(e: DataFrame): DataFrame = e
      .unionByName(e.select($("dst").as("src"), $("src").as("dst")))
      .filter($("src") =!= $("dst"))
    def minsOf(e: DataFrame): DataFrame = e.groupBy($("src"))
      .agg(least($("src"), min($("dst"))).as("m"))
    def largeStar(e: DataFrame): DataFrame = sym(
      e.join(minsOf(e), "src").filter($("dst") > $("src"))
        .select($("dst").as("src"), $("m").as("dst")))
    def smallStar(e: DataFrame): DataFrame = {
      val m = minsOf(e)
      sym(e.join(m, "src").filter($("dst") <= $("src"))
        .select($("dst").as("src"), $("m").as("dst"))
        .unionByName(m.select($("src"), $("m").as("dst"))))
    }
    // dedup AND lay out in ONE exchange: hash partitioning on src alone
    // already co-locates every row agreeing on (src, dst) — a strict
    // subset of the dedup keys satisfies ClusteredDistribution — so
    // repartition-then-dropDuplicates dedups with no second shuffle where
    // distinct().repartition(src) paid an (src, dst) exchange AND an src
    // exchange per cycle, and the aggregate preserves the src layout the
    // next cycle's groupBy/join reuse
    def dedupBySrc(e: DataFrame): DataFrame =
      e.repartition(parts, $("src")).dropDuplicates("src", "dst")
    var (edges, edgesCk) = iterCheckpoint(
      dedupBySrc(sym(directed)), resetStats = false)
    var mins = minsOf(edges).cache()
    // Per-cycle convergence probe is a CHEAP order-independent signature
    // (row count + bit_xor of xxhash64(src, m) — one single-stage reduce
    // over the already-computed mins, no join). The EXACT full-outer diff
    // runs only once, when the signature stabilizes, and still backs the
    // loud require — same certificate as diffing every cycle (mins stable
    // across a full cycle), at one shuffle-join total instead of one per
    // cycle (VERDICT r10 #6: the per-cycle convergence join made q86 the
    // slowest gate).
    def sigOf(m: DataFrame): (Long, Long) = {
      val r = m.agg(count(lit(1)).as("n"),
        bit_xor(xxhash64($("src"), $("m"))).as("h")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = sigOf(mins)
    var converged = false
    var cycles = 0
    while (!converged && cycles < maxCycles) {
      val (next, nextCk) = iterCheckpoint(
        dedupBySrc(smallStar(largeStar(edges))),
        resetStats = cycles % 2 == 1)
      val nextMins = minsOf(next).cache()
      val nextSig = sigOf(nextMins)
      if (nextSig == sig) {
        // signature matched — confirm with the exact diff before declaring
        // convergence (collision paranoia: a 64-bit xor match could lie)
        val changed = nextMins.as("a")
          .join(mins.as("b"), col("a.src") === col("b.src"), "full_outer")
          .filter(!(col("a.m") <=> col("b.m"))).count()
        require(changed == 0, s"mins signature collision without " +
          s"convergence at cycle $cycles ($changed labels moving)")
        converged = true
      }
      edgesCk.unpersist(); mins.unpersist()
      edges = next; edgesCk = nextCk; mins = nextMins; sig = nextSig
      cycles += 1
      if (sys.env.contains("GRAFT_WCC_DEBUG"))
        System.err.println(s"[wcc] cycle $cycles sig $sig converged $converged")
    }
    require(converged,
      s"star contraction did not converge after $cycles cycles")
    val out = mins.select($("src").as("node"), $("m").as("rep"))
    edgesCk.unpersist()
    out
  }

  /** The shared edge-generation SQL (DuckDB). */
  private val edgesSql =
    """docs AS (SELECT doc_id FROM documents),
      |n AS (SELECT count(*) AS c FROM docs),
      |edges AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT doc_id AS src,
      |           (doc_id * 2654435761 + k) % 1000000007 % (SELECT c FROM n) AS dst
      |    FROM docs, range(1, 4) t(k))
      |  WHERE dst <> src)""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // Q73 [extension: graph centrality] exact fixed-point PageRank, 10
    // iterations, damping 0.85: pr' = 0.15 + 0.85 * Σ_in (pr/outdeg), all
    // in 10^12-scaled integer arithmetic with floor division so every
    // intermediate is order-independent and engine-exact (long bounds:
    // total mass N·10^12 ≈ 5e15 at sf1, 85× that ≈ 4e17 < 2^63).
    //
    // Scale shape: per iteration one shuffle join pr⋈edges on src and one
    // groupBy dst with map-side partial sums — the canonical distributed
    // PageRank (Pregel/GraphX do the same data movement with vertex-cut
    // placement amortizing the edge join; at 100 TB you'd co-partition
    // edges and ranks on src once and reuse that layout every iteration,
    // which is what the edgesDeg cache below does). Each iteration is
    // materialized via localCheckpoint to keep the plan flat (q27e
    // convention) and the previous one is unpersisted.
    "q73_pagerank" -> QueryDef(
      build = (s, d) => {
        val (docs, edges) = linkGraph(s, d)
        // one co-partitioned (src → dst, deg) layout reused every iteration
        // (and across q73/q84 via the derived cache)
        val edgesDeg = cachedDerived(s, d, "edgesDeg", reassert = true) {
          edges.join(edges.groupBy($("src")).agg(count(lit(1)).as("deg")), "src")
        }
        var pr = docs.select($("doc_id"), lit(Scale).as("pr")).localCheckpoint(true)
        for (_ <- 1 to Iters) {
          val contrib = edgesDeg
            .join(pr.withColumnRenamed("doc_id", "src"), "src")
            .select($("dst"), expr("pr div deg").as("c"))
            .groupBy($("dst")).agg(sum($("c")).as("m"))
          val next = docs
            .join(contrib, docs("doc_id") === contrib("dst"), "left")
            .select($("doc_id"),
              (lit(15L * Scale / 100) +
                expr("85 * coalesce(m, CAST(0 AS BIGINT)) div 100")).as("pr"))
          val nn = next.localCheckpoint(true)
          pr.unpersist(); pr = nn
        }
        pr.orderBy($("doc_id"))
      },
      oracle = Some {
        // unrolled iterations (recursive CTEs can't aggregate); p0..p10
        val steps = (1 to Iters).map { i =>
          s"""p$i AS (
             |  SELECT d.doc_id,
             |    CAST(150000000000 + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS pr
             |  FROM docs d LEFT JOIN (
             |    SELECT e.dst, SUM(p.pr // e.deg) AS m
             |    FROM ed e JOIN p${i - 1} p ON p.doc_id = e.src
             |    GROUP BY e.dst) s ON s.dst = d.doc_id)""".stripMargin
        }.mkString(",\n")
        s"""WITH $edgesSql,
           |ed AS (
           |  SELECT e.src, e.dst, d.deg FROM edges e
           |  JOIN (SELECT src, count(*) AS deg FROM edges GROUP BY src) d
           |    ON e.src = d.src),
           |p0 AS (SELECT doc_id, CAST(1000000000000 AS BIGINT) AS pr FROM docs),
           |$steps
           |SELECT doc_id, pr FROM p$Iters ORDER BY doc_id""".stripMargin
      },
      headline = true),

    // Q84 [extension: personalized PageRank] the seeded variant — restart
    // mass goes ONLY to a seed set (docs ≡ 0 mod 17), so rank measures
    // proximity to the seeds rather than global centrality: the crawl-
    // frontier / quality-propagation shape ("rank everything by closeness
    // to these known-good pages"). Same exact fixed-point integer loop and
    // data movement as q73; only the restart term differs (unnormalized:
    // each seed holds 0.15·SCALE of restart mass — a documented engine
    // convention the oracle mirrors exactly).
    "q84_ppr" -> QueryDef(
      build = (s, d) => {
        val (docs, edges) = linkGraph(s, d)
        val edgesDeg = cachedDerived(s, d, "edgesDeg", reassert = true) {
          edges.join(edges.groupBy($("src")).agg(count(lit(1)).as("deg")), "src")
        }
        val seedMass = lit(15L * Scale / 100)
        def restart(id: org.apache.spark.sql.Column) =
          when(id % 17 === 0, seedMass).otherwise(lit(0L))
        var pr = docs
          .select($("doc_id"), when($("doc_id") % 17 === 0, lit(Scale))
            .otherwise(lit(0L)).as("pr"))
          .localCheckpoint(true)
        for (_ <- 1 to Iters) {
          val contrib = edgesDeg
            .join(pr.withColumnRenamed("doc_id", "src"), "src")
            .select($("dst"), expr("pr div deg").as("c"))
            .groupBy($("dst")).agg(sum($("c")).as("m"))
          val next = docs
            .join(contrib, docs("doc_id") === contrib("dst"), "left")
            .select($("doc_id"),
              (restart($("doc_id")) +
                expr("85 * coalesce(m, CAST(0 AS BIGINT)) div 100")).as("pr"))
          val nn = next.localCheckpoint(true)
          pr.unpersist(); pr = nn
        }
        pr.orderBy($("doc_id"))
      },
      oracle = Some {
        val steps = (1 to Iters).map { i =>
          s"""p$i AS (
             |  SELECT d.doc_id,
             |    CAST(CASE WHEN d.doc_id % 17 = 0 THEN 150000000000 ELSE 0 END
             |      + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS pr
             |  FROM docs d LEFT JOIN (
             |    SELECT e.dst, SUM(p.pr // e.deg) AS m
             |    FROM ed e JOIN p${i - 1} p ON p.doc_id = e.src
             |    GROUP BY e.dst) s ON s.dst = d.doc_id)""".stripMargin
        }.mkString(",\n")
        s"""WITH $edgesSql,
           |ed AS (
           |  SELECT e.src, e.dst, d.deg FROM edges e
           |  JOIN (SELECT src, count(*) AS deg FROM edges GROUP BY src) d
           |    ON e.src = d.src),
           |p0 AS (
           |  SELECT doc_id,
           |    CAST(CASE WHEN doc_id % 17 = 0 THEN 1000000000000 ELSE 0 END
           |      AS BIGINT) AS pr
           |  FROM docs),
           |$steps
           |SELECT doc_id, pr FROM p$Iters ORDER BY doc_id""".stripMargin
      }),

    // Q85 [extension: multi-source BFS / shortest hops] hop distance from
    // the q84 seed set along directed edges, Bellman-Ford-shaped: 10
    // rounds of dist'(v) = min(dist(v), min over in-neighbors u of
    // dist(u)+1) — the reachability/radius primitive behind crawl-depth
    // and link-spam features. Pure integer min-propagation (the UNREACHED
    // sentinel 999 survives both engines identically), so the unrolled
    // oracle is bit-exact. Data movement per round: one join on src + one
    // min-groupBy on dst — identical to the PageRank shape with min in
    // place of sum; localCheckpoint keeps plans flat.
    //
    // FRONTIER iteration (VERDICT r9): only rows whose dist changed last
    // round ride the relax join — round t's frontier is exactly the
    // depth-t BFS wave, so the result after ≤Iters rounds is identical to
    // full Bellman-Ford relaxation (dist is monotone non-increasing and a
    // node's dist was offered to its out-neighbors the round after it
    // last changed), but the per-round shuffle shrinks with the wave
    // instead of rejoining all |V| rows. The full-frame dist update joins
    // on doc_id against the cached frame's preserved hash partitioning
    // (labelPartitions-sized via repartition, never session conf), and
    // the loop exits early once the wave dies. Per-round materialization
    // is iterCache, not localCheckpoint — see iterCache for why.
    "q85_bfs_hops" -> QueryDef(
      build = (s, d) => {
        val Unreached = 999L
        val (n, docs, edges) = linkGraphN(s, d)
        val parts = labelPartitions(n)
        var (dist, distCk) = iterCheckpoint(docs
          .select($("doc_id"), when($("doc_id") % 17 === 0, lit(0L))
            .otherwise(lit(Unreached)).as("dist"))
          .repartition(parts, $("doc_id")), resetStats = false)
        // frontier: rows whose dist changed last round (the seeds, initially)
        var frontier = dist.filter($("dist") === 0L)
        var it = 0
        var frontierRows = frontier.count()
        while (it < Iters && frontierRows > 0) {
          val relax = edges
            .join(frontier.withColumnRenamed("doc_id", "src"), "src")
            .select($("dst").as("doc_id"), ($("dist") + 1L).as("cand"))
            .repartition(parts, $("doc_id"))
            .groupBy($("doc_id")).agg(min($("cand")).as("best"))
          val (next, nextCk) = iterCheckpoint(dist
            .join(relax, Seq("doc_id"), "left")
            .select($("doc_id"),
              least($("dist"), coalesce($("best"), lit(Unreached))).as("dist"),
              ($("best") < $("dist")).as("chg")), resetStats = it % 4 == 3)
          distCk.unpersist(); distCk = nextCk
          frontier = next.filter(coalesce($("chg"), lit(false))).select($("doc_id"), $("dist"))
          dist = next.select($("doc_id"), $("dist"))
          frontierRows = frontier.count()
          it += 1
        }
        dist.orderBy($("doc_id"))
      },
      oracle = Some {
        val steps = (1 to Iters).map { i =>
          s"""d$i AS (
             |  SELECT p.doc_id,
             |    CAST(least(p.dist, COALESCE(r.best, 999)) AS BIGINT) AS dist
             |  FROM d${i - 1} p LEFT JOIN (
             |    SELECT e.dst, MIN(q.dist + 1) AS best
             |    FROM edges e JOIN d${i - 1} q ON q.doc_id = e.src
             |    GROUP BY e.dst) r ON r.dst = p.doc_id)""".stripMargin
        }.mkString(",\n")
        s"""WITH $edgesSql,
           |d0 AS (
           |  SELECT doc_id,
           |    CAST(CASE WHEN doc_id % 17 = 0 THEN 0 ELSE 999 END AS BIGINT) AS dist
           |  FROM docs),
           |$steps
           |SELECT doc_id, dist FROM d$Iters ORDER BY doc_id""".stripMargin
      }),

    // Q86 [extension: weakly connected components] min-label propagation
    // with the q27e pointer-doubling shape (each round propagates through
    // BOTH raw edges and current labels, so convergence is O(log diameter)
    // rounds, not O(diameter)) over a SPARSER functional link graph (one
    // out-edge per doc — k=1 of the q73 generator), whose undirected
    // components are the classic rho-shaped cycle+trees: several
    // components of very different sizes, unlike the k=3 graph which is
    // almost surely one giant component. Labels are integers, so the
    // output hash-matches the oracle's recursive-CTE closure exactly.
    //
    // ALTERNATING STAR CONTRACTION (Kiveris et al., "Connected Components
    // in MapReduce and Beyond", SoCC'14 — the published scale-correct CC
    // algorithm). Round-9/10 history, kept as a warning: min-label
    // propagation over a STATIC edge set — even with pointer-doubling
    // pulls — is NOT O(log n): pointer shortcuts only help nodes whose
    // pointer targets the min's flood has already reached, so the true
    // bound is the min node's graph eccentricity. The sf0.1 functional
    // graph has a 4905-node component of diameter ≥ 401 — the old dense
    // loop's 20-round cap was silently returning unconverged labels at
    // bench scale (only the sf0.01 oracle tier converged), and the
    // frontier rewrite inherited the same wall honestly (loud require).
    //
    // Star contraction rewrites the EDGE SET each round, which is what
    // makes the round count genuinely logarithmic regardless of diameter:
    //   large-star(v): every neighbor w > v re-attaches to m(v) =
    //     min(N(v) ∪ {v}) — tall chains fold toward local minima;
    //   small-star(v): every neighbor w ≤ v (plus v) attaches to m(v) —
    //     local minima merge downward.
    // Both preserve connectivity (every rewritten edge stays within the
    // component; a node always remains attached through its smaller
    // neighbors' emissions or its own local-min edges), the edge multiset
    // never grows beyond O(m), and alternation converges in O(log² n)
    // rounds w.h.p. (measured here: sf0.01 in 6 rounds, sf0.1 — diameter
    // 400+ — in 8). At fixpoint every component is a star rooted at its
    // minimum id, so the label is just min(N(v) ∪ {v}); isolated docs
    // (self-loop-only generators) label themselves via the left join.
    //
    // Scale shape per round: one groupBy(src).min + one |E| re-attach
    // join, both shuffling edge-count rows partitioned by
    // labelPartitions(n) — no session-conf mutation; per-round
    // materialization via iterCheckpoint (see its doc). Convergence =
    // star fixpoint (per-node min unchanged), enforced with a loud
    // require (ADVICE r9), and checked against the recursive-CTE closure
    // oracle.
    "q86_wcc" -> QueryDef(
      build = (s, d) => {
        val docs = Tables.documents(s, d).select($("doc_id"))
        val n = docs.count()
        val directed = docs
          .select($("doc_id").as("src"),
            (($("doc_id") * lit(2654435761L) + lit(1)) % 1000000007L % n).as("dst"))
          .filter($("dst") =!= $("src"))
        val mins = starContract(directed, labelPartitions(n))
        docs
          .join(mins.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
          .select($("doc_id"), coalesce($("rep"), $("doc_id")).as("rep"))
          .orderBy($("doc_id"))
      },
      oracle = Some(
        """WITH RECURSIVE
          |docs AS (SELECT doc_id FROM documents),
          |n AS (SELECT count(*) AS c FROM docs),
          |directed AS (
          |  SELECT doc_id AS src,
          |         (doc_id * 2654435761 + 1) % 1000000007 % (SELECT c FROM n) AS dst
          |  FROM docs),
          |edges(a, b) AS (
          |  SELECT src, dst FROM directed WHERE src <> dst
          |  UNION SELECT dst, src FROM directed WHERE src <> dst),
          |reach(a, b) AS (
          |  SELECT a, b FROM edges
          |  UNION
          |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
          |reps AS (SELECT a AS doc_id, least(a, min(b)) AS rep FROM reach GROUP BY a)
          |SELECT d.doc_id, coalesce(r.rep, d.doc_id) AS rep
          |FROM docs d LEFT JOIN reps r ON d.doc_id = r.doc_id
          |ORDER BY d.doc_id""".stripMargin)),

    // Q73b [extension: triangle counting] per-node triangle counts on the
    // undirected graph via DEGREE-ORDERED orientation (the published
    // MapReduce-triangles trick, Suri & Vassilvitskii): orient every edge
    // from its lower-(degree, id) endpoint to the higher, enumerate wedges
    // a→b→c, close them against the oriented edges. Any acyclic total
    // order finds each triangle exactly once (the triangle's minimum
    // vertex owns both out-edges), so the OUTPUT is orientation-
    // independent — the oracle keeps plain id-ordering — but degree
    // ordering provably bounds per-node wedge fan-out by O(√m) on skewed
    // graphs, where id-ordering lets one high-degree hub generate deg²
    // wedges. Two shuffle equi-joins on node keys; no cartesian
    // (PlanSpec-locked).
    "q73b_triangles" -> QueryDef(
      build = (s, d) => trianglesPerNode(s, d)._2.orderBy($("doc_id")),
      oracle = Some(
        s"""WITH $edgesSql,
           |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           |        FROM edges),
           |tri AS (
           |  SELECT e1.a, e1.b, e2.b AS c
           |  FROM und e1
           |  JOIN und e2 ON e1.b = e2.a
           |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri
           |FROM (SELECT unnest([a, b, c]) AS doc_id FROM tri)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Q83 [extension: local clustering coefficient] cc(v) = 2·T(v) /
    // (deg(v)·(deg(v)−1)) for every node with deg ≥ 2 — the standard
    // community/spam-density signal on a web graph, here in exact integer
    // MICRO units ((2·T·10^6) div (deg·(deg−1)), all positive, so Spark
    // `div` ≡ DuckDB `//`). Reuses the degree-ordered triangle machinery;
    // nodes in no triangle get cc 0 via a left join, so the output covers
    // the whole deg≥2 population, not just triangle corners.
    "q83_clustering_coeff" -> QueryDef(
      build = (s, d) => {
        val (deg, tri) = trianglesPerNode(s, d)
        deg.filter($("deg") >= 2)
          .join(tri, deg("n") === tri("doc_id"), "left")
          .select(deg("n").as("doc_id"), $("deg"),
            coalesce($("n_tri"), lit(0L)).as("n_tri"))
          .withColumn("cc_micro",
            expr("2 * n_tri * 1000000 div (deg * (deg - 1))"))
          .orderBy($("doc_id"))
      },
      oracle = Some(
        s"""WITH $edgesSql,
           |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           |        FROM edges),
           |deg AS (
           |  SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
           |    SELECT a AS n FROM und UNION ALL SELECT b FROM und)
           |  GROUP BY n),
           |tri AS (
           |  SELECT e1.a, e1.b, e2.b AS c
           |  FROM und e1
           |  JOIN und e2 ON e1.b = e2.a
           |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
           |tpn AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri
           |  FROM (SELECT unnest([a, b, c]) AS doc_id FROM tri) GROUP BY doc_id)
           |SELECT d.n AS doc_id, d.deg,
           |  COALESCE(t.n_tri, 0) AS n_tri,
           |  CAST((2 * COALESCE(t.n_tri, 0) * 1000000) // (d.deg * (d.deg - 1))
           |    AS BIGINT) AS cc_micro
           |FROM deg d LEFT JOIN tpn t ON t.doc_id = d.n
           |WHERE d.deg >= 2
           |ORDER BY doc_id""".stripMargin)),

    // Q104 [extension: k-core decomposition] Iterative peeling to the
    // 3-core of the undirected link graph: repeatedly drop every vertex
    // whose current degree is < k until none is (the standard
    // batch-peeling formulation — each round is one degree aggregate +
    // one both-endpoints-survive semi-restriction, all shuffling
    // edge-count rows on `src`/`dst`). The round count is bounded by the
    // peeling DEPTH (the longest chain of cascading removals), not the
    // graph diameter; convergence is verified loudly (edge count stable ⟺
    // no vertex below k remains) with the same iterCheckpoint hygiene as
    // q85/q86 — flat lineage, bounded stats, data-derived partitioning.
    // The core is the densest robust substructure cheap enough to compute
    // at corpus scale — the standard prefilter for community/influence
    // analysis over a 100 TB link graph. The oracle unrolls the peeling
    // rounds as CTE algebra (the q85 precedent).
    "q104_kcore" -> QueryDef(
      build = (s, d) => {
        // 33 = the oracle's 32 productive unrolled rounds + the final
        // quiescent pass that clears the convergence require (a graph
        // peeling in exactly 32 rounds must still observe one stable
        // round). 32 covers the sf1 soak's key-strided copies, whose
        // per-copy link structure peels deeper than sf0.1's 16; rounds
        // after convergence cost nothing on the engine side (the loop
        // exits at the first stable round) and are no-ops in the oracle
        // (k-core peeling is monotone — extra rounds fix the same point)
        val K = 3; val Rounds = 33
        val (n, _, edges) = linkGraphN(s, d)
        val parts = labelPartitions(n)
        val und = edges.select($("src"), $("dst"))
          .unionByName(edges.select($("dst").as("src"), $("src").as("dst")))
          .filter($("src") =!= $("dst")).distinct()
        var (e, eCk) = iterCheckpoint(
          und.repartition(parts, $("src")), resetStats = false)
        var edgeCount = e.count()
        var removing = true
        var it = 0
        while (it < Rounds && removing) {
          val keep = e.groupBy($("src")).agg(count(lit(1)).as("deg"))
            .filter($("deg") >= K).select($("src").as("v"))
          val pruned = e
            .join(keep.select($("v").as("src")), "src")
            .join(keep.select($("v").as("dst")), "dst")
            .select($("src"), $("dst"))
          val (ne, neCk) = iterCheckpoint(
            pruned.repartition(parts, $("src")), it % 4 == 3)
          val newCount = ne.count()
          removing = newCount != edgeCount
          edgeCount = newCount
          eCk.unpersist(); eCk = neCk; e = ne
          it += 1
        }
        require(!removing,
          s"k-core peeling did not converge within $Rounds rounds")
        e.groupBy($("src").as("doc_id")).agg(count(lit(1)).as("deg"))
          .orderBy($("doc_id"))
      },
      oracle = Some {
        // MATERIALIZED is load-bearing: each round references the previous
        // edge set three times, so an inlining planner would expand e0
        // 3^16 ways (observed: fd exhaustion); materialization makes the
        // unrolled chain linear, exactly like the engine's per-round
        // checkpoints
        val rounds = (1 to 32).map { i =>
          s"""k$i AS MATERIALIZED (SELECT src FROM e${i - 1} GROUP BY src
             |  HAVING count(*) >= 3),
             |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
             |  JOIN k$i a ON a.src = e.src
             |  JOIN k$i b ON b.src = e.dst)""".stripMargin
        }.mkString(",\n")
        s"""WITH $edgesSql,
           |e0 AS MATERIALIZED (
           |  SELECT DISTINCT src, dst FROM (
           |    SELECT src, dst FROM edges
           |    UNION ALL SELECT dst, src FROM edges)
           |  WHERE src <> dst),
           |$rounds
           |SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS deg
           |FROM e32 GROUP BY src ORDER BY doc_id""".stripMargin
      }),

    // Q100 [extension: recursive CTE] Bounded-depth graph walk as a BARE
    // `WITH RECURSIVE` statement — the SQL face of the engine's iterative
    // graph machinery (q85 writes the same relaxation as a DataFrame loop
    // with explicit checkpoint hygiene; an analyst writes THIS). Spark
    // 4's recursive CTE (UnionLoop) executes each step as a distributed
    // join against the previous step's output; as of 4.1 only UNION ALL
    // recursion is supported (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so
    // on the cyclic link graph termination comes from the `hops < 5`
    // depth guard — the standard bounded-walk shape — and min-hops is
    // aggregated OUTSIDE the loop. Seeds are q85's (doc_id % 17 = 0) over
    // the SAME memoized edge DF every graph gate shares; the oracle runs
    // the identical recursive statement in DuckDB over the edge CTE.
    // Scale: each step shuffles only the frontier-join output; the walk's
    // path count is bounded by seeds × branching^depth (a depth guard is
    // mandatory on cyclic inputs anyway), and the closing groupBy folds
    // it back to ≤ |V| rows — for UNbounded closure, q85/q86's
    // dedup-per-round DataFrame loops remain the scale path.
    "q100_recursive_cte" -> QueryDef(
      build = (s, d) => {
        val (docs, edges) = linkGraph(s, d)
        docs.createOrReplaceTempView("q100_docs")
        edges.createOrReplaceTempView("q100_edges")
        s.sql(
          """WITH RECURSIVE walk AS (
            |  SELECT doc_id, CAST(0 AS BIGINT) AS hops
            |  FROM q100_docs WHERE doc_id % 17 = 0
            |  UNION ALL
            |  SELECT e.dst AS doc_id, w.hops + CAST(1 AS BIGINT) AS hops
            |  FROM walk w JOIN q100_edges e ON e.src = w.doc_id
            |  WHERE w.hops < 5)
            |SELECT doc_id, MIN(hops) AS hops
            |FROM walk GROUP BY doc_id ORDER BY doc_id""".stripMargin)
      },
      oracle = Some(
        s"""WITH RECURSIVE $edgesSql,
           |walk AS (
           |  SELECT doc_id, CAST(0 AS BIGINT) AS hops
           |  FROM docs WHERE doc_id % 17 = 0
           |  UNION ALL
           |  SELECT e.dst AS doc_id, w.hops + CAST(1 AS BIGINT) AS hops
           |  FROM walk w JOIN edges e ON e.src = w.doc_id
           |  WHERE w.hops < 5)
           |SELECT doc_id, CAST(MIN(hops) AS BIGINT) AS hops
           |FROM walk GROUP BY doc_id ORDER BY doc_id""".stripMargin))
  )

  /** Shared by q73b/q83: undirected degree table `(n, deg)` and per-node
    * triangle counts `(doc_id, n_tri)` via degree-ordered orientation
    * (see the q73b comment for the correctness/skew argument).
    */
  private def trianglesPerNode(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val (_, edges) = linkGraph(s, d)
    val undirected = edges
      .select(least($("src"), $("dst")).as("a"), greatest($("src"), $("dst")).as("b"))
      .distinct()
    // undirected degree per node, then orient by (deg, id)
    val deg = undirected.select($("a").as("n"))
      .unionAll(undirected.select($("b").as("n")))
      .groupBy($("n")).agg(count(lit(1)).as("deg"))
    // oriented edge layout shared by q73b + q83 via the derived cache
    val und = cachedDerived(s, d, "oriented") {
      undirected
        .join(deg.select($("n").as("a"), $("deg").as("da")), "a")
        .join(deg.select($("n").as("b"), $("deg").as("db")), "b")
        .select(
          when($("da") < $("db") || ($("da") === $("db") && $("a") < $("b")),
            struct($("a").as("t"), $("b").as("h")))
            .otherwise(struct($("b").as("t"), $("a").as("h"))).as("e"))
        .select($("e.t").as("a"), $("e.h").as("b"))
    }
    val wedges = und.as("e1")
      .join(und.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("wa"), col("e1.b").as("wb"), col("e2.b").as("wc"))
    val tri = wedges
      .join(und.as("e3"),
        col("wa") === col("e3.a") && col("wc") === col("e3.b"))
      .select($("wa").as("a"), $("wb").as("b"), $("wc").as("c"))
    val perNode = tri.select(explode(array($("a"), $("b"), $("c"))).as("doc_id"))
      .groupBy($("doc_id")).agg(count(lit(1)).as("n_tri"))
    (deg, perNode)
  }
}
