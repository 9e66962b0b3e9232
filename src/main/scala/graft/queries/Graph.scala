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

  /** (docs, edges) as DataFrames: docs(doc_id), edges(src, dst). */
  private def linkGraph(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, d).select($("doc_id"))
    val n = docs.count() // one tiny job; N pins the dst modulus
    val edges = docs
      .select($("doc_id").as("src"), explode(sequence(lit(1), lit(3))).as("k"))
      .select($("src"),
        (($("src") * lit(2654435761L) + $("k")) % 1000000007L % n).as("dst"))
      .filter($("dst") =!= $("src"))
      .distinct()
    (docs, edges)
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
        val dcache = docs.cache()
        val deg = edges.groupBy($("src")).agg(count(lit(1)).as("deg"))
        // one co-partitioned (src → dst, deg) layout reused every iteration
        val edgesDeg = edges.join(deg, "src").cache()
        var pr = dcache.select($("doc_id"), lit(Scale).as("pr")).localCheckpoint(true)
        for (_ <- 1 to Iters) {
          val contrib = edgesDeg
            .join(pr.withColumnRenamed("doc_id", "src"), "src")
            .select($("dst"), expr("pr div deg").as("c"))
            .groupBy($("dst")).agg(sum($("c")).as("m"))
          val next = dcache
            .join(contrib, dcache("doc_id") === contrib("dst"), "left")
            .select($("doc_id"),
              (lit(15L * Scale / 100) +
                expr("85 * coalesce(m, CAST(0 AS BIGINT)) div 100")).as("pr"))
          val nn = next.localCheckpoint(true)
          pr.unpersist(); pr = nn
        }
        edgesDeg.unpersist(); dcache.unpersist()
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
        val dcache = docs.cache()
        val deg = edges.groupBy($("src")).agg(count(lit(1)).as("deg"))
        val edgesDeg = edges.join(deg, "src").cache()
        val seedMass = lit(15L * Scale / 100)
        def restart(id: org.apache.spark.sql.Column) =
          when(id % 17 === 0, seedMass).otherwise(lit(0L))
        var pr = dcache
          .select($("doc_id"), when($("doc_id") % 17 === 0, lit(Scale))
            .otherwise(lit(0L)).as("pr"))
          .localCheckpoint(true)
        for (_ <- 1 to Iters) {
          val contrib = edgesDeg
            .join(pr.withColumnRenamed("doc_id", "src"), "src")
            .select($("dst"), expr("pr div deg").as("c"))
            .groupBy($("dst")).agg(sum($("c")).as("m"))
          val next = dcache
            .join(contrib, dcache("doc_id") === contrib("dst"), "left")
            .select($("doc_id"),
              (restart($("doc_id")) +
                expr("85 * coalesce(m, CAST(0 AS BIGINT)) div 100")).as("pr"))
          val nn = next.localCheckpoint(true)
          pr.unpersist(); pr = nn
        }
        edgesDeg.unpersist(); dcache.unpersist()
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
    "q85_bfs_hops" -> QueryDef(
      build = (s, d) => {
        val Unreached = 999L
        val (docs, edges) = linkGraph(s, d)
        val dcache = docs.cache()
        val ecache = edges.cache()
        var dist = dcache
          .select($("doc_id"), when($("doc_id") % 17 === 0, lit(0L))
            .otherwise(lit(Unreached)).as("dist"))
          .localCheckpoint(true)
        for (_ <- 1 to Iters) {
          val relax = ecache
            .join(dist.withColumnRenamed("doc_id", "src"), "src")
            .select($("dst"), ($("dist") + 1L).as("cand"))
            .groupBy($("dst")).agg(min($("cand")).as("best"))
          val next = dist
            .join(relax, dist("doc_id") === relax("dst"), "left")
            .select(dist("doc_id"),
              least($("dist"), coalesce($("best"), lit(Unreached))).as("dist"))
          val nn = next.localCheckpoint(true)
          dist.unpersist(); dist = nn
        }
        ecache.unpersist(); dcache.unpersist()
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
    // Per round: ONE join + one min-groupBy + localCheckpoint (the q27e
    // scale shape); host operator of the corpus-dedup family, exposed here
    // on a pure graph so the component semantics is oracle-checked in
    // isolation from any similarity pipeline.
    "q86_wcc" -> QueryDef(
      build = (s, d) => {
        val docs = Tables.documents(s, d).select($("doc_id"))
        val n = docs.count()
        val directed = docs
          .select($("doc_id").as("src"),
            (($("doc_id") * lit(2654435761L) + lit(1)) % 1000000007L % n).as("dst"))
          .filter($("dst") =!= $("src"))
        val edges = directed
          .unionByName(directed.select($("dst").as("src"), $("src").as("dst")))
          .distinct().cache()
        var labels = docs.select($("doc_id"), $("doc_id").as("rep"))
          .localCheckpoint(true)
        var changed = 1L
        var rounds = 0
        // label frames are |V| rows; at gate volume the ~8 doubling rounds
        // are pure per-job overhead at the session's 32 shuffle partitions
        // (measured at sf0.1: 10.4 s at 32 → 5.2 s at 4-8; the remaining
        // floor is per-round job latency). Production sizes this to the
        // vertex count the same way — the partition count is per-loop
        // state, not a global.
        val spKey = "spark.sql.shuffle.partitions"
        val saved = s.conf.get(spKey)
        s.conf.set(spKey, "4")
        try {
          while (changed > 0 && rounds < 20) {
            val prop = edges
              .union(labels.select($("doc_id").as("src"), $("rep").as("dst")))
              .join(labels.withColumnRenamed("doc_id", "dst2"), $("dst") === $("dst2"))
              .select($("src").as("doc_id"), $("rep"))
            val next = labels.select($("doc_id"), $("rep"), $("rep").as("old"))
              .union(prop.select($("doc_id"), $("rep"), lit(null).as("old")))
              .groupBy($("doc_id"))
              .agg(min($("rep")).as("rep"), min($("old")).as("old"))
              .localCheckpoint(true)
            changed = next.filter($("rep") =!= $("old")).count()
            labels.unpersist()
            labels = next.select($("doc_id"), $("rep"))
            rounds += 1
          }
        } finally s.conf.set(spKey, saved)
        edges.unpersist()
        labels.orderBy($("doc_id"))
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
           |ORDER BY doc_id""".stripMargin))
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
    val und = undirected
      .join(deg.select($("n").as("a"), $("deg").as("da")), "a")
      .join(deg.select($("n").as("b"), $("deg").as("db")), "b")
      .select(
        when($("da") < $("db") || ($("da") === $("db") && $("a") < $("b")),
          struct($("a").as("t"), $("b").as("h")))
          .otherwise(struct($("b").as("t"), $("a").as("h"))).as("e"))
      .select($("e.t").as("a"), $("e.h").as("b"))
      .cache()
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
