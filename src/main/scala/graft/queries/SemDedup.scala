package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Q53 [extension: semantic deduplication] — SemDeDup-style corpus pruning
  * (Abbas et al. 2023, arXiv:2303.09540): cluster the embedding space with
  * k-means, then search for near-duplicate pairs ONLY inside clusters, so
  * the O(N²) pair search becomes k independent O((N/k)²) local searches.
  * Within a duplicate pair the higher vec_id is dropped (the paper keeps
  * the point farthest from its centroid; the lowest-id tiebreak is the
  * deterministic simplification, same as q27b/q27d).
  *
  * Plan shape at 100 TB: cluster training is bounded model state (k×64
  * floats via [[LlmSimilarity.trainCells]], the IVF trainer). Candidate
  * generation self-joins (vec_id, cell) ID PAIRS only — embeddings never
  * ride the candidate shuffle (q26b convention) and rejoin by id for the
  * exact-cosine verify. Each vector is assigned to its TOP-2 cells
  * (multi-probe flavor): a pair is a candidate if the cells overlap, which
  * squares the single-assignment miss probability for 2× key amplification
  * on an id-width column. `cell` is the shuffle/partition key, so every
  * cluster dedups locally and in parallel.
  *
  * Gate design: approximate ⇒ self-checking contract rows (the q26b
  * pattern), one row per vector:
  *   - `dropped_exact` — does this vector have a LOWER-ID neighbor at
  *     cos ≥ τ? Computed in-engine by the exact triangle-blocked pair scan
  *     (q27d's referee) and INDEPENDENTLY by the DuckDB oracle's brute
  *     force — a real cross-engine hash check of the exact semantics.
  *   - `subset_ok` — the clustered path never drops a vector the exact
  *     path keeps (its verify stage re-checks true cosine, so precision is
  *     1.0 by construction; the gate proves the implementation honors it).
  *   - `recall_ok` — corpus-level: the clustered path caught ≥ 60% of the
  *     exact drop set (same boolean on every row; empty drop sets pass
  *     vacuously). Gate-verified at all three SFs against exact drop sets
  *     of 7 / 14 / 135 vectors (sf0.001/0.01/0.1, DuckDB brute force) on
  *     uniform-random testdata — SemDeDup's worst case; real corpora
  *     cluster, which concentrates true dups inside cells and raises
  *     recall toward 1.
  * τ = 0.45 (the q27d threshold — testdata max pairwise cos ≈ 0.513, so
  * the drop set is small but real at every SF).
  */
object SemDedup {
  private def $(name: String) = col(name)

  val defs: Map[String, QueryDef] = Map(

    "q53_semdedup" -> QueryDef(
      build = (s, d) => {
        val tau = 0.45; val minRecallPct = 60L
        val nm = LlmSimilarity.normed(s, d).cache()
        // cells scale WITH the corpus (target ~1.5k vectors per cell,
        // floor 8): k-means cells are the layout that keeps the in-cell
        // pair search O(k·(N/k)²) = O(N²/k) — a k tuned to one SF turns
        // super-linear the moment the corpus grows (the r15 sf1 soak
        // measured exactly that at fixed k=8). The driver SFs all sit at
        // the floor, so results there are unchanged; the oracle is
        // k-independent (exact brute force + contract booleans). Ceiling
        // note: assignment is a codegen'd per-cell expression — beyond
        // ~10³ cells move it to a broadcast-centroid join.
        val k = math.max(8L, nm.count() / 1500L).toInt
        val cents = LlmSimilarity.trainCells(nm, k, rounds = 2)

        // top-2 cell assignment: sort (score, idx) structs desc, take 2
        val top2 = {
          val a = array(cents.zipWithIndex.map { case (c, i) =>
            struct((LlmSimilarity.dot($("embedding"), typedlit(c)) /
              lit(LlmSimilarity.nrm2(c))).as("s"), lit(i).as("i"))
          }: _*)
          transform(slice(reverse(array_sort(a)), 1, 2), x => x("i"))
        }
        val keys = nm.select($("vec_id"), explode(top2).as("cell"))

        // in-cell candidate id pairs (a pair sharing both cells meets twice
        // → dropDuplicates), then rejoin embeddings by id for exact verify
        val cand = keys.select($("cell"), $("vec_id").as("a_id"))
          .join(keys.select($("cell").as("c2"), $("vec_id").as("b_id")),
            $("cell") === $("c2") && $("a_id") < $("b_id"))
          .select($("a_id"), $("b_id")).dropDuplicates("a_id", "b_id")
        val clusterDropped = cand
          .join(nm.select($("vec_id").as("a_id"), $("embedding").as("ae"), $("nrm").as("an")), "a_id")
          .join(nm.select($("vec_id").as("b_id"), $("embedding").as("be"), $("nrm").as("bn")), "b_id")
          .filter(LlmSimilarity.dot($("ae"), $("be")) / ($("an") * $("bn")) >= tau)
          .select($("b_id").as("vec_id")).distinct()

        // exact referee: q27d's triangle-blocked full pair scan at the same τ
        val exactDropped = LlmSimilarity.exactNearDupPairs(s, d, tau)
          .select($("b_id").as("vec_id")).distinct()

        val stats = exactDropped.as("e")
          .join(clusterDropped.as("c"), $("e.vec_id") === $("c.vec_id"), "left")
          .agg(count(lit(1)).as("n_exact"), count($("c.vec_id")).as("n_caught"))
          .select(($("n_caught") * 100 >= $("n_exact") * minRecallPct).as("recall_ok"))

        nm.select($("vec_id"))
          .join(exactDropped.withColumn("de", lit(true)), Seq("vec_id"), "left")
          .join(clusterDropped.withColumn("dc", lit(true)), Seq("vec_id"), "left")
          .crossJoin(broadcast(stats))
          .select($("vec_id"),
            coalesce($("de"), lit(false)).as("dropped_exact"),
            (!(coalesce($("dc"), lit(false)) && !coalesce($("de"), lit(false)))).as("subset_ok"),
            $("recall_ok"))
          .orderBy($("vec_id"))
      },
      oracle = Some(
        s"""WITH n AS (${LlmSimilarity.normedSql}),
           |dropped AS (
           |  SELECT DISTINCT c.vec_id
           |  FROM n q, n c
           |  WHERE q.vec_id < c.vec_id
           |    AND ${LlmSimilarity.dotSql} / (q.nrm * c.nrm) >= 0.45)
           |SELECT vec_id,
           |  vec_id IN (SELECT vec_id FROM dropped) AS dropped_exact,
           |  true AS subset_ok, true AS recall_ok
           |FROM embeddings ORDER BY vec_id""".stripMargin),
      headline = true),

    // Q60 [extension: int8 embedding quantization] Symmetric per-vector
    // int8 quantization — the standard 4× memory cut for a serving index
    // (float32 → int8 + one float scale per vector): scale = max|x|/127,
    // code_i = round(x_i/scale) ∈ [-127, 127]. The gate hash-checks exact
    // INTEGER code aggregates (sum/min/max — both engines round identical
    // IEEE doubles away from zero, so codes match bit-for-bit) plus the
    // reconstruction-error contract |x_i − code_i·scale| ≤ scale/2 that
    // makes the compression usable for ANN rerank. Pure per-row column
    // work — zero shuffle before the output sort; composes with q26d's PQ
    // path (PQ compresses positions, int8 compresses magnitudes).
    "q60_int8_quant" -> QueryDef(
      build = (s, d) => {
        val codes = transform($("embedding"),
          x => round(x.cast("double") / $("scale")).cast("long"))
        Tables.embeddings(s, d)
          .withColumn("scale",
            array_max(transform($("embedding"), x => abs(x.cast("double")))) / 127.0)
          .filter($("scale") > 0) // degenerate all-zero vectors can't quantize
          .withColumn("codes", codes)
          .select($("vec_id"),
            aggregate($("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
            array_min($("codes")).as("code_min"),
            array_max($("codes")).as("code_max"),
            (array_max(zip_with($("embedding"), $("codes"),
              (e, c) => abs(e.cast("double") - c * $("scale"))))
              <= $("scale") * 0.5000001).as("err_ok"))
          .orderBy($("vec_id"))
      },
      oracle = Some(
        """WITH q AS (
          |  SELECT vec_id, embedding,
          |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
          |  FROM embeddings),
          |c AS (
          |  SELECT vec_id, scale, embedding,
          |    list_transform(embedding,
          |      x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT)) AS codes
          |  FROM q WHERE scale > 0)
          |SELECT vec_id,
          |  list_reduce(list_prepend(0::BIGINT, codes), (a,b) -> a + b) AS code_sum,
          |  list_min(codes) AS code_min,
          |  list_max(codes) AS code_max,
          |  list_max(list_transform(list_zip(embedding, codes),
          |    p -> abs(CAST(p[1] AS DOUBLE) - p[2] * scale))) <= scale * 0.5000001 AS err_ok
          |FROM c ORDER BY vec_id""".stripMargin)),

    // Q64 [extension: random projection / dimensionality reduction] Seeded
    // Johnson-Lindenstrauss sign projection 64-d → k-d: rp_j = Σ_i x_i ·
    // s(i,j) with s(i,j) ∈ {±1} derived from an integer hash of (i,j) — the
    // matrix-free JL variant (Achlioptas 2003: Rademacher entries preserve
    // pairwise distances like Gaussian ones), which at 100 TB means the
    // "matrix" ships as one seed constant, not a broadcast, and projection
    // is a zero-shuffle per-row map. This is the front half of every
    // bit-sampling LSH / compact-index build (q27c's SimHash is exactly
    // this plus sign-thresholding). Determinism: the fold over i is a LEFT
    // fold in index order on doubles (float→double casts are exact), the
    // convention LlmSimilarity's scaladoc pins — both engines produce
    // bit-identical sums, hash-checked after round(·,4).
    "q64_random_projection" -> QueryDef(
      build = (s, d) => {
        def sign(i: org.apache.spark.sql.Column, j: Int) =
          when(pmod((i.cast("long") * 31L + lit(j.toLong)) * 2654435761L,
            lit(1000000007L)) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
        def rp(j: Int) = aggregate(sequence(lit(0), lit(63)), lit(0.0),
          (acc, i) => acc + element_at($("embedding"), i + 1).cast("double") * sign(i, j))
        // + 0.0 after the round: a sum that rounds to zero from below is
        // -0.0, whose sign bit survives round() differently across engines;
        // IEEE -0.0 + 0.0 = +0.0 normalizes it on both sides.
        Tables.embeddings(s, d)
          .select(Seq($("vec_id")) ++
            (0 until 4).map(j => (round(rp(j), 4) + lit(0.0)).as(s"rp$j")): _*)
          .orderBy($("vec_id"))
      },
      oracle = Some {
        def rpSql(j: Int) =
          "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
            "list_transform(range(0, 64), i -> CAST(embedding[i+1] AS DOUBLE) * " +
            s"(CASE WHEN ((i*31 + $j) * 2654435761 % 1000000007) % 2 = 0 " +
            "THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END))), " +
            "(a,b) -> a + b)"
        s"""SELECT vec_id,
           |  ${(0 until 4).map(j => s"round(${rpSql(j)}, 4) + 0.0 AS rp$j").mkString(",\n  ")}
           |FROM embeddings ORDER BY vec_id""".stripMargin
      }))
}
