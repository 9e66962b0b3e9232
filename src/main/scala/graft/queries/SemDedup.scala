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
        val k = 8; val tau = 0.45; val minRecallPct = 60L
        val nm = LlmSimilarity.normed(s, d).cache()
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
          |FROM c ORDER BY vec_id""".stripMargin)))
}
