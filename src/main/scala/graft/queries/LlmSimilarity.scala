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
  private def normed(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.install(s)
    Tables.embeddings(s, d).select($("vec_id"), $("embedding"), norm($("embedding")).as("nrm"))
  }

  private val normedSql =
    """SELECT vec_id, embedding,
      |  sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
      |    x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))), (a,b)->a+b)) AS nrm
      |FROM embeddings""".stripMargin

  private val dotSql =
    """list_reduce(list_prepend(0.0, list_transform(
      |    list_zip(q.embedding, c.embedding),
      |    p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE))), (a,b)->a+b)""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // Q26 [J8 + extension] brute-force cosine top-3 per query vector.
    // The query side (vec_id % 50 = 0) is tiny and BROADCAST; the candidate
    // side streams — so the "cross join" is really a broadcast nested loop
    // over the big side with no shuffle of the candidates. This is the exact
    // oracle/baseline path; the 100 TB path is q26b (LSH-pruned).
    "q26_ann_topk" -> QueryDef(
      build = (s, d) => {
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
      },
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
    // Approximate ⇒ rows-only checked; recall vs q26 asserted in
    // LlmSimilaritySpec.
    "q26b_ann_lsh" -> QueryDef(
      build = (s, d) => {
        val nTables = 6
        val nPlanes = 4
        // plane component in [-1, 1): derived from xxhash64 of (t, p, i).
        val planeComp: (Column, Column, Column) => Column = (t, p, i) =>
          pmod(xxhash64(lit("plane"), t, p, i), lit(2000001)).cast("double") / 1000000.5 - lit(1.0)
        val buckets: Column = transform(sequence(lit(0), lit(nTables - 1)), t =>
          struct(t.as("tbl"), array_join(
            transform(sequence(lit(0), lit(nPlanes - 1)), p => {
              val proj = aggregate(
                zip_with($("embedding"), sequence(lit(0), lit(63)),
                  (x, i) => x.cast("double") * planeComp(t, p, i)),
                lit(0.0), (acc, v) => acc + v)
              when(proj >= 0, lit("1")).otherwise(lit("0"))
            }), "").as("bkt")))
        val n = normed(s, d).withColumn("tb", explode(buckets))
        val q = n.filter($("vec_id") % 50 === 0)
          .select($("vec_id").as("qid"), $("embedding").as("qe"),
            $("nrm").as("qn"), $("tb").as("qtb"))
        val w = Window.partitionBy($("qid")).orderBy(desc("cos"), $("cid"))
        n.join(broadcast(q), $("tb") === $("qtb") && $("vec_id") =!= $("qid"))
          .select($("qid"), $("vec_id").as("cid"), $("qe"), $("embedding"), $("qn"), $("nrm"))
          .dropDuplicates("qid", "cid") // a pair can collide in several tables — score once
          .select($("qid"), $("cid"),
            (dot($("qe"), $("embedding")) / ($("qn") * $("nrm"))).as("cos"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter($("rnk") <= 3)
          .orderBy($("qid"), $("rnk"))
      },
      oracle = None),

    // Q27d [extension] embedding-cosine near-duplicate pairs: all pairs with
    // cos >= 0.45 (testdata max pairwise cos is ~0.513, so the output is
    // small but non-empty). Brute force here = the oracle path; the scale
    // path reuses q26b's bucketing before the exact filter.
    "q27d_dedup_embedding" -> QueryDef(
      build = (s, d) => {
        val n = normed(s, d)
        val a = n.select($("vec_id").as("a_id"), $("embedding").as("ae"), $("nrm").as("an"))
        val b = n.select($("vec_id").as("b_id"), $("embedding").as("be"), $("nrm").as("bn"))
        a.join(b, $("a_id") < $("b_id"))
          .select($("a_id"), $("b_id"),
            (dot($("ae"), $("be")) / ($("an") * $("bn"))).as("cos"))
          .filter($("cos") >= 0.45)
          .orderBy($("a_id"), $("b_id"))
      },
      oracle = Some(
        s"""WITH n AS ($normedSql)
           |SELECT q.vec_id AS a_id, c.vec_id AS b_id,
           |  $dotSql / (q.nrm * c.nrm) AS cos
           |FROM n q, n c
           |WHERE q.vec_id < c.vec_id
           |  AND $dotSql / (q.nrm * c.nrm) >= 0.45
           |ORDER BY a_id, b_id""".stripMargin))
  )
}
