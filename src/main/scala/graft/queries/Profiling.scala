package graft.queries

import graft.{Canon, QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Data-profiling extensions: the per-column statistics sweep every
  * warehouse runs before trusting a new feed (q50), and the mergeable-sketch
  * distinct-count pattern that replaces exact COUNT(DISTINCT) at scale
  * (q15c).
  *
  * Reference context: the reference trusts its MySQL schema blindly — there
  * is no profiling surface at all. Profiling is table stakes for a training
  * corpus: null rates and distinct counts are the first contamination and
  * drift signals.
  */
object Profiling {
  import Canon._
  private def $(name: String) = col(name)

  val defs: Map[String, QueryDef] = Map(

    // Q50 [extension: column profiler] One-pass per-column profile of
    // `customer`: row count, null count, exact distinct count, canonical
    // min/max (money canonicalized to integer cents so no IEEE formatting
    // can drift between engines). The five COUNT(DISTINCT)s share a single
    // scan via Expand (5× row multiplication before the partial agg — the
    // map-side combine still bounds the shuffle at #groups × #metrics). At
    // 100 TB the same plan swaps countDistinct for approx_count_distinct
    // (see q15/q15c) — the pivot-to-long-format shape is unchanged.
    "q50_profile" -> QueryDef(
      build = (s, d) => {
        // (column name, canonical value expression) — cents for money.
        val cols = Seq(
          "c_custkey" -> $("c_custkey").cast("long"),
          "c_name" -> $("c_name"),
          "c_nationkey" -> $("c_nationkey").cast("long"),
          "c_acctbal" -> cents($("c_acctbal")),
          "c_mktsegment" -> $("c_mktsegment"))
        val aggs = cols.flatMap { case (n, c) => Seq(
          sum(when(c.isNull, 1L).otherwise(0L)).as(s"nulls_$n"),
          countDistinct(c).as(s"dist_$n"),
          min(c).cast("string").as(s"min_$n"),
          max(c).cast("string").as(s"max_$n"))
        }
        val wide = Tables.customer(s, d)
          .agg(count(lit(1)).as("n_rows"), aggs: _*)
        val stackArgs = cols.map { case (n, _) =>
          s"'$n', nulls_$n, dist_$n, min_$n, max_$n"
        }.mkString(", ")
        wide.selectExpr("n_rows",
          s"stack(${cols.size}, $stackArgs) AS (column_name, n_nulls, n_distinct, min_v, max_v)")
          .select($("column_name"), $("n_rows"), $("n_nulls"), $("n_distinct"),
            $("min_v"), $("max_v"))
          .orderBy($("column_name"))
      },
      oracle = Some {
        val rows = Seq(
          ("c_custkey", "CAST(c_custkey AS BIGINT)"),
          ("c_name", "c_name"),
          ("c_nationkey", "CAST(c_nationkey AS BIGINT)"),
          ("c_acctbal", centsSql("c_acctbal")),
          ("c_mktsegment", "c_mktsegment"))
        rows.map { case (n, e) =>
          s"""SELECT '$n' AS column_name, count(*) AS n_rows,
             |  CAST(count(*) - count($e) AS BIGINT) AS n_nulls,
             |  CAST(count(DISTINCT $e) AS BIGINT) AS n_distinct,
             |  CAST(min($e) AS VARCHAR) AS min_v,
             |  CAST(max($e) AS VARCHAR) AS max_v
             |FROM customer""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
      },
      headline = true),

    // Q15c [extension: mergeable distinct sketches] The 100 TB replacement
    // for exact COUNT(DISTINCT): Apache DataSketches HLL partials built
    // per group (`hll_sketch_agg`), then MERGED upward (`hll_union_agg`) —
    // the cube-of-sketches pattern where a day×region rollup re-aggregates
    // to month×global without touching raw data. Self-checking gate: each
    // per-flag estimate and the merged-global estimate must land within 5%
    // of the exact count (lgConfigK=12 ⇒ ~1.6% RSE, so 5% is a stable
    // margin, not a tuned one). The oracle pins the contract (`ok` = true
    // per scope); the estimates themselves are engine-internal.
    "q15c_sketch_merge" -> QueryDef(
      build = (s, d) => {
        val l = Tables.lineitem(s, d)
        val perGroup = l.groupBy($("l_returnflag"))
          .agg(hll_sketch_agg($("l_partkey")).as("sk"),
            countDistinct($("l_partkey")).as("exact"))
          .cache()
        val groupOk = perGroup.select($("l_returnflag").as("scope"),
          (abs(hll_sketch_estimate($("sk")) - $("exact"))
            <= $("exact") * 0.05).as("ok"))
        // Merged global: union the per-group partials; exact referee needs
        // its own global distinct (part keys overlap across flags).
        val globalExact = l.agg(countDistinct($("l_partkey")).as("gexact"))
        val globalOk = perGroup.agg(hll_union_agg($("sk")).as("gsk"))
          .crossJoin(globalExact)
          .select(lit("GLOBAL").as("scope"),
            (abs(hll_sketch_estimate($("gsk")) - $("gexact"))
              <= $("gexact") * 0.05).as("ok"))
        groupOk.unionByName(globalOk).orderBy($("scope"))
      },
      oracle = Some(
        """SELECT scope, TRUE AS ok FROM (
          |  SELECT DISTINCT l_returnflag AS scope FROM lineitem
          |  UNION ALL SELECT 'GLOBAL')
          |ORDER BY scope""".stripMargin),
      headline = true),

    // Q51 [extension: z-order layout key] Morton-curve clustering key over
    // (l_orderkey, l_partkey) via the native codegen'd
    // [[graft.plans.InterleaveBits]], hash-checked bit-for-bit against the
    // same magic-mask arithmetic in DuckDB, then histogrammed by curve
    // prefix (the unit a writer would range-partition files by). Sorting by
    // this key is what makes 2-D range predicates prunable from parquet
    // row-group stats — ZorderSpec measures the actual row-group skipping
    // (z-layout reads a fraction of what a hash layout reads for the same
    // rectangle query).
    "q51_zorder" -> QueryDef(
      build = (s, d) => {
        graft.GraftExtensions.install(s)
        Tables.lineitem(s, d)
          .select(call_function("interleave_bits",
            $("l_orderkey") % 65536, $("l_partkey") % 65536).as("z"))
          .groupBy(shiftright($("z"), 22).as("z_bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy($("z_bucket"))
      },
      oracle = Some {
        val morton = graft.plans.InterleaveBits.mortonSql(
          "(l_orderkey % 65536)", "(l_partkey % 65536)")
        s"""SELECT ($morton >> 22) AS z_bucket,
           |  CAST(count(*) AS BIGINT) AS n
           |FROM lineitem GROUP BY z_bucket ORDER BY z_bucket""".stripMargin
      },
      headline = true),

    // Q15d [extension: count-min frequency sketch] The frequency twin of
    // q15c's distinct sketch: one combinable pass builds a fixed-size
    // (~100 KB at eps=1e-3) count-min sketch of the key stream with Spark's
    // built-in `count_min_sketch` aggregate; the new native
    // [[graft.plans.CmsEstimate]] probe then answers per-key counts from it
    // — "how hot is key X" without a per-key shuffle, the sublinear-space
    // building block behind frequency capping and hot-key routing at 100 TB
    // (cf. q46's heavy hitters, which needs the exact top set; the CMS
    // answers point queries on EVERY key). Self-checking contract gate
    // (q15c pattern): the CMS guarantee is one-sided, so per key the probe
    // must satisfy exact ≤ est ≤ exact + eps·N (`lower_ok`/`upper_ok`);
    // the exact counts themselves are the cross-engine hash check.
    "q15d_cms_freq" -> QueryDef(
      build = (s, d) => {
        graft.GraftExtensions.install(s)
        val eps = 0.001
        val ev = Tables.events(s, d)
        val sk = ev.select(
          expr(s"count_min_sketch(event_type, ${eps}d, 0.999d, 42)").as("sk"))
          .head.getAs[Array[Byte]](0)
        ev.groupBy($("event_type"))
          .agg(count(lit(1)).as("exact_cnt"))
          .crossJoin(ev.agg(count(lit(1)).as("n_total")))
          .withColumn("est", call_function("cms_estimate", $("event_type"), lit(sk)))
          .select($("event_type"), $("exact_cnt"),
            ($("est") >= $("exact_cnt")).as("lower_ok"),
            ($("est") <= $("exact_cnt")
              + ceil(lit(eps) * $("n_total")).cast("long")).as("upper_ok"))
          .orderBy($("event_type"))
      },
      oracle = Some(
        """SELECT event_type, count(*) AS exact_cnt,
          |  TRUE AS lower_ok, TRUE AS upper_ok
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Q63 [extension: table checksum / anti-entropy] Compare two copies of a
    // petabyte table WITHOUT moving either: each side computes an
    // order-independent fingerprint (row-hash folded with the two standard
    // combiners — XOR, which detects any single-row difference, plus a
    // modular SUM and a count, which un-blind XOR to paired/duplicated-row
    // changes) per scope bucket, then only the tiny checksum rows travel.
    // This is the replica-verification primitive behind storage
    // anti-entropy (Dynamo/Cassandra Merkle levels — per-status scopes here
    // play the tree-node role: a mismatch localizes repair to one scope's
    // rows). Fully combinable aggs ⇒ one map-side-partial pass, shuffle =
    // #scopes rows. Row hash = md5 over '|'-joined canonical renderings
    // (money as exact cents), truncated to 15 hex digits → BIGINT — the
    // gate proves both engines derive identical 60-bit row fingerprints
    // from identical logical rows, i.e. the checksums are portable across
    // engines, not just across replicas of one engine.
    "q63_table_checksum" -> QueryDef(
      build = (s, d) => {
        val fields = Seq(
          $("o_orderkey").cast("string"),
          $("o_custkey").cast("string"),
          $("o_orderstatus"),
          $("o_orderpriority"),
          cents($("o_totalprice")).cast("string"))
        val fp = conv(substring(md5(concat_ws("|", fields: _*)), 1, 15), 16, 10)
          .cast("long")
        // sum_fp is a MODULAR sum: the per-row terms accumulate in
        // DECIMAL(38,0) (no wrap at any row count — a LongType sum of 2^40
        // terms would silently wrap past ~8.4M rows/scope) and the modulus
        // is folded over the total, so the checksum is well-defined at
        // petabyte row counts and identical to DuckDB's HUGEINT sum % M.
        val M = 1099511627776L // 2^40
        val sumFp = pmod(
          sum(pmod($("fp"), lit(M)).cast("decimal(38,0)")),
          lit(M).cast("decimal(38,0)")).cast("long").as("sum_fp")
        val base = Tables.orders(s, d).select($("o_orderstatus"), fp.as("fp"))
        val perScope = base.groupBy($("o_orderstatus").as("scope"))
          .agg(count(lit(1)).as("n_rows"),
            expr("bit_xor(fp)").as("xor_fp"),
            sumFp)
        val global = base
          .agg(count(lit(1)).as("n_rows"),
            expr("bit_xor(fp)").as("xor_fp"),
            sumFp)
          .select(lit("GLOBAL").as("scope"), $("n_rows"), $("xor_fp"), $("sum_fp"))
        perScope.unionByName(global).orderBy($("scope"))
      },
      oracle = Some {
        val fpSql = "CAST(('0x' || substr(md5(concat_ws('|', " +
          "CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), " +
          "o_orderstatus, o_orderpriority, " +
          s"CAST(${centsSql("o_totalprice")} AS VARCHAR))), 1, 15)) AS BIGINT)"
        s"""WITH f AS (
           |  SELECT o_orderstatus, $fpSql AS fp FROM orders)
           |SELECT o_orderstatus AS scope, count(*) AS n_rows,
           |  bit_xor(fp) AS xor_fp,
           |  CAST(sum(fp % 1099511627776) % 1099511627776 AS BIGINT) AS sum_fp
           |FROM f GROUP BY o_orderstatus
           |UNION ALL
           |SELECT 'GLOBAL', count(*), bit_xor(fp),
           |  CAST(sum(fp % 1099511627776) % 1099511627776 AS BIGINT)
           |FROM f
           |ORDER BY scope""".stripMargin
      }),

    // Q66 [extension: exact distributed correlation] Pearson corr/covariance
    // per group WITHOUT float drift: built-in corr()/covar_samp() stream
    // IEEE partial moments whose totals depend on partition merge order —
    // the same number can hash-differ between two runs of the SAME engine,
    // let alone across engines. The Canon fix: the five sufficient
    // statistics (n, Σx, Σy, Σxy, Σx², Σy²) are INTEGER sums over exact
    // cents (associative ⇒ identical on any cluster size / partition
    // layout), promoted to DECIMAL(38,0) where products overflow int64
    // (Σy² here). The final assembly is a fixed scalar expression over
    // exact operands — decimal→double rounding, sqrt, one division — each
    // correctly-rounded IEEE ops on identical inputs, so the result is
    // bit-identical cross-engine and rounds safely. The per-group stats
    // themselves travel as the combinable partials at 100 TB (one map-side
    // pass, shuffle = #groups).
    "q66_exact_corr" -> QueryDef(
      build = (s, d) => {
        val dec = "decimal(38,0)"
        val stats = Tables.lineitem(s, d)
          .select($("l_returnflag"),
            cents($("l_quantity")).as("x"), cents($("l_extendedprice")).as("y"))
          .groupBy($("l_returnflag"))
          .agg(count(lit(1)).cast(dec).as("n"),
            sum($("x")).cast(dec).as("sx"),
            sum($("y")).cast(dec).as("sy"),
            sum(($("x") * $("y")).cast(dec)).as("sxy"),
            sum(($("x") * $("x")).cast(dec)).as("sxx"),
            sum(($("y") * $("y")).cast(dec)).as("syy"))
        val covN = ($("n") * $("sxy") - $("sx") * $("sy")).cast("double")
        val vx = ($("n") * $("sxx") - $("sx") * $("sx")).cast("double")
        val vy = ($("n") * $("syy") - $("sy") * $("sy")).cast("double")
        stats.select($("l_returnflag"), $("n").cast("long").as("n_rows"),
            (round(covN / (sqrt(vx) * sqrt(vy)), 6) + lit(0.0)).as("corr_qty_price"),
            (round(covN / ($("n") * ($("n") - lit(1))).cast("double"), 2) + lit(0.0))
              .as("covar_cents2"))
          .orderBy($("l_returnflag"))
      },
      oracle = Some {
        val x = centsSql("l_quantity"); val y = centsSql("l_extendedprice")
        s"""WITH s AS (
           |  SELECT l_returnflag,
           |    CAST(count(*) AS DECIMAL(38,0)) AS n,
           |    CAST(sum($x) AS DECIMAL(38,0)) AS sx,
           |    CAST(sum($y) AS DECIMAL(38,0)) AS sy,
           |    CAST(sum(CAST($x * $y AS HUGEINT)) AS DECIMAL(38,0)) AS sxy,
           |    CAST(sum(CAST($x * $x AS HUGEINT)) AS DECIMAL(38,0)) AS sxx,
           |    CAST(sum(CAST($y * $y AS HUGEINT)) AS DECIMAL(38,0)) AS syy
           |  FROM lineitem GROUP BY l_returnflag)
           |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           |  round(CAST(n*sxy - sx*sy AS DOUBLE)
           |    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
           |       * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6) + 0.0 AS corr_qty_price,
           |  round(CAST(n*sxy - sx*sy AS DOUBLE)
           |    / CAST(n*(n-1) AS DOUBLE), 2) + 0.0 AS covar_cents2
           |FROM s ORDER BY l_returnflag""".stripMargin
      }),

    // Q67 [extension: statistical outlier flagging] per-group kσ rule with
    // ZERO floating point: a value is an outlier iff (x−μ)² > k²σ², which
    // multiplied through by n² (and by k's denominator²) becomes pure
    // integer arithmetic over exact cents — 4·(n·x − Σx)² > 9·(n·Σx² −
    // (Σx)²) for k = 3/2 (DECIMAL(38,0) headroom; k=1.5 because the
    // synthetic uniform totalprice has no mass beyond √3σ — a production
    // heavy-tail corpus uses 3). The flag can NEVER disagree between
    // engines/partitionings on a boundary value, the failure mode of float
    // z-scores. Two passes at scale: the combinable (n, Σx, Σx²) agg
    // (shuffle = #groups), broadcast back, flag per row map-side. The gate
    // emits every flagged row.
    "q67_outliers" -> QueryDef(
      build = (s, d) => {
        val dec = "decimal(38,0)"
        val stats = Tables.orders(s, d)
          .select($("o_orderpriority"), cents($("o_totalprice")).as("x"))
          .groupBy($("o_orderpriority"))
          .agg(count(lit(1)).cast(dec).as("n"),
            sum($("x")).cast(dec).as("sx"),
            sum(($("x") * $("x")).cast(dec)).as("sxx"))
        // (x−μ)² > (3/2)²σ² with μ=Σx/n, σ²=(nΣx²−(Σx)²)/n², multiplied
        // through by 4n²: 4·(n·x − Σx)² > 9·(n·Σx² − (Σx)²) — exact at
        // DECIMAL(38,0) magnitudes (4·dev² ≲ 1e29 at sf1).
        val dev = $("n") * $("x").cast(dec) - $("sx")
        val varn2 = $("n") * $("sxx") - $("sx") * $("sx")
        Tables.orders(s, d)
          .select($("o_orderkey"), $("o_orderpriority"), cents($("o_totalprice")).as("x"))
          .join(broadcast(stats), "o_orderpriority")
          .filter(lit(4).cast(dec) * dev * dev > lit(9).cast(dec) * varn2)
          .select($("o_orderkey"), $("o_orderpriority"), $("x").as("cents"))
          .orderBy($("o_orderkey"))
      },
      oracle = Some {
        val x = centsSql("o_totalprice")
        s"""WITH s AS (
           |  SELECT o_orderpriority,
           |    CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum($x) AS HUGEINT) AS sx,
           |    sum(CAST($x AS HUGEINT) * CAST($x AS HUGEINT)) AS sxx
           |  FROM orders GROUP BY o_orderpriority)
           |SELECT o_orderkey, o.o_orderpriority, $x AS cents
           |FROM orders o JOIN s ON o.o_orderpriority = s.o_orderpriority
           |WHERE 4 * (n * $x - sx) * (n * $x - sx) > 9 * (n * sxx - sx * sx)
           |ORDER BY o_orderkey""".stripMargin
      }),

    // Q71 [extension: aggregate pushdown / footer-stats scan] MAX/MIN/COUNT
    // per table answered from parquet FOOTER STATISTICS, not rows: the v2
    // read path pushes the whole aggregate into the scan
    // (`PushedAggregation` — row groups are never decoded). At 100 TB this
    // is the difference between an O(bytes) table scan and an O(#files)
    // metadata read — the primitive behind `ANALYZE`, freshness checks and
    // key-space guards (q70's offset guard is exactly this query). The gate
    // is self-checking: it ASSERTS the pushed plan shape per table, then
    // the driver value-checks the stats against DuckDB's row-path answers —
    // proving footer stats and row reality agree. Conf scoping note: the
    // pushdown confs are set only around the (eagerly collected, one row
    // per table) stat probes and restored before return, so no other gate
    // sees the v2 source list. The collected rows are bounded model state
    // (4 tables × 4 values), same contract as the k-means centroids.
    "q71_footer_stats" -> QueryDef(
      build = (s, d) => {
        import s.implicits._
        val keys = Seq("customer" -> "c_custkey", "lineitem" -> "l_orderkey",
          "orders" -> "o_orderkey", "part" -> "p_partkey")
        val confs = Seq("spark.sql.sources.useV1SourceList" -> "",
          "spark.sql.parquet.aggregatePushdown" -> "true")
        val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        val rows = try keys.map { case (t, k) =>
          val df = s.read.parquet(s"$d/$t.parquet")
            .agg(max(col(k)).cast("long").as("mx"),
              min(col(k)).cast("long").as("mn"), count(lit(1)).as("n"))
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          require(plan.contains("PushedAggregation"),
            s"q71: $t aggregate not pushed to footer stats:\n$plan")
          val r = df.head()
          (t, r.getLong(0), r.getLong(1), r.getLong(2))
        } finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
        rows.toDF("tbl", "max_key", "min_key", "n_rows").orderBy($("tbl"))
      },
      oracle = Some(
        Seq("customer" -> "c_custkey", "lineitem" -> "l_orderkey",
          "orders" -> "o_orderkey", "part" -> "p_partkey").map { case (t, k) =>
          s"""SELECT '$t' AS tbl, CAST(max($k) AS BIGINT) AS max_key,
             |  CAST(min($k) AS BIGINT) AS min_key,
             |  CAST(count(*) AS BIGINT) AS n_rows FROM $t""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY tbl"))),

    // Q82 [extension: exact distributed quantiles] per-segment exact
    // p25/median/p75 over account-balance cents — the EXACT counterpart of
    // q15b's approx percentiles. Hash-safe across engines because every
    // interpolation weight a quartile can produce is DYADIC ((n−1)·k/4 has
    // fractional part ∈ {0, ¼, ½, ¾}), so (1−g)·a + g·b over integer cents
    // is exact in IEEE double — no ulp drift for ANY n, unlike arbitrary
    // percentiles (p90's g can be non-dyadic, where two engines' fma
    // orderings could differ in the last bit). Spark's percentile() is the
    // sort-based exact aggregate (one shuffle, partial+final).
    "q82_exact_quartiles" -> QueryDef(
      build = (s, d) => {
        val c = graft.Canon.cents($("c_acctbal"))
        Tables.customer(s, d)
          .groupBy($("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n"),
            percentile(c, lit(0.25)).as("p25"),
            percentile(c, lit(0.5)).as("median"),
            percentile(c, lit(0.75)).as("p75"))
          .orderBy($("segment"))
      },
      oracle = Some {
        val cents = graft.Canon.centsSql("c_acctbal")
        s"""SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n,
           |  quantile_cont($cents, 0.25) AS p25,
           |  quantile_cont($cents, 0.5) AS median,
           |  quantile_cont($cents, 0.75) AS p75
           |FROM customer GROUP BY 1 ORDER BY segment""".stripMargin
      }),

    // Q81 [extension: sketch set operations] intersection cardinality from
    // MERGEABLE sketches via inclusion–exclusion: |A∩B| ≈ est(A) + est(B)
    // − est(A ∪ B), where the union is a SKETCH merge (hll_union_agg) —
    // the cross-dataset overlap question ("how many customers appear in
    // both segments?") answered without co-shuffling either side, the way
    // warehouse overlap dashboards actually run. Exact counts come from
    // dense key ranges with a known 500-key overlap, so the gate row is
    // the q15-style self-check: `ok` asserts the estimate lands within
    // a union-proportional band of truth (HLL ~1.6% per term;
    // inclusion–exclusion amplifies — the bound is deliberately loose).
    // Estimates themselves are engine-specific and never hashed. Exact
    // counts are DERIVED from the data (ADVICE r9) — the previous
    // hard-coded |A|=|B|=1000/overlap-500 constants only held for key
    // spaces ≥ 1500 keys and diverged at the sf0.001 smoke tier.
    "q81_sketch_intersect" -> QueryDef(
      build = (s, d) => {
        val cust = Tables.customer(s, d).select($("c_custkey").as("k"))
        val a = cust.filter($("k") >= 0 && $("k") < 1000)
        val b = cust.filter($("k") >= 500 && $("k") < 1500)
        val sa = a.agg(hll_sketch_agg($("k")).as("sk"), count(lit(1)).as("n"))
        val sb = b.agg(hll_sketch_agg($("k")).as("sk"), count(lit(1)).as("n"))
        val merged = sa.select($("sk"), $("n").as("n_a"))
          .unionByName(sb.select($("sk"), $("n").as("n_a")))
          .agg(hll_sketch_estimate(hll_union_agg($("sk"))).as("est_u"))
        // exact truths from the same scan (keys are unique, so the union
        // is one range count and the intersection the overlap range)
        val exact = cust.agg(
          sum(when($("k") >= 0 && $("k") < 1500, 1L).otherwise(0L))
            .cast("long").as("n_union_exact"),
          sum(when($("k") >= 500 && $("k") < 1000, 1L).otherwise(0L))
            .cast("long").as("n_inter_exact"))
        sa.select(hll_sketch_estimate($("sk")).as("est_a"))
          .crossJoin(sb.select(hll_sketch_estimate($("sk")).as("est_b")))
          .crossJoin(merged)
          .crossJoin(exact)
          .select($("n_union_exact"), $("n_inter_exact"),
            (abs($("est_a") + $("est_b") - $("est_u") - $("n_inter_exact"))
              <= lit(0.05) * $("n_union_exact") + lit(2.0)).as("ok"))
      },
      oracle = Some(
        """SELECT
          |  CAST(count(CASE WHEN c_custkey >= 0 AND c_custkey < 1500
          |             THEN 1 END) AS BIGINT) AS n_union_exact,
          |  CAST(count(CASE WHEN c_custkey >= 500 AND c_custkey < 1000
          |             THEN 1 END) AS BIGINT) AS n_inter_exact,
          |  TRUE AS ok
          |FROM customer""".stripMargin)),

    // Q76 [extension: corpus entropy / KL divergence] per-source token
    // distribution entropy and KL(source ‖ corpus) — the domain-shift /
    // mixture-diagnostics numbers a training-data pipeline reads before
    // reweighting (DoReMi-style domain balancing starts from exactly these).
    // All arithmetic is the q56 micro-nat trick: ln is taken only of
    // INTEGER counts and immediately rounded to 10^-6 nats, so every sum is
    // an exact integer (order-independent ⇒ cluster-size independent) and
    // the oracle hash-matches bit-for-bit:
    //   H_s  = lnµ(N_s) − (Σ_w n·lnµ(n)) div N_s
    //   KL_s = (lnµ(M) − lnµ(N_s)) − (Σ_w n·(lnµ(m_w) − lnµ(n))) div N_s
    // Both Σ terms are non-negative (n ≤ m_w), so `div`/`//` agree across
    // engines (floor vs truncate differs only on negatives).
    //
    // Scale shape: one (source, token) count shuffle, one token-level
    // partial-sum shuffle for corpus counts, one combinable per-source
    // fold; the only broadcast is the 1-row corpus total. No driver data.
    "q76_corpus_entropy" -> QueryDef(
      build = (s, d) => {
        val lnu = (c: org.apache.spark.sql.Column) =>
          round(log(c) * 1000000).cast("long")
        val tw = Tables.documents(s, d)
          .select($("source"), explode(split($("text"), " ")).as("w"))
          .groupBy($("source"), $("w")).agg(count(lit(1)).as("n"))
        val cw = tw.groupBy($("w")).agg(sum($("n")).as("m"))
        val perSrc = tw.join(cw, "w")
          .groupBy($("source"))
          .agg(sum($("n")).as("n_tot"),
            count(lit(1)).as("n_dist"),
            sum($("n") * lnu($("n"))).as("s_ent"),
            sum($("n") * (lnu($("m")) - lnu($("n")))).as("s_kl"))
        val consts = tw.agg(lnu(sum($("n"))).as("ln_mm"))
        perSrc.crossJoin(broadcast(consts))
          .select($("source"), $("n_tot").as("n_tokens"),
            $("n_dist").cast("long").as("n_distinct"),
            (lnu($("n_tot")) - expr("s_ent div n_tot")).as("entropy_micro"),
            (($("ln_mm") - lnu($("n_tot"))) - expr("s_kl div n_tot")).as("kl_micro"))
          .orderBy($("source"))
      },
      oracle = Some {
        def lnu(e: String) = s"CAST(round(ln($e) * 1000000) AS BIGINT)"
        s"""WITH tw AS (
           |  SELECT source, w, count(*) AS n
           |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
           |        FROM documents)
           |  GROUP BY source, w),
           |cw AS (SELECT w, CAST(sum(n) AS BIGINT) AS m FROM tw GROUP BY w),
           |per_src AS (
           |  SELECT t.source,
           |    CAST(sum(t.n) AS BIGINT) AS n_tot,
           |    CAST(count(*) AS BIGINT) AS n_dist,
           |    CAST(sum(t.n * ${lnu("t.n")}) AS BIGINT) AS s_ent,
           |    CAST(sum(t.n * (${lnu("c.m")} - ${lnu("t.n")})) AS BIGINT) AS s_kl
           |  FROM tw t JOIN cw c USING (w) GROUP BY t.source),
           |tot AS (SELECT ${lnu("sum(n)")} AS ln_mm FROM tw)
           |SELECT source, n_tot AS n_tokens, n_dist AS n_distinct,
           |  ${lnu("n_tot")} - s_ent // n_tot AS entropy_micro,
           |  (ln_mm - ${lnu("n_tot")}) - s_kl // n_tot AS kl_micro
           |FROM per_src, tot ORDER BY source""".stripMargin
      }))
}
