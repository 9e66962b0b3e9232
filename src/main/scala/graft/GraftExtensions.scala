package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

import graft.plans.{CharNgramHashes, CmsEstimate, FloatDotProduct, InterleaveBits, MinHashSigArr, NfcNormalize, PolyHash, PqEncode, PqLuts, ShingleHashes, ShinglePolyHashes, StripAccents}

/** Engine extension wiring: native expressions registered into the session
  * FunctionRegistry, installable either via
  * `spark.sql.extensions=graft.GraftExtensions` or programmatically with
  * [[GraftExtensions.install]] on an existing session (what Verify/Bench
  * do — they receive an already-built session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    GraftExtensions.tableFunctions.foreach(ext.injectTableFunction)
    ext.injectOptimizerRule(_ => graft.plans.TopOnePerKeyRewrite)
    ext.injectOptimizerRule(_ => graft.sources.MvRewrite)
    ext.injectOptimizerRule(_ => graft.sources.DvReadRewrite)
    ext.injectPlannerStrategy(_ => graft.sources.GraftDmlStrategy)
  }
}

object GraftExtensions {
  private type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** Constant-argument extraction for builder parameters (shingle width,
    * signature length, hash coefficients). A clear error at plan time beats
    * a ClassCastException/NPE from `eval()` on a non-foldable or non-numeric
    * arg; any integer literal width is accepted (`lit(64)` and `lit(64L)`
    * both work).
    */
  private def constNum(fn: String, pos: Int, e: Expression): Number = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a constant integer, got non-foldable ${e.sql}")
    e.eval() match {
      case n: Number => n
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be a constant integer, got $other")
    }
  }

  /** Constant float-array extraction (PQ codebooks): the literal is
    * evaluated once at plan time into the expression's reference object.
    */
  private def constFloatArray(fn: String, pos: Int, e: Expression): Array[Float] = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a constant float array, got non-foldable ${e.sql}")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toFloatArray()
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be a constant float array, got $other")
    }
  }

  /** Constant binary extraction (serialized sketches): evaluated once at
    * plan time into the expression's reference object.
    */
  private def constBinary(fn: String, pos: Int, e: Expression): Array[Byte] = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a constant binary, got non-foldable ${e.sql}")
    e.eval() match {
      case b: Array[Byte] => b
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be a constant binary, got $other")
    }
  }

  private val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (children: Seq[Expression]) => FloatDotProduct(children.head, children(1))),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => ShingleHashes(children.head,
        constNum("shingle_hashes", 1, children(1)).intValue())),
    (FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => PolyHash(children.head,
        constNum("poly_hash", 1, children(1)).longValue(),
        constNum("poly_hash", 2, children(2)).longValue())),
    (FunctionIdentifier("shingle_poly_hashes"),
      new ExpressionInfo(classOf[ShinglePolyHashes].getName, "shingle_poly_hashes"),
      (children: Seq[Expression]) => ShinglePolyHashes(children.head,
        constNum("shingle_poly_hashes", 1, children(1)).intValue())),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigArr].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSigArr(children.head,
        constNum("minhash_sig", 1, children(1)).intValue())),
    (FunctionIdentifier("char_ngram_hashes"),
      new ExpressionInfo(classOf[CharNgramHashes].getName, "char_ngram_hashes"),
      (children: Seq[Expression]) => CharNgramHashes(children.head,
        constNum("char_ngram_hashes", 1, children(1)).intValue())),
    (FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (children: Seq[Expression]) => PqEncode(children.head,
        constFloatArray("pq_encode", 1, children(1)),
        constNum("pq_encode", 2, children(2)).intValue())),
    (FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
      (children: Seq[Expression]) => InterleaveBits(children.head, children(1))),
    (FunctionIdentifier("pq_luts"),
      new ExpressionInfo(classOf[PqLuts].getName, "pq_luts"),
      (children: Seq[Expression]) => PqLuts(children.head,
        constFloatArray("pq_luts", 1, children(1)),
        constNum("pq_luts", 2, children(2)).intValue())),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children.head)),
    (FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (children: Seq[Expression]) => StripAccents(children.head)),
    // Spark's own runtime-filter probe (the expression InjectRuntimeFilter
    // plants on the application side of a bloom-pruned join), exposed as a
    // registered function so an explicitly staged bloom pre-filter (build a
    // bounded sketch of corpus A, probe every row of corpus B before the
    // exact confirm join) can stay fully codegen'd — no UDF, no closure
    // serialization. args: (serialized bloom BINARY literal, xxhash64 BIGINT).
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => BloomFilterMightContain(children.head, children(1))),
    (FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (children: Seq[Expression]) => CmsEstimate(children.head,
        constBinary("cms_estimate", 1, children(1)))))

  private type TableFunctionDescription =
    (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)

  private def constString(fn: String, pos: Int, e: Expression): String = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a constant string, got non-foldable ${e.sql}")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be a constant string, got $other")
    }
  }

  /** `'t'` / `'ns.t'` / `'cat.ns.t'` → SnapshotStore root. A name with a
    * `/` is already a filesystem root; otherwise the leading part names a
    * registered catalog (its `.warehouse` conf supplies the base dir; the
    * bare-name default is catalog `graft` — the conventional name the
    * gates and specs register).
    */
  private[graft] def resolveRoot(name: String): String = {
    if (name.contains("/")) return name
    val conf = org.apache.spark.sql.internal.SQLConf.get
    def warehouseOf(cat: String): String =
      conf.getConfString(s"spark.sql.catalog.$cat.warehouse", "")
    val parts = name.split('.').toSeq
    val viaCatalog = warehouseOf(parts.head)
    if (parts.length > 1 && viaCatalog.nonEmpty)
      (viaCatalog +: parts.tail).mkString("/")
    else {
      val w = warehouseOf("graft")
      require(w.nonEmpty,
        s"cannot resolve table '$name': set spark.sql.catalog.graft.warehouse " +
          "or pass a filesystem root")
      (w +: parts).mkString("/")
    }
  }

  /** SQL table-valued surface of the warehouse's log-backed reads — what a
    * Delta user types as `table_changes('t', 2, 5)` / DESCRIBE HISTORY.
    * Registered in the session's TableFunctionRegistry, so they compose
    * with any SQL (joins, filters, CTEs); the plan each call returns is the
    * same one-multi-path-vectorized-scan the Scala API builds.
    */
  private val tableFunctions: Seq[TableFunctionDescription] = Seq(
    (FunctionIdentifier("table_changes"),
      new ExpressionInfo(classOf[graft.sources.SnapshotStore.type].getName,
        "table_changes"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "table_changes(table, from_version | from_ts, to_version | to_ts)")
        val spark = SparkSession.active
        val root = resolveRoot(constString("table_changes", 0, children.head))
        // bounds are versions (numbers) OR timestamps (strings — the
        // Delta table_changes overload), resolved against commit mtimes,
        // the same clock TIMESTAMP AS OF uses: FROM = earliest commit at
        // or after the timestamp (Delta's startingTimestamp rule), TO =
        // latest commit at or before it (a future TO naturally clamps to
        // the head; a TO before the first commit is a loud error)
        def bound(pos: Int, isFrom: Boolean): Long = {
          val e = children(pos)
          if (!e.foldable) throw new IllegalArgumentException(
            s"table_changes: argument ${pos + 1} must be a constant, " +
              s"got non-foldable ${e.sql}")
          val zone = java.time.ZoneId.of(
            spark.sessionState.conf.sessionLocalTimeZone)
          def fromMicros(micros: Long): Long =
            if (isFrom) graft.sources.SnapshotStore.versionSince(root, micros)
            else graft.sources.SnapshotStore.versionAsOf(root, micros)
          // dispatch on the expression's DATA TYPE, not the runtime class
          // of eval(): a typed TIMESTAMP'…' literal evaluates to a Long of
          // epoch-micros and would otherwise silently read as a VERSION
          import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
          (e.dataType, e.eval()) match {
            case (TimestampType, micros: java.lang.Long) =>
              fromMicros(micros)
            case (TimestampNTZType, micros: java.lang.Long) =>
              // NTZ micros encode the LOCAL wall time; anchor it in the
              // session zone to get the epoch instant commit mtimes use
              fromMicros(org.apache.spark.sql.catalyst.util.DateTimeUtils
                .instantToMicros(org.apache.spark.sql.catalyst.util
                  .DateTimeUtils.microsToLocalDateTime(micros)
                  .atZone(zone).toInstant))
            case (DateType, days: java.lang.Integer) =>
              fromMicros(org.apache.spark.sql.catalyst.util.DateTimeUtils
                .daysToMicros(days, zone))
            case (_, n: Number) => n.longValue()
            case (_, s: org.apache.spark.unsafe.types.UTF8String) =>
              fromMicros(org.apache.spark.sql.catalyst.util.DateTimeUtils
                .stringToTimestampAnsi(s, zone))
            case (_, other) => throw new IllegalArgumentException(
              s"table_changes: argument ${pos + 1} must be a version " +
                s"number or a timestamp, got $other")
          }
        }
        val from = bound(1, isFrom = true)
        val to = bound(2, isFrom = false)
        graft.sources.SnapshotStore.changes(spark, root, from, to)
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("table_history"),
      new ExpressionInfo(classOf[graft.sources.SnapshotStore.type].getName,
        "table_history"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "table_history(table)")
        val spark = SparkSession.active
        val root = resolveRoot(constString("table_history", 0, children.head))
        graft.sources.SnapshotStore.history(spark, root).queryExecution.analyzed
      }))

  /** Idempotent per-session registration. The optimizer rule goes through
    * `experimental.extraOptimizations` (the post-build equivalent of
    * `injectOptimizerRule` — an already-built session's rule batches are
    * frozen); it lands in the final "User Provided Optimizers" batch, after
    * the main batches, which is exactly where [[plans.TopOnePerKeyRewrite]]
    * wants to run.
    */
  def install(spark: SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
    val treg = spark.sessionState.tableFunctionRegistry
    tableFunctions.foreach { case (id, info, builder) =>
      if (!treg.functionExists(id)) treg.registerFunction(id, info, builder)
    }
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(graft.plans.TopOnePerKeyRewrite))
      spark.experimental.extraOptimizations = extra :+ graft.plans.TopOnePerKeyRewrite
    // MvRewrite BEFORE DvReadRewrite: when the view serves the aggregate
    // the relation disappears; when it refuses (DV-bearing source, stale
    // view) the DV substitution still runs
    val extraMv = spark.experimental.extraOptimizations
    if (!extraMv.contains(graft.sources.MvRewrite))
      spark.experimental.extraOptimizations = extraMv :+ graft.sources.MvRewrite
    val extra2 = spark.experimental.extraOptimizations
    if (!extra2.contains(graft.sources.DvReadRewrite))
      spark.experimental.extraOptimizations = extra2 :+ graft.sources.DvReadRewrite
    val strats = spark.experimental.extraStrategies
    if (!strats.contains(graft.sources.GraftDmlStrategy))
      spark.experimental.extraStrategies = strats :+ graft.sources.GraftDmlStrategy
  }
}
