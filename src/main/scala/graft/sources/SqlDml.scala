package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

/** SQL DML statements (`UPDATE` / `DELETE FROM` / `MERGE INTO`) compiled
  * onto [[SnapshotStore]] transactions — the statement surface of the
  * reference's write core (`Server/main.go:279-282` is literally
  * `UPDATE employee SET salary = ? WHERE id = ?`; `Server/main.go:112-120`
  * is insert-on-miss, i.e. MERGE's WHEN NOT MATCHED arm).
  *
  * Spark-first shape: the statement is parsed by SPARK'S OWN parser
  * (`sessionState.sqlParser.parsePlan` → the Catalyst `UpdateTable` /
  * `DeleteFromTable` / `MergeIntoTable` logical nodes — the same grammar
  * every lakehouse runtime compiles), then compiled to a declarative
  * DataFrame transform executed inside `SnapshotStore.transact`, so every
  * statement inherits the store's optimistic-concurrency contract: stage →
  * CAS commit → rebase-and-retry on conflict. No hand-rolled SQL grammar,
  * no row-at-a-time mutation.
  *
  * Execution shape at scale:
  *   - UPDATE/DELETE: one distributed scan+rewrite of the snapshot (a
  *     single `select` with per-column conditionals / one `filter`) — all
  *     codegen'd, no shuffle beyond the write.
  *   - MERGE: ONE full-outer hash join target⋈source on the merge
  *     condition, then per-row action resolution as nested CASE columns —
  *     the same single-join plan Delta/Iceberg MERGE lowers to. Action
  *     conditions and assignment expressions stay Catalyst expressions
  *     (regenerated via `Expression.sql`), so everything is codegen'd.
  *   - The standard "target row matched by multiple source rows" error is
  *     enforced with one aggregation over the matched side only
  *     (`checkCardinality`), the Delta-style guard; disable it when the
  *     source is known key-unique and the extra pass matters.
  *
  * Semantics notes (all per the SQL standard / public Delta docs):
  *   - UPDATE assignment RHS sees PRE-update values (single select).
  *   - DELETE keeps rows whose predicate is NULL (only TRUE deletes).
  *   - MERGE actions apply in statement order; first applicable wins.
  *   - Unassigned columns in INSERT arms become typed NULLs.
  */
object SqlDml {

  /** One statement, one transaction. `tables` maps table names appearing in
    * the statement to SnapshotStore roots; MERGE sources may also name any
    * registered temp view. Returns the committed snapshot.
    */
  def execute(spark: SparkSession, sql: String, tables: Map[String, String],
      maxAttempts: Int = 10, checkCardinality: Boolean = true): SnapshotStore.Snapshot = {
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case u: UpdateTable =>
        val (name, alias) = relationOf(u.table)
        val cond = u.condition.map(e => expr(e.sql)).getOrElse(lit(true))
        val assigns = assignmentMap(u.assignments)
        SnapshotStore.transact(spark, rootOf(tables, name), maxAttempts) { base =>
          val t = base.alias(alias)
          // single select: every RHS reads the pre-update row
          t.select(base.columns.toIndexedSeq.map { c =>
            assigns.get(c.toLowerCase) match {
              case Some(v) => when(coalesce(cond, lit(false)), v)
                .otherwise(col(c)).cast(base.schema(c).dataType).as(c)
              case None => col(c)
            }
          }: _*)
        }

      case del: DeleteFromTable =>
        val (name, alias) = relationOf(del.table)
        val cond = expr(del.condition.sql)
        SnapshotStore.transact(spark, rootOf(tables, name), maxAttempts) { base =>
          // NULL predicate keeps the row: only TRUE deletes
          base.alias(alias).filter(!coalesce(cond, lit(false)))
        }

      case m: MergeIntoTable =>
        require(!m.withSchemaEvolution, "MERGE WITH SCHEMA EVOLUTION not supported")
        val (tName, tAlias) = relationOf(m.targetTable)
        val (sName, sAlias) = relationOf(m.sourceTable)
        val source = tables.get(sName)
          .map(root => SnapshotStore.read(spark, root))
          .getOrElse(spark.table(sName))
        SnapshotStore.transact(spark, rootOf(tables, tName), maxAttempts) { base =>
          mergeFrames(base, tAlias, source, sAlias, m, checkCardinality)
        }

      case other => throw new IllegalArgumentException(
        s"not a DML statement (${other.getClass.getSimpleName}): $sql")
    }
  }

  /** The single-join MERGE plan. Exposed for reuse by programmatic callers
    * (streaming foreachBatch MERGE uses the same frame-level semantics).
    */
  private def mergeFrames(base: DataFrame, tAlias: String, sourceDf: DataFrame,
      sAlias: String, m: MergeIntoTable, checkCardinality: Boolean): DataFrame = {
    val fields: Seq[StructField] = base.schema.fields.toIndexedSeq
    val joinCond = expr(m.mergeCondition.sql)
    val t = base.withColumn("__t", lit(true))
      .withColumn("__tid", monotonically_increasing_id()).alias(tAlias)
    val s = sourceDf.withColumn("__s", lit(true)).alias(sAlias)
    val joined = t.join(s, joinCond, "full_outer")
    val matched = col("__t").isNotNull && col("__s").isNotNull
    val sourceOnly = col("__t").isNull

    if (checkCardinality) {
      // SQL-standard / Delta guard: a target row may be touched by at most
      // one source row. One count over the matched side only.
      val dup = joined.filter(matched).groupBy(col("__tid"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1)
      require(dup.isEmpty,
        "MERGE cardinality violation: a target row matches multiple source rows")
    }

    def tCol(f: StructField): Column = col(s"$tAlias.${f.name}")

    // compile one action list to (keep-this-row, value-of-column-c),
    // falling back to `defaults` when no action's condition applies
    def compile(actions: Seq[MergeAction], defaultKeep: Column,
        defaultVal: StructField => Column): (Column, StructField => Column) = {
      val keep = actions.foldRight(defaultKeep) { (a, rest) =>
        val c = a.condition.map(e => coalesce(expr(e.sql), lit(false))).getOrElse(lit(true))
        a match {
          case _: DeleteAction => when(c, lit(false)).otherwise(rest)
          case _ => when(c, lit(true)).otherwise(rest)
        }
      }
      def valueOf(f: StructField): Column = actions.foldRight(defaultVal(f)) { (a, rest) =>
        val c = a.condition.map(e => coalesce(expr(e.sql), lit(false))).getOrElse(lit(true))
        val v: Option[Column] = a match {
          case ua: UpdateAction => Some(assignmentMap(ua.assignments)
            .getOrElse(f.name.toLowerCase, tCol(f)))
          case _: UpdateStarAction => Some(col(s"$sAlias.${f.name}"))
          case ia: InsertAction => Some(assignmentMap(ia.assignments)
            .getOrElse(f.name.toLowerCase, lit(null)))
          case _: InsertStarAction => Some(col(s"$sAlias.${f.name}"))
          case _: DeleteAction => None // row gone; value never observed
        }
        v.map(vc => when(c, vc).otherwise(rest)).getOrElse(rest)
      }
      (keep, valueOf)
    }

    val (keepM, valM) = compile(m.matchedActions, lit(true), tCol)
    val (keepI, valI) = compile(m.notMatchedActions, lit(false),
      _ => lit(null)) // unmatched source rows only exist if an arm inserts them
    val (keepN, valN) = compile(m.notMatchedBySourceActions, lit(true), tCol)

    val keep = when(matched, keepM).when(sourceOnly, keepI).otherwise(keepN)
    val out = joined.filter(keep).select(fields.map { f =>
      when(matched, valM(f)).when(sourceOnly, valI(f)).otherwise(valN(f))
        .cast(f.dataType).as(f.name)
    }: _*)
    out
  }

  /** (table name, alias) of a DML relation: unwraps `t AS a`. */
  private def relationOf(plan: LogicalPlan): (String, String) = plan match {
    case SubqueryAlias(ident, child) => (relationOf(child)._1, ident.name)
    case r: UnresolvedRelation =>
      val n = r.multipartIdentifier.last
      (n, n)
    case other => throw new IllegalArgumentException(
      s"unsupported DML relation shape: ${other.getClass.getSimpleName}")
  }

  private def rootOf(tables: Map[String, String], name: String): String =
    tables.getOrElse(name, throw new IllegalArgumentException(
      s"table '$name' has no SnapshotStore root (known: ${tables.keys.mkString(", ")})"))

  /** target column (lower-cased) → RHS column; RHS regenerated via
    * Expression.sql so it stays inside Catalyst/codegen.
    */
  private def assignmentMap(assigns: Seq[Assignment]): Map[String, Column] =
    assigns.map { a =>
      val key = a.key match {
        case ua: UnresolvedAttribute => ua.nameParts.last
        case other => other.sql.split('.').last.stripPrefix("`").stripSuffix("`")
      }
      key.toLowerCase -> expr(a.value.sql)
    }.toMap
}
