package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.{FloatDotProduct, MinHashSigArr, PolyHash, ShingleHashes}

/** Engine extension wiring: native expressions registered into the session
  * FunctionRegistry, installable either via
  * `spark.sql.extensions=graft.GraftExtensions` or programmatically with
  * [[GraftExtensions.install]] on an existing session (what Verify/Bench
  * do — they receive an already-built session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (children: Seq[Expression]) => FloatDotProduct(children.head, children(1))),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => ShingleHashes(children.head,
        children(1).eval().asInstanceOf[Int])),
    (FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => PolyHash(children.head,
        children(1).eval().asInstanceOf[Number].longValue(),
        children(2).eval().asInstanceOf[Number].longValue())),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigArr].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSigArr(children.head,
        children(1).eval().asInstanceOf[Int])))

  /** Idempotent per-session registration. */
  def install(spark: SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}
