package graft.extensions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.functions.{DotProduct, JaccardSim, JaccardSortedLong, MinHashSig, SimHash64}

/** SQL-surface integration for the engine's native expressions.
  *
  * Two registration paths:
  *  - [[GraftExtensions]] for `SparkSession.builder().withExtensions(...)`
  *    (cluster deployments / spark.sql.extensions config);
  *  - [[GraftRuntime.register]] for an already-running session (injects the
  *    same functions + optimizer rule at runtime).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => JaccardRewriteRule)
  }
}

object GraftRuntime {
  /** Runtime injection into an existing session. */
  def register(spark: SparkSession): Unit = {
    GraftFunctions.all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    // typed Aggregator surfaced to SQL (udaf registration is session-scoped,
    // so it lives here rather than on the extensions-injection path)
    spark.udf.register("centroid", org.apache.spark.sql.functions.udaf(
      graft.functions.CentroidAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()))
    if (!spark.experimental.extraOptimizations.contains(JaccardRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ JaccardRewriteRule
  }
}

object GraftFunctions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage,
      /* arguments */ "", /* examples */ "", /* note */ "",
      /* group */ "misc_funcs", /* since */ "1.0.0", /* deprecated */ "",
      /* source */ "built-in")

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_product",
      info("dot_product", "dot_product(a, b) - left-fold dot product of two numeric arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("jaccard_sim",
      info("jaccard_sim", "jaccard_sim(a, b) - Jaccard similarity of two string arrays"),
      (es: Seq[Expression]) => JaccardSim(es(0), es(1))),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(a, k) - k-permutation MinHash signature"),
      (es: Seq[Expression]) => es(1) match {
        case Literal(k: Int, IntegerType) => MinHashSig(es(0), k)
        case other => throw new IllegalArgumentException(
          s"minhash_sig k must be an integer literal, got $other")
      }),
    ("simhash64",
      info("simhash64", "simhash64(a) - 64-bit SimHash of a string array"),
      (es: Seq[Expression]) => SimHash64(es(0))),
    ("jaccard_sorted",
      info("jaccard_sorted", "jaccard_sorted(a, b) - merge-walk Jaccard of two sorted distinct bigint arrays"),
      (es: Seq[Expression]) => JaccardSortedLong(es(0), es(1))))
}

/** Rewrites the built-in Jaccard idiom
  * `size(array_intersect(a,b)) / size(array_union(a,b))` (two passes, two
  * per-row hash-set builds) into the single-pass [[JaccardSim]] — user code
  * written with stock functions gets the native expression for free.
  */
object JaccardRewriteRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(
        Cast(Size(ArrayIntersect(a1, b1), _), DoubleType, _, _),
        Cast(Size(ArrayUnion(a2, b2), _), DoubleType, _, _), _)
        if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
          JaccardSim(a1, b1).checkInputDataTypes().isSuccess =>
      JaccardSim(a1, b1)
  }
}
