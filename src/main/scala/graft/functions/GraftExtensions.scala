package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the declarative higher-order-function dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * over `array<bigint>` columns into the native codegen'd [[LongArrayDot]].
  * Users keep writing the idiomatic HOF form; the optimizer swaps in the
  * tight-loop expression (~9× on pair-similarity joins, see LongArrayDot).
  *
  * The match is deliberately strict — multiply of exactly the zip_with
  * lambda variables, fold of exactly (acc + v) from zero 0L, identity
  * finish — anything else is left untouched.
  */
object NativeDotRewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def isVarPair(l: Expression, r: Expression, vars: Seq[NamedLambdaVariable]): Boolean =
    (l, r) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        vars.map(_.exprId).toSet == Set(a.exprId, b.exprId)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(left, right, LambdaFunction(Multiply(ml, mr, _), zipVars, _)),
        Literal(0L, LongType),
        LambdaFunction(Add(al, ar, _), mergeVars, _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
      if isLongArray(left) && isLongArray(right) &&
        isVarPair(ml, mr, zipVars.collect { case v: NamedLambdaVariable => v }) &&
        isVarPair(al, ar, mergeVars.collect { case v: NamedLambdaVariable => v }) &&
        fin.exprId == finArg.exprId =>
      LongArrayDot(left, right)
  }
}

/** Session-extension entry point: `--conf spark.sql.extensions=
  * graft.functions.GraftExtensions` (or `.withExtensions`) registers the
  * native functions for SQL text and injects the rewrite rule, so both the
  * Column API and `spark.sql` users get the fast path automatically. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot64"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "graft_dot64"),
      (exprs: Seq[Expression]) => LongArrayDot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_matdot"),
      new ExpressionInfo(classOf[LongMatrixDot].getName, "graft_matdot"),
      (exprs: Seq[Expression]) => LongMatrixDot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_pqenc"),
      new ExpressionInfo(classOf[LongPqEncode].getName, "graft_pqenc"),
      (exprs: Seq[Expression]) => LongPqEncode(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_pqtab"),
      new ExpressionInfo(classOf[LongPqTables].getName, "graft_pqtab"),
      (exprs: Seq[Expression]) => LongPqTables(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_pqadc"),
      new ExpressionInfo(classOf[LongPqAdc].getName, "graft_pqadc"),
      (exprs: Seq[Expression]) => LongPqAdc(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minspan"),
      new ExpressionInfo(classOf[MinWindowSpan].getName, "graft_minspan"),
      (exprs: Seq[Expression]) => MinWindowSpan(exprs.head, exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_phrasefreq"),
      new ExpressionInfo(classOf[PhraseFreq].getName, "graft_phrasefreq"),
      (exprs: Seq[Expression]) => PhraseFreq(exprs.head, exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KMinValues].getName, "graft_kmv"),
      (exprs: Seq[Expression]) => {
        val k = exprs(1) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case other if other.foldable => other.eval().toString.toInt
          case other =>
            throw new IllegalArgumentException(s"graft_kmv k must be a literal: $other")
        }
        KMinValues(exprs.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKRows].getName, "graft_topk"),
      (exprs: Seq[Expression]) => {
        val k = exprs(2) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case other if other.foldable => other.eval().toString.toInt
          case other =>
            throw new IllegalArgumentException(s"graft_topk k must be a literal: $other")
        }
        TopKRows(exprs.head, exprs(1), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bks"),
      new ExpressionInfo(classOf[BottomKSample].getName, "graft_bks"),
      (exprs: Seq[Expression]) => {
        val k = exprs(2) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case other if other.foldable => other.eval().toString.toInt
          case other =>
            throw new IllegalArgumentException(s"graft_bks k must be a literal: $other")
        }
        BottomKSample(exprs.head, exprs(1), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_mg"),
      new ExpressionInfo(classOf[MisraGries].getName, "graft_mg"),
      (exprs: Seq[Expression]) => {
        val cap = exprs(1) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case other if other.foldable => other.eval().toString.toInt
          case other =>
            throw new IllegalArgumentException(s"graft_mg capacity must be a literal: $other")
        }
        MisraGries(exprs.head, cap)
      }))
    ext.injectOptimizerRule(_ => NativeDotRewrite)
    // manifest-driven file skipping for every scan of an indexed dir —
    // including SQL text over temp views (see graft.plans.ManifestPruneRule)
    ext.injectOptimizerRule(session => graft.plans.ManifestPruneRule(session))
  }
}
