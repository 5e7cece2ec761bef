package graft.vector

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative higher-order-function cosine
  * pattern `aggregate(zip_with(a,b,*)) / (sqrt(aggregate(zip_with(a,a,*)))
  * * sqrt(aggregate(zip_with(b,b,*))))` into the fused codegen
  * [[CosineSim]] expression.
  *
  * Why: Catalyst interprets lambda functions per element (no codegen, an
  * intermediate array per zip_with), which makes the natural declarative
  * formulation ~10x slower in a hot scan. Users keep writing the
  * declarative form (`VectorOps.cosineHof`); this rule swaps in the
  * compiled kernel. The rewrite is bit-exact: CosineSim accumulates
  * dot/norms left-to-right exactly like the interpreted fold, returns
  * null for ragged input exactly like zip_with's null padding, and IEEE
  * multiplication/addition are commutative, so either lambda orientation
  * produces the same bits (VectorOpsSpec asserts equality; FusionSpec
  * asserts the plan rewrite).
  *
  * Registered via [[GraftExtensions]] (`injectOptimizerRule`); the rule
  * only fires on array<double> children with a literal 0.0 zero and
  * identity finish, so any other aggregate shape is left untouched.
  */
object CosineFusion extends Rule[LogicalPlan] {

  /** zip_with(x, y, (p,q) => p*q) folded with + from 0.0 — the HOF dot. */
  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
                Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(sx: NamedLambdaVariable, sy: NamedLambdaVariable, _),
              Seq(bx: NamedLambdaVariable, by: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fa: NamedLambdaVariable), _))
          if zero == 0.0 &&
            Set(mx.exprId, my.exprId) == Set(ax.exprId, ay.exprId) &&
            Set(sx.exprId, sy.exprId) == Set(bx.exprId, by.exprId) &&
            fin.exprId == fa.exprId &&
            isDoubleArray(a) && isDoubleArray(b) =>
        Some((a, b))
      case _ => None
    }
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object HofNorm {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(HofDot(a, b)) if a.semanticEquals(b) => Some(a)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(HofDot(a, b), Multiply(HofNorm(na), HofNorm(nb), _), _)
          if (a.semanticEquals(na) && b.semanticEquals(nb)) ||
            (a.semanticEquals(nb) && b.semanticEquals(na)) =>
        CosineSim(a, b)
    }
}
