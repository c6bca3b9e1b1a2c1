package graft.plans

import graft.functions.{CosineSimilarity, DotProduct}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the portable higher-order-function vector
  * formulations into the native codegen expressions, so plans written
  * with plain `zip_with`/`aggregate` (or arriving via SQL) get the
  * single-pass kernels without the author opting in.
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *     ⇒ graft_dot(a, b)
  *   graft_dot(a, b) / (sqrt(graft_dot(a, a)) * sqrt(graft_dot(b, b)))
  *     ⇒ graft_cosine(a, b)
  *
  * Both rewrites are bit-exact: the kernels fold left in the same order
  * as the lambda fold, and null/length-mismatch semantics coincide — a
  * length mismatch OR a NULL element poisons the HOF sum with null, and
  * the kernels reproduce both (the per-element null check is emitted
  * only when an input type has containsNull = true, so typed embedding
  * columns keep the tight loop). The guards only fire on the exact
  * shapes above — `(acc, v) -> v + acc` would reassociate doubles and
  * is left untouched.
  */
object RewriteVectorHofs extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** aggregate(zip_with(a,b,(x,y)->x*y), 0.0, (acc,v)->acc+v [, id]) */
  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                Seq(xa: NamedLambdaVariable, ya: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
              Seq(acca: NamedLambdaVariable, va: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fina: NamedLambdaVariable), _))
          if (x.exprId == xa.exprId) && (y.exprId == ya.exprId) &&
            (acc.exprId == acca.exprId) && (v.exprId == va.exprId) &&
            (fin.exprId == fina.exprId) &&
            isDoubleArray(a) && isDoubleArray(b) =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      // innermost first: dots appear inside the cosine shape
      case HofDot(a, b) => DotProduct(a, b)
    }.transformAllExpressionsWithSubqueries {
      case Divide(
            DotProduct(a1, b1),
            Multiply(Sqrt(DotProduct(a2, a3)), Sqrt(DotProduct(b2, b3)), _), _)
          if a1.semanticEquals(a2) && a2.semanticEquals(a3) &&
            b1.semanticEquals(b2) && b2.semanticEquals(b3) =>
        CosineSimilarity(a1, b1)
    }
}
