package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** Identity wrapper that declares itself NON-DETERMINISTIC so the
  * optimizer may not duplicate, reorder past, or constant-fold the wrapped
  * expression — the optimization guide's §4.4 remedy for the
  * filter-pushdown duplication problem, as a native expression instead of
  * a UDF flag: a filter on a column computed by an EXPENSIVE expression
  * tree otherwise pushes below the projection by SUBSTITUTING the whole
  * tree into the predicate, so every input row evaluates the tree in the
  * predicate and every surviving row evaluates it AGAIN in the projection
  * (measured on domain_quota_psl: the pushed-down registeredDomain/urlHost
  * tree ran as one giant generated predicate at ~4 ms/row; fenced, the
  * stage returns to scan-bound). Values are untouched — the wrapped
  * expression IS deterministic, the flag only talks to the optimizer —
  * so results are bit-identical; the trade is that OTHER filters also stop
  * pushing past the fenced projection, which is why this wraps specific
  * expensive aliases, never whole frames. */
case class EvalOnce(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): EvalOnce =
    copy(child = newChild)
  override def prettyName: String = "graft_eval_once"
}

object EvalOnce {
  /** Fence an expensive column: evaluated once per row where it is
    * projected, never re-inlined into pushed-down predicates. */
  def apply(c: Column): Column = Bridge.column(EvalOnce(Bridge.expression(c)))
}
