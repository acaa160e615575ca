package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Fused cosine similarity over two float-vector columns.
  *
  * The composable alternative — `aggregate(zip_with(a,b,*),...)` for the dot
  * product plus two more aggregates for the norms — walks each array three
  * times through non-codegen higher-order lambdas. This expression is one
  * primitive loop with whole-stage codegen: dot and both norms accumulate
  * in doubles in a single pass (left-to-right, so results are deterministic
  * and partition-invariant).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    // zero-norm (or empty) vectors have no direction: similarity 0, never
    // NaN — NaN would outrank everything under desc sort and pass every
    // >= threshold filter.
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
        float[] $x = $a.toFloatArray();
        float[] $y = $b.toFloatArray();
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        int $n = java.lang.Math.min($x.length, $y.length);
        for (int $i = 0; $i < $n; $i++) {
          double xi = (double) $x[$i]; double yi = (double) $y[$i];
          $dot += xi * yi; $nx += xi * xi; $ny += yi * yi;
        }
        ${ev.value} = ($nx == 0.0 || $ny == 0.0)
          ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Word-set Jaccard similarity |A∩B| / |A∪B| over two string arrays.
  *
  * The composable form — `size(array_intersect(a,b)) /
  * size(array_union(a,b))` — walks both arrays twice and materializes two
  * intermediate arrays per row just to take their sizes. This expression
  * builds one hash set of the left side and counts membership in a single
  * pass: |∪| = |A|+|B|-|A∩B|. Inputs are assumed distinct-element arrays
  * (callers normalize with array_distinct). */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[Any](x.numElements() * 2)
    var i = 0
    while (i < x.numElements()) { set.add(x.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < y.numElements()) {
      if (set.contains(y.getUTF8String(i))) inter += 1
      i += 1
    }
    val union = x.numElements() + y.numElements() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val set = ctx.freshName("set"); val i = ctx.freshName("i")
      val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
      s"""
        java.util.HashSet<Object> $set = new java.util.HashSet<Object>($a.numElements() * 2);
        for (int $i = 0; $i < $a.numElements(); $i++) {
          $set.add($a.getUTF8String($i));
        }
        int $inter = 0;
        for (int $i = 0; $i < $b.numElements(); $i++) {
          if ($set.contains($b.getUTF8String($i))) $inter++;
        }
        int $union = $a.numElements() + $b.numElements() - $inter;
        ${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / $union;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the graft native expressions. */
object VectorFunctions {
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def jaccard(a: Column, b: Column): Column =
    Bridge.column(JaccardSimilarity(Bridge.expression(a), Bridge.expression(b)))
}

/** Session extension registering the native functions for SQL users:
  * `spark.sql.extensions=graft.functions.GraftExtensions` →
  * `SELECT graft_cosine(a.embedding, b.embedding) ...`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[JaccardSimilarity].getName, "graft_jaccard"),
      (children: Seq[Expression]) => JaccardSimilarity(children.head, children(1))))
    // whole-operator extension: plans graft.plans.TopKPerKey logical nodes
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
  }
}
