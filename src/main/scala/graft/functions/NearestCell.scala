package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: index of the nearest centroid (squared
  * L2, ties to the lowest index) for a FLOAT vector, against a small
  * centroid table carried as a reference object into the generated
  * code.
  *
  * This is IVF's assignment scan (SURVEY.md §2 q51): at 100 TB every
  * corpus vector is labeled with its coarse cell exactly once, so the
  * kernel must stay inside whole-stage codegen like [[CosineSim]].
  * It replaces the Spark-ML `model.transform` step — the ML pipeline
  * carries UDF/Vector conversion overhead per row, and its
  * surrounding `KMeans.fit` launches a multi-job Lloyd's loop that is
  * pointless for a DRIVER-SIZED sample (the fit sample is bounded by
  * design; see IvfAnn). Centroids are deterministic input, so the
  * expression is foldable-stable and bit-reproducible regardless of
  * partitioning.
  *
  * Comparison uses strict `<` on sequentially-accumulated doubles:
  * the first minimal index wins, matching the driver-side fit's
  * tie-break so index build and probe agree exactly.
  */
case class NearestCell(child: Expression, centers: Array[Array[Float]])
    extends UnaryExpression {

  require(centers.nonEmpty, "NearestCell needs at least one centroid")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      val n = math.min(x.numElements(), ctr.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val t = x.getFloat(i).toDouble - ctr(i).toDouble
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ctrs = ctx.addReferenceObj("centers", centers, "float[][]")
      // freshName on every local: two NearestCell instances (or one next
      // to another kernel declaring the same identifiers) in a single
      // codegen'd projection must not produce duplicate declarations —
      // a janino failure here silently drops the whole stage out of
      // codegen, the exact perf path this kernel exists to keep.
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val ctr = ctx.freshName("ctr")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      s"""
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $ctrs.length; $c++) {
         |  float[] $ctr = $ctrs[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $ctr.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $t = (double) $a.getFloat($i) - (double) $ctr[$i];
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCell {
  /** Column-API entry point: `NearestCell($"embedding", centers)`. */
  def apply(v: Column, centers: Array[Array[Float]]): Column =
    GraftSqlBridge.column(
      NearestCell(GraftSqlBridge.expression(v), centers))
}
