package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized count-min sketch (the binary produced by
  * Spark's `count_min_sketch` aggregate) for an item's estimated
  * count: `cms_estimate(sketch, item)`.
  *
  * The aggregate builds partial sketches per partition and merges
  * them map-side — the mergeable-state 100 TB path — but Spark ships
  * no function to READ the resulting binary inside a query; this
  * closes that gap. String items hash as their UTF-8 bytes, exactly
  * how the aggregate added them (`addBinary(utf8.getBytes)`), so
  * estimates are bit-identical to the sketch's own accounting.
  *
  * CodegenFallback is deliberate: the expression evaluates once per
  * (group, probe) row — tens of rows after aggregation, never in a
  * per-row hot path — and the sketch deserialization is cached per
  * distinct binary anyway.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_estimate: sketch must be binary, got ${left.dataType}")
    else if (!Seq(StringType, LongType).contains(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_estimate: item must be string or bigint, got ${right.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  // One sketch binary feeds many probe rows — memoize deserialization.
  // THREAD-LOCAL because a bound expression instance can be evaluated
  // by several task threads at once; a shared mutable pair could tear
  // (thread A's bytes with thread B's sketch) and return garbage.
  @transient private lazy val cached =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  private def sketchOf(bytes: Array[Byte]): CountMinSketch = {
    val c = cached.get()
    // Content equality, not `eq`: UnsafeRow.getBinary hands back a
    // FRESH copy per evaluation, so a reference-keyed memo never hits
    // on the normal column path and re-deserializes per probe row. The
    // length check short-circuits the byte compare for distinct
    // sketches.
    if (c != null && (c._1.length == bytes.length) &&
        java.util.Arrays.equals(c._1, bytes)) c._2
    else {
      val sk = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      if (c == null) {
        // First use on this (pooled) task thread: arrange for the memo
        // to be dropped at task end so a finished query doesn't pin
        // ~1 MB of sketch per executor thread (classloader-leak nit).
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null)
          tc.addTaskCompletionListener[Unit](_ => cached.remove())
      }
      cached.set((bytes, sk))
      sk
    }
  }

  override def nullSafeEval(sketch: Any, item: Any): Any = {
    val cms = sketchOf(sketch.asInstanceOf[Array[Byte]])
    item match {
      case s: UTF8String => cms.estimateCount(s.getBytes)
      case l: java.lang.Long => cms.estimateCount(l)
      case other => cms.estimateCount(other)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
