package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Generate, LogicalPlan}
import org.scalatest.funsuite.AnyFunSuite

/** Regression guards for plan SHAPES that composition-level rewrites
  * bought (cf. CdcMergeSpec's zero-shuffle assert and SourcesSpec's
  * bucketed-join assert): correctness gates can't see a silently
  * re-introduced exchange, so the wins are pinned structurally here.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def nodes(p: LogicalPlan): Seq[LogicalPlan] = p.collect { case n => n }

  test("q85 aggregates the span stream exactly once (no distinct-agg Expand)") {
    val plan = SparkEntry.queries("q85_shared_spans")(spark, sf)
      .queryExecution.optimizedPlan
    // count(DISTINCT doc_id) would rewrite to Expand + two Aggregates;
    // the construction-unique (span, doc) stream needs neither.
    assert(!nodes(plan).exists(_.isInstanceOf[Expand]),
      "distinct-aggregate rewrite (Expand) reappeared in q85")
    assert(nodes(plan).count(_.isInstanceOf[Aggregate]) === 1,
      "q85 must aggregate the span stream exactly once")
  }

  test("q118's per-row path has no aggregate and no explode") {
    // The dim-stats aggregate runs once at CONSTRUCTION (driver-side,
    // dimension-sized); the returned frame must be a pure map-side
    // indexed transform — an Aggregate or Generate (explode) here
    // means the D-rows-per-vector regroup exchange came back.
    val plan = SparkEntry.queries("q118_embed_quantize")(spark, sf)
      .queryExecution.optimizedPlan
    assert(!nodes(plan).exists(_.isInstanceOf[Aggregate]),
      "q118's returned plan re-grew an aggregation")
    assert(!nodes(plan).exists(_.isInstanceOf[Generate]),
      "q118's returned plan re-grew an explode")
  }
}
