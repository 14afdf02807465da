package graft

import graft.queries.Extended22
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q135 CDC MERGE apply: deletes drop, updates rewrite, inserts
  * append, untouched rows pass through byte-identical — checked
  * against the base table on real data (the gate oracle replays the
  * same changelog in DuckDB).
  */
class CdcMergeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("merge semantics: D removes, U rewrites, I appends, rest unchanged") {
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"),
        col("o_totalprice").cast("decimal(18,2)").as("price"),
        col("o_orderstatus").as("status"))
    val out = Extended22.queries("q135_cdc_merge")(spark, sf)
    val maxK = base.agg(max(col("k"))).collect()(0).getLong(0)

    val nBase = base.count()
    val nDel = base.filter(col("k") % 10 === 7).count()
    val nUpd = base.filter(col("k") % 10 === 3).count()
    assert(nDel > 0 && nUpd > 0, "changelog vacuous at test SF")
    assert(out.count() === nBase - nDel + 5)
    // deletes gone, inserts present with the literal values
    assert(out.filter(col("k") % 10 === 7 && col("k") <= maxK).count() === 0)
    val ins = out.filter(col("k") > maxK).collect()
    assert(ins.length === 5 &&
      ins.forall(r => r.getDouble(1) == 1234.56 && r.getString(2) == "N"))
    // updates rewritten exactly (+100.00, status P)
    val basePrices = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("base_price"))
    val upd = out.filter(col("k") % 10 === 3 && col("k") <= maxK)
      .join(basePrices, "k")
      .select((col("price") - col("base_price")).as("d"), col("status"))
    assert(upd.count() === nUpd)
    assert(upd.collect().forall(r =>
      math.abs(r.getDouble(0) - 100.0) < 1e-9 && r.getString(1) == "P"))
    // untouched rows byte-identical to base
    val untouched = out
      .filter(col("k") % 10 =!= 3 && col("k") % 10 =!= 7 && col("k") <= maxK)
      .select(col("k"), col("price"), col("status"))
    val expect = base
      .filter(col("k") % 10 =!= 3 && col("k") % 10 =!= 7)
      .select(col("k"), col("price").cast("double").as("price"), col("status"))
    assert(untouched.exceptAll(expect).isEmpty &&
      expect.exceptAll(untouched).isEmpty)
  }
}
