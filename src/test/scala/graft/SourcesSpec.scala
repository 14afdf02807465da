package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  private lazy val tmp = Files.createTempDirectory("graft_sources").toString

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("o_orderkey").collect().map(_.toSeq).toSeq

  test("csv round-trip preserves rows and schema") {
    val orders = Tables.orders(spark, sf)
    Sources.writeCsv(orders, s"$tmp/orders_csv")
    val back = Sources.readCsv(spark, s"$tmp/orders_csv", orders.schema)
    assert(canon(back) === canon(orders))
  }

  test("json-lines round-trip preserves rows") {
    val orders = Tables.orders(spark, sf)
    Sources.writeJsonLines(orders, s"$tmp/orders_json")
    val back = Sources.readJsonLines(spark, s"$tmp/orders_json", orders.schema)
    assert(canon(back) === canon(orders))
  }

  test("orc round-trip preserves rows") {
    val orders = Tables.orders(spark, sf)
    Sources.writeOrc(orders, s"$tmp/orders_orc")
    assert(canon(Sources.readOrc(spark, s"$tmp/orders_orc")) === canon(orders))
  }

  test("partitioned write enables partition pruning on read") {
    val orders = Tables.orders(spark, sf)
    Sources.writePartitioned(orders, s"$tmp/orders_part", "o_orderstatus")
    val pruned = spark.read.parquet(s"$tmp/orders_part")
      .filter(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderstatus"), s"no partition pruning in:\n$plan")
    assert(pruned.count() ===
      orders.filter(col("o_orderstatus") === "F").count())
  }

  test("bucketed table join avoids the shuffle on the bucket key") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.orders(s, sf).select("o_orderkey", "o_custkey")
      Sources.writeBucketed(orders, "orders_bkt", "o_orderkey", 8)
      val li = Tables.lineitem(s, sf).select("l_orderkey", "l_quantity")
      Sources.writeBucketed(li, "lineitem_bkt", "l_orderkey", 8)
      val joined = s.table("orders_bkt").join(s.table("lineitem_bkt"),
        col("o_orderkey") === col("l_orderkey"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() > 0)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS orders_bkt")
      s.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
