package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (the reference's `create_table(schema,
  * tbl_properties)` + `insert` re-expressed for batch formats):
  * schema'd readers and layout-aware writers for the formats a Spark
  * lake deployment uses. Streaming source/sink lives in
  * `graft.streaming.StreamingQueries`.
  *
  * Scale notes: `writePartitioned` produces hive-style directory
  * partitioning → partition PRUNING on read (the `.explain` shows
  * `PartitionFilters`, not data-file scans); `writeBucketed` persists
  * a co-located layout so later equi-joins/aggs on the bucket key
  * skip their shuffle entirely.
  */
object Sources {

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("header", "true").csv(path)

  def readJsonLines(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Hive-style partitioned parquet: one directory per value of
    * `partitionCol` → reads filtered on it prune whole directories.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  /** Bucketed managed table (requires a warehouse): co-locates rows by
    * `bucketCol` hash so joins/aggs on it are shuffle-free.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Morton (Z-order) interleave of two normalized integer columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Pure
    * shift/and/or expression tree (2·bits terms) — whole-stage
    * codegen'd, no UDF. Inputs must already be in [0, 2^bits).
    */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Z-ORDERED parquet layout (the lakehouse OPTIMIZE ZORDER shape):
    * rows are range-partitioned by the Morton interleave of two
    * min/max-normalized columns, so every output file covers a
    * COMPACT range of BOTH — per-file min/max footers then prune
    * scans filtered on either column (or both), which a single-column
    * sort only gives for its leading column. This is the multi-column
    * file-skipping layout for 100 TB fact tables; min/max
    * normalization keeps the demo self-contained (skewed columns
    * would use quantile ranks instead — same interleave).
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      files: Int, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions._
    val top = (1L << bits) - 1
    val mm = df.agg(
      min(col(colA)).as("la"), max(col(colA)).as("ha"),
      min(col(colB)).as("lb"), max(col(colB)).as("hb"))
    def norm(c: String, lo: String, hi: String) =
      least(lit(top), floor(
        (col(c) - col(lo)).cast("double") /
          greatest(lit(1.0), (col(hi) - col(lo)).cast("double")) * top)
        .cast("long"))
    df.crossJoin(broadcast(mm))
      .withColumn("__z", zValue(norm(colA, "la", "ha"), norm(colB, "lb", "hb"), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "la", "ha", "lb", "hb")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
