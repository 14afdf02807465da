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
}
