package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: where does q38 spend its CPU at sf0.1? (r16) */
object Probe38 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import java.lang.management.ManagementFactory
    def cpuNs = ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val c0 = cpuNs
      val th0 = graft.Bench.threadCpuByClass()
      val r = f
      val th1 = graft.Bench.threadCpuByClass()
      val d = (th0.keySet ++ th1.keySet).map { k =>
        k -> (th1.getOrElse(k, 0L) - th0.getOrElse(k, 0L)) / 100.0 }.toMap
      println(f"[p38] $tag%-28s wall ${(System.nanoTime() - t0) / 1e9}%7.2f s  cpu ${(cpuNs - c0) / 1e9}%7.2f s  " +
        d.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
      r
    }
    // warm the parquet reader + JIT
    spark.read.parquet(s"$dir/embeddings.parquet").count()

    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "32")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val emb = graft.Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))

    val coded = emb.select(col("vec_id"),
      posexplode(concat(
        graft.queries.Lsh.srpCodes(col("embedding"), tables = 8, bits = 8),
        array(xxhash64(lit("exact-emb"), col("embedding")))))
        .as(Seq("tbl", "code")))
    timed("srp_codes (noop)") {
      coded.write.format("noop").mode("overwrite").save() }
    timed("srp_codes again") {
      coded.write.format("noop").mode("overwrite").save() }
    val buckets = timed("bucket_agg+chk") {
      val b = coded
        .repartition(1, col("tbl"), col("code"))
        .groupBy("tbl", "code").agg(collect_list("vec_id").as("ids"))
        .filter(size(col("ids")) >= 2)
        .localCheckpoint()
      println("  buckets=" + b.count()); b }
    println("  bucket size histo:")
    buckets.select(size(col("ids")).as("sz"))
      .groupBy("sz").count().orderBy(desc("sz")).show(10, false)
    val pairs = timed("pair_expand+distinct") {
      val p = buckets
        .repartition(32)
        .select(explode(col("ids")).as("a"), col("ids"))
        .select(col("a"), explode(col("ids")).as("b"))
        .filter(col("a") < col("b"))
        .distinct()
        .localCheckpoint()
      println("  pairs=" + p.count()); p }
    val verified = timed("verify cosine (noop)") {
      val ids = pairs.select(col("a").as("vec_id"))
        .union(pairs.select(col("b").as("vec_id"))).distinct()
      val pruned = emb.join(broadcast(ids), "vec_id").localCheckpoint()
      val v = pairs
        .join(broadcast(pruned.select(col("vec_id").as("a"), col("embedding").as("f_a"))), "a")
        .join(broadcast(pruned.select(col("vec_id").as("b"), col("embedding").as("f_b"))), "b")
        .select(col("a"), col("b"),
          graft.functions.CosineSim(col("f_a"), col("f_b")).as("cos"))
        .filter(col("cos") >= 0.4)
      v.write.format("noop").mode("overwrite").save(); v }
    println("  verified=" + verified.count())
    // full q38 for comparison
    timed("full q38") {
      println("  rows=" + graft.queries.DedupQueries.queries(
        "q38_dedup_embedding")(spark, dir).count()) }
    timed("full q38 again") {
      println("  rows=" + graft.queries.DedupQueries.queries(
        "q38_dedup_embedding")(spark, dir).count()) }
    spark.stop()
  }
}
