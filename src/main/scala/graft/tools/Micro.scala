package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.dedup.DedupOps

/** Dev microbenchmark: isolates the box's per-stage/per-job fixed costs
  * from real compute at sf0.1, so "fixed job latency" claims in the
  * profilers stay falsifiable. Not part of the driver contract.
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "32")
    val spark = SparkSession.builder().master(s"local[${graft.Bench.defaultCpus}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
              sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
              graft.Bench.codegenCacheEntries)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): Unit = {
      // 3 runs, report each — first includes codegen/JIT
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f
        println(f"[micro] $label%-34s run$i ${(System.nanoTime()-t0)/1e9}%7.3f s")
      }
    }
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))

    time("docs.count (scan only)") { docs.count() }
    time("1-shuffle groupBy(doc_id%97)") {
      docs.groupBy(pmod(col("doc_id"), lit(97))).count().count()
    }
    time("3-shuffle chain ints") {
      docs.select(pmod(col("doc_id"), lit(97)).as("a"))
        .groupBy("a").agg(count(lit(1)).as("c"))
        .groupBy(pmod(col("a"), lit(13)).as("b")).agg(sum(col("c")).as("s"))
        .groupBy(pmod(col("b"), lit(5))).agg(sum(col("s")))
        .count()
    }
    time("hashedSets materialize+count") {
      val s = DedupOps.hashedSets(docs, "doc_id", "text", 12)
      s.count()
      s.unpersist()
    }
    time("postings df (explode+groupBy)") {
      val s = DedupOps.hashedSets(docs, "doc_id", "text", 12)
      s.select(explode(col("hs")).as("sh"))
        .groupBy("sh").agg(count(lit(1))).count()
      s.unpersist()
    }
    spark.stop()
  }
}
