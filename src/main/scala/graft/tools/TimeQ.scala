package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Repeated cold-cache timing of individual driver-contract queries —
  * the profiling companion to `graft.Bench` (which times each query once).
  * Usage: runMain graft.tools.TimeQ q_ngram_jaccard [q_...]; reads
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = graft.Bench.defaultCpus
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
              graft.Bench.codegenCacheEntries)
      // bench-parity commit algorithm (Bench.scala scaladoc)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
              "2")
    // ad-hoc conf overrides for profiling, e.g.
    // SPARK_GRAFT_EXTRA_CONF="spark.eventLog.enabled=true;spark.eventLog.dir=/tmp/spark-events"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach {
      _.split(";").filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_EXTRA_CONF entry needs key=value, got: '$kv'")
        }
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      (1 to runs).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val n = df.count()
        println(f"[timeq] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
        // final ADAPTIVE plan (post-execution), not the static estimate
        if (i == runs && sys.env.contains("SPARK_GRAFT_EXPLAIN"))
          println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
