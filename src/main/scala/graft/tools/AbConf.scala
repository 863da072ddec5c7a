package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Dev tool: interleaved same-JVM A/B of one RUNTIME SQL conf over one
  * query — ABABAB..., cold cache each run, reporting per-arm min and
  * median. Interleaving makes the comparison immune to this box's
  * multi-minute contention windows (which defeat cross-JVM A/Bs: the
  * whole second JVM can land inside one window).
  *
  * Usage: runMain graft.tools.AbConf <query> <conf> <valA> <valB> [pairs]
  * env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  */
object AbConf {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: AbConf <query> <conf> <valA> <valB> [pairs]")
    val Array(name, key, valA, valB) = args.take(4)
    val pairs = args.lift(4).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = graft.Bench.defaultCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
              graft.Bench.codegenCacheEntries)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
              "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // warm once per arm value (codegen caches differ per plan string? no —
    // but JIT warmth should cover both arms)
    Seq(valA, valB).foreach { v =>
      spark.conf.set(key, v)
      fn(spark, sfDir).count(); dropCaches()
    }
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    // ABBA ordering: arm order alternates per pair so a systematic
    // position effect (GC debt from the previous run, page-cache state)
    // hits both arms equally
    for (i <- 1 to pairs;
         (v, buf) <- if (i % 2 == 1) Seq((valA, as), (valB, bs))
                     else Seq((valB, bs), (valA, as))) {
      spark.conf.set(key, v)
      dropCaches()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      buf += sec
      println(f"[ab] $name pair$i $key=$v $sec%.3f s")
    }
    def stats(xs: Seq[Double]) = {
      val s = xs.sorted
      (s.head, s(s.size / 2))
    }
    val (minA, medA) = stats(as.toSeq)
    val (minB, medB) = stats(bs.toSeq)
    println(f"[ab] RESULT $name $key: A=$valA min=$minA%.3f med=$medA%.3f | " +
      f"B=$valB min=$minB%.3f med=$medB%.3f | minB/minA=${minB / minA}%.3f " +
      f"medB/medA=${medB / medA}%.3f")
    spark.stop()
  }
}
