package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.io.Sinks

/** Dev tool: wall timing of CorpusRefresh establish vs steady-state
  * refresh (repeated calls are REPLAYS — idempotent by contract, so
  * every call after the first measures the same day-2 work). Lives in
  * graft.dedup (not graft.tools) for access to the package-private
  * index internals when ad-hoc phase probes are added during tuning.
  *
  * Measured here (sf0.1, quiet box, tmpfs scratch): establish ~7 s
  * (one-time), steady-state refresh ~7-8 s, of which the three ~2 s
  * phases (election, probe, commit) are all fixed-cost bound — ~90
  * jobs of scheduling latency over ~5 s of honest 32-core compute.
  * The r6 one-shot form paid the warehouse re-scan ON TOP of this;
  * day-2 cost now scales with the batch, not the corpus.
  */
object RefreshProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = graft.Bench.defaultCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val root = s"${Sinks.scratchRoot}/refreshprof"
    Sinks.dropTable(spark, root)
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    phase("establish(cold)") {
      CorpusRefresh.establish(docs.filter(pmod(col("doc_id"), lit(3)) =!= 0),
        "doc_id", "text", s"$root/table", s"$root/mh")
    }
    (1 to 4).foreach { i =>
      spark.catalog.clearCache()
      phase(s"refresh$i") {
        CorpusRefresh.refresh(batch, "doc_id", "text",
          s"$root/table", s"$root/mh", tau = 0.7, minTokens = 20).count()
      }
    }
    spark.stop()
  }
}
