package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query and total seconds
  * over SparkEntry.queries at SPARK_GRAFT_SF_DIR.
  *
  * Each query is executed once untimed (JIT + codegen cache + file-cache
  * warm-up — local-mode stand-ins for a cluster's steady state) and then
  * timed. The timed run includes full plan construction and execution;
  * sink queries rewrite their output each run.
  *
  * Hygiene (r1 lesson): queries that persist intermediates would otherwise
  * leak cached blocks into every later query's run (and let the timed run
  * reuse the warm-up's cache, under-reporting). The cache is cleared after
  * EVERY run, so each timed number is a cold-cache, warm-JIT measurement
  * and block-manager pressure never accumulates across the suite.
  *
  * The JSON metric line is written to `target/bench.json` AND printed as
  * the final stdout line after `spark.stop()` — sbt/Spark log noise made
  * the stdout-only form unparseable in r1.
  */
object Bench {

  /** JSON string escape for interpolated names/paths/SQL: backslash,
    * quote, and all control chars. Shared by the bench metric line and
    * Verify's oracle_sql.json — both are machine-parsed driver contracts
    * that a stray quote/tab would silently zero out.
    */
  private[graft] def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The one-line JSON metric (pure — spec'd so the driver-parseability
    * contract can't silently regress). A query timed < 0 means FAILED; it
    * is excluded from the sum and the total is poisoned past any
    * plausible duration so a failing round can't look fast.
    */
  def renderJson(results: Seq[(String, Double)], sfDir: String): String = {
    val qs = results.map { case (k, v) => jsonQuote(k) + ":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum +
      (if (results.exists(_._2 < 0)) 1e9 else 0.0)
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":${jsonQuote(sfDir)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def dropCaches(): Unit = spark.catalog.clearCache()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        try { fn(spark, sfDir).count() } // warm-up, untimed
        catch { case _: Throwable => }
        dropCaches()
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
        val sec = (System.nanoTime() - t0) / 1e9
        dropCaches()
        // a failed query must not masquerade as a fast one: -1 marker
        name -> (if (ok) sec else -1.0)
    }
    val json = renderJson(results, sfDir)
    // absolute path: the driver may invoke from any cwd (same rationale
    // as Sinks.scratchRoot)
    val outDir = Paths.get("/root/repo/target")
    Files.createDirectories(outDir)
    Files.writeString(outDir.resolve("bench.json"), json + "\n")
    spark.stop()
    // sole unprefixed line after shutdown: nothing can interleave with it
    println(json)
  }
}
