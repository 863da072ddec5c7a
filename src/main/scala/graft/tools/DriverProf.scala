package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Dev tool (r12 verdict task 1): where does the ~50 ms/job driver fixed
  * cost of the store-lifecycle queries actually go?
  *
  * Two instruments over one timed query run:
  *  1. Job-interval accounting: the union of [jobStart, jobEnd] intervals
  *     vs the query wall splits time into "inside jobs" (scheduler +
  *     executors) and "between jobs" (pure driver work: planning, file
  *     listing, commit, parquet footers).
  *  2. A stack sampler (every ~2 ms) over all DRIVER threads (executor
  *     task threads excluded), bucketing RUNNABLE samples into the cost
  *     categories the verdict names: listing, commit, parquet metadata,
  *     analysis/optimization, codegen, scheduler, listener bus, GC/other.
  *
  * Usage: runMain graft.tools.DriverProf q_reindex [q_...]; env
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  */
object DriverProf {

  private val categories: Seq[(String, String => Boolean)] = Seq(
    "file-listing" -> (f => f.contains("InMemoryFileIndex") ||
      f.contains("listLeafFiles") || f.contains("HadoopFSUtils") ||
      f.contains("PartitioningAwareFileIndex") || f.contains("FileStatusCache")),
    "commit-protocol" -> (f => f.contains("FileOutputCommitter") ||
      f.contains("HadoopMapReduceCommitProtocol") ||
      f.contains("commitJob") || f.contains("SQLHadoopMapReduceCommitProtocol")),
    "parquet-meta" -> (f => f.contains("ParquetFileFormat") ||
      f.contains("ParquetFooterReader") || f.contains("ParquetMetadata") ||
      f.contains("ParquetUtils") || f.contains("readFooter")),
    "analysis-optimize" -> (f => f.contains("RuleExecutor") ||
      f.contains("catalyst.optimizer") || f.contains("catalyst.analysis") ||
      f.contains("QueryPlanningTracker")),
    "codegen" -> (f => f.contains("CodeGenerator") || f.contains("janino") ||
      f.contains("CodegenContext") || f.contains("compileToClass")),
    "plan-serde" -> (f => f.contains("closureSerializer") ||
      f.contains("JavaSerial") || f.contains("broadcastInternal") ||
      f.contains("TorrentBroadcast")),
    "dag-scheduler" -> (f => f.contains("DAGScheduler") ||
      f.contains("TaskSchedulerImpl") || f.contains("TaskSetManager") ||
      f.contains("LocalEndpoint") || f.contains("resourceOffers")),
    "listener-bus" -> (f => f.contains("ListenerBus") ||
      f.contains("AsyncEventQueue") || f.contains("ExecutionListener")),
    "aqe-driver" -> (f => f.contains("AdaptiveSparkPlanExec") ||
      f.contains("QueryStageExec") || f.contains("ShufflePartitionsUtil")),
    "hadoop-fs" -> (f => f.contains("RawLocalFileSystem") ||
      f.contains("ChecksumFileSystem") || f.contains("FileUtil") ||
      f.contains("getFileStatus") || f.contains("globStatus"))
  )

  private def classify(stack: Array[StackTraceElement]): String = {
    val frames = stack.map(e => e.getClassName + "." + e.getMethodName)
    for ((name, pred) <- categories)
      if (frames.exists(pred)) return name
    "other"
  }

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
      .config("spark.sql.codegen.cache.maxEntries",
              graft.Bench.codegenCacheEntries)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
              "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // job intervals (ns) — merged into a union below
    val jobs = mutable.Map[Int, (Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(e.jobId) = (System.nanoTime(), 0L) }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach { case (s, _) =>
            jobs(e.jobId) = (s, System.nanoTime()) }
        }
    })

    // exact per-phase planning time (QueryPlanningTracker) summed over
    // every action the query fires — analysis/optimization/planning are
    // the driver-side catalyst phases; execution time is jobs
    val phaseNs = mutable.Map[String, Long]().withDefaultValue(0L)
    var nExecs = 0L
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = phaseNs.synchronized {
          nExecs += 1
          qe.tracker.phases.foreach { case (p, s) =>
            phaseNs(p) += (s.endTimeMs - s.startTimeMs) * 1000000L }
          phaseNs("TOTAL_ACTION") += durationNs
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            error: Exception): Unit = ()
      })

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm run: JIT + codegen cache
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      jobs.synchronized(jobs.clear())
      phaseNs.synchronized { phaseNs.clear(); nExecs = 0 }

      // sampler state: category -> samples; also raw top frames
      val catCounts = mutable.Map[String, Long]().withDefaultValue(0L)
      val frameCounts = mutable.Map[String, Long]().withDefaultValue(0L)
      @volatile var sampling = true
      var nSamples = 0L
      val sampler = new Thread(() => {
        while (sampling) {
          val all = Thread.getAllStackTraces
          val it = all.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val t = e.getKey
            val tn = t.getName
            // driver-side threads only: skip executor task workers, the
            // sampler itself, and idle pool threads
            if (!tn.startsWith("Executor task launch worker") &&
                tn != "driver-prof-sampler" &&
                t.getState == Thread.State.RUNNABLE) {
              val st = e.getValue
              // drop idle-but-RUNNABLE tops: netty epoll waits, the
              // Reference handler, parked pool threads — they are not
              // doing driver work
              val idleTop = st.nonEmpty && {
                val h = st.head
                val c = h.getClassName
                c.startsWith("java.net") || c.startsWith("sun.nio") ||
                  c.contains("EPoll") || c.contains("epoll") ||
                  (c == "java.lang.ref.Reference") ||
                  (c == "jdk.internal.misc.Unsafe" &&
                    h.getMethodName == "park") ||
                  (c == "java.lang.Object" && h.getMethodName == "wait")
              }
              if (st.nonEmpty && !idleTop) {
                val cat = classify(st)
                catCounts.synchronized {
                  catCounts(cat) += 1
                  // attribute a representative frame: first graft/spark one
                  val rep = st.find { f =>
                    val c = f.getClassName
                    c.startsWith("org.apache.spark") || c.startsWith("graft") ||
                      c.startsWith("org.apache.hadoop") ||
                      c.startsWith("org.apache.parquet")
                  }.getOrElse(st.head)
                  frameCounts(
                    s"[$cat] ${rep.getClassName}.${rep.getMethodName}") += 1
                }
                nSamples += 1
              }
            }
          }
          Thread.sleep(2)
        }
      }, "driver-prof-sampler")
      sampler.setDaemon(true)
      // exact codegen-compile counters (CodegenMetrics): count of janino
      // compilations and total ms spent, delta over the timed run —
      // detects codegen-cache thrash (default cache: 100 entries LRU)
      val cgCount0 = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
      val t0 = System.nanoTime()
      sampler.start()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      sampling = false
      sampler.join(1000)
      Thread.sleep(300) // listener drain
      val cgCount1 = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount

      // union of job intervals
      val ivs = jobs.synchronized(
        jobs.values.filter(_._2 > 0).toSeq.sortBy(_._1))
      var covered = 0L
      var curS = -1L; var curE = -1L
      ivs.foreach { case (s, e) =>
        if (s > curE) { if (curE > 0) covered += curE - curS; curS = s; curE = e }
        else if (e > curE) curE = e
      }
      if (curE > 0) covered += curE - curS
      val nJobs = ivs.size
      val inJobs = covered / 1e9
      println(f"=== $name rows=$n wall=$wall%.2f s jobs=$nJobs " +
        f"inJobs=$inJobs%.2f s betweenJobs=${wall - inJobs}%.2f s " +
        f"perJobOverheadIfUniform=${(wall - inJobs) / math.max(1, nJobs) * 1000}%.1f ms " +
        f"codegenCompiles=${cgCount1 - cgCount0}")
      phaseNs.synchronized {
        println(s"  catalyst phases over $nExecs tracked executions:")
        phaseNs.toSeq.sortBy(-_._2).foreach { case (p, ns) =>
          println(f"    $p%-16s ${ns / 1e9}%7.3f s") }
      }
      val cats = catCounts.synchronized(catCounts.toSeq).sortBy(-_._2)
      val tot = math.max(1L, cats.map(_._2).sum)
      println(s"  driver-thread RUNNABLE samples: $tot")
      cats.foreach { case (c, k) =>
        println(f"    $c%-18s $k%6d (${k * 100.0 / tot}%5.1f%%)")
      }
      println("  top frames:")
      frameCounts.synchronized(frameCounts.toSeq).sortBy(-_._2).take(24)
        .foreach { case (f, k) => println(f"    $k%6d  $f") }
    }
    spark.stop()
  }
}
