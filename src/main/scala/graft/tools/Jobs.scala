package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Dev tool: run one driver-contract query with a job/stage listener and
  * print per-job wall time + per-stage executor task time, to separate
  * driver/scheduling overhead from real compute.
  */
object Jobs {
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
      // bench-parity commit algorithm (Bench.scala scaladoc)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
              "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobStart = mutable.Map[Int, Long]()
    val lines = mutable.ArrayBuffer[String]()
    var taskTimeMs = 0L
    var nStages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart(e.jobId) = System.nanoTime()
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val d = (System.nanoTime() - jobStart.getOrElse(e.jobId, 0L)) / 1e9
        lines += f"job ${e.jobId}%3d ${d}%7.3f s"
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        taskTimeMs += e.stageInfo.taskMetrics.executorRunTime
        nStages += 1
        val m = e.stageInfo.taskMetrics
        // stage wall (submission→completion, ms clock): with uniform
        // 32-way tasks, wall ≈ taskTime/32; a stage whose wall is far
        // above that is serialized/skewed — the r12 task-2 signal
        val sWall = (for {
          s <- e.stageInfo.submissionTime; c <- e.stageInfo.completionTime
        } yield (c - s) / 1000.0).getOrElse(-1.0)
        lines += f"  stage ${e.stageInfo.stageId}%3d tasks=${e.stageInfo.numTasks}%3d " +
          f"wall=$sWall%7.2f s " +
          f"taskTime=${m.executorRunTime / 1000.0}%8.2f s " +
          f"sRead=${m.shuffleReadMetrics.recordsRead}%10d " +
          f"sWrite=${m.shuffleWriteMetrics.recordsWritten}%10d " +
          f"spill=${(m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6}%8.1f MB"
      }
    })
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm run
      fn(spark, sfDir).count()
      spark.catalog.clearCache()
      lines.clear(); taskTimeMs = 0L; nStages = 0
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener drain
      println(s"=== $name rows=$n wall=${f"$wall%.2f"}s jobs=${lines.size} " +
        s"stages=$nStages taskTime=${taskTimeMs / 1000.0}s")
      lines.foreach(l => println("  " + l))
    }
    spark.stop()
  }
}
