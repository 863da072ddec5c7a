package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage-volume probe for the ngram-Jaccard pipeline on the ScaleCurve
  * corpora (dev tool): per scale dir, counts posting rows, distinct
  * grams, prefix rows, candidate pairs, and verified pairs — separates
  * "the data grew superlinearly" (a scaled-corpus artifact) from "the
  * plan executes superlinearly" (an engine problem). Mirrors the
  * DedupOps.ngramJaccardPairsFromSets bounds verbatim.
  *
  * Usage: runMain graft.tools.ScaleProbe dir1 [dir2 ...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = graft.Bench.defaultCpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (n, tau) = (12, 0.7)
    args.foreach { dir =>
      val docs = Tables.load(spark, dir, "documents")
      val sets = docs
        .repartition(cpus.toInt, col("doc_id"))
        .select(col("doc_id").as("id"),
                graft.functions.ShingleExpressions
                  .shingleHashes(col("text"), n).as("hs"))
        .withColumn("sz", size(col("hs")))
        .cache()
      val postings = sets.select(col("id"), col("sz"),
                                 explode(col("hs")).as("sh"))
      val nPost = postings.count()
      val freq = postings.groupBy("sh").agg(count(lit(1)).as("df")).cache()
      val nGram = freq.count()
      val topDf = freq.orderBy(col("df").desc).limit(5)
        .collect().map(_.getLong(1)).mkString("/")
      val prefix = postings.join(freq, "sh")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("id"))
            .orderBy(col("df").asc, col("sh").asc)))
        .filter(col("rn") <=
          floor(lit(1.0 - tau) * col("sz") + lit(1e-9)).cast("int") + 1)
        .select("id", "sh", "sz", "rn")
        .cache()
      val nPrefix = prefix.count()
      val overlapBound =
        least(col("a.rn"), col("b.rn")) +
          least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn"))
      val minOverlap =
        lit(tau / (1.0 + tau)) * (col("a.sz") + col("b.sz")) - lit(1e-9)
      val c = 2.0 * tau / (1.0 + tau)
      def indexLen(sz: org.apache.spark.sql.Column) =
        sz - ceil(lit(c) * sz - lit(1e-9)) + 1
      val inIndexPrefix =
        when(col("a.sz") <= col("b.sz"),
             col("a.rn") <= indexLen(col("a.sz")))
          .otherwise(col("b.rn") <= indexLen(col("b.sz")))
      val t0 = System.nanoTime()
      val nCand = prefix.as("a")
        .join(prefix.as("b"),
              col("a.sh") === col("b.sh") && col("a.id") < col("b.id") &&
                col("a.sz") >= lit(tau) * col("b.sz") - lit(1e-9) &&
                col("b.sz") >= lit(tau) * col("a.sz") - lit(1e-9) &&
                overlapBound >= minOverlap &&
                inIndexPrefix)
        .select(col("a.id"), col("b.id")).distinct().count()
      val candSec = (System.nanoTime() - t0) / 1e9
      // raw same-gram pair volume BEFORE the sz/positional bounds — the
      // join's true probe volume (what the executor actually streams)
      val t1 = System.nanoTime()
      val nRaw = prefix.as("a")
        .join(prefix.as("b"), col("a.sh") === col("b.sh") &&
          col("a.id") < col("b.id")).count()
      val rawSec = (System.nanoTime() - t1) / 1e9
      println(f"[probe] $dir%-24s postings=$nPost%-10d grams=$nGram%-10d " +
        f"topdf=$topDf prefix=$nPrefix%-9d rawpairs=$nRaw%-10d " +
        f"cand=$nCand%-8d candSec=$candSec%6.1f rawSec=$rawSec%6.1f")
      sets.unpersist(); freq.unpersist(); prefix.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
