package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.DedupOps

/** Scratch profiler for the near-dup pipeline stages (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s")
      r
    }
    val docs = Tables.load(spark, dir, "documents")
    val n = 12
    val tau = 0.7
    // variant: aggregate-based prefix (no window sort)
    locally {
      val sets0 = docs.select(col("doc_id").as("id"),
        graft.functions.ShingleExpressions.shingleHashes(col("text"), n).as("hs"))
        .withColumn("sz", size(col("hs"))).localCheckpoint()
      val postings0 = sets0.select(col("id"), col("sz"),
                                   explode(col("hs")).as("sh"))
      val freq0 = postings0.groupBy("sh").agg(count(lit(1)).as("df"))
      val prefixAgg = postings0.join(freq0, "sh")
        .groupBy(col("id"), col("sz"))
        .agg(slice(array_sort(collect_list(
                     struct(col("df").as("df"), col("sh").as("sh")))),
                   lit(1),
                   (floor(lit(1.0 - tau) * col("sz") + lit(1e-9)) + 1).cast("int"))
               .as("pref"))
        .select(col("id"), col("sz"), explode(col("pref")).as("e"))
        .select(col("id"), col("sz"), col("e.sh").as("sh"))
      time("prefixAgg count")(
        println("agg prefix rows: " + prefixAgg.count()))
    }
    val sets = time("shingleSets+checkpoint") {
      docs.select(col("doc_id").as("id"),
                  graft.functions.ShingleExpressions
                    .shingleHashes(col("text"), n).as("hs"))
        .withColumn("sz", size(col("hs")))
        .localCheckpoint()
    }
    val postings = sets.select(col("id"), col("sz"),
                               explode(col("hs")).as("sh"))
    val freq = postings.groupBy("sh").agg(count(lit(1)).as("df"))
    val prefix = postings.join(freq, "sh")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df").asc, col("sh").asc)))
      .filter(col("rn") <= floor(lit(1.0 - tau) * col("sz") + lit(1e-9)).cast("int") + 1)
      .select("id", "sh", "sz")
    time("prefix count")(println("prefix rows: " + prefix.count()))
    val prefixM = time("prefix checkpoint")(prefix.localCheckpoint())
    val cand = prefixM.as("a")
      .join(prefixM.as("b"),
            col("a.sh") === col("b.sh") && col("a.id") < col("b.id") &&
              col("a.sz") >= lit(tau) * col("b.sz") &&
              col("b.sz") >= lit(tau) * col("a.sz"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    time("cand count")(println("cand pairs: " + cand.count()))
    val candM = cand.localCheckpoint()
    val joined = candM
      .join(sets.select(col("id").as("id_a"), col("hs").as("set_a"),
                        col("sz").as("sz_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("hs").as("set_b"),
                        col("sz").as("sz_b")), "id_b")
    time("joins only")(println("joined: " + joined.count()))
    time("joins+intersect") {
      println("sum common: " + joined
        .select(graft.functions.ShingleExpressions
          .sortedLongIntersectCount(col("set_a"), col("set_b")).as("c"))
        .agg(sum(col("c"))).head())
    }
    val joinedHash = candM
      .join(sets.hint("shuffle_hash")
        .select(col("id").as("id_a"), col("hs").as("set_a"),
                col("sz").as("sz_a")), "id_a")
      .join(sets.hint("shuffle_hash")
        .select(col("id").as("id_b"), col("hs").as("set_b"),
                col("sz").as("sz_b")), "id_b")
    time("hashjoin+intersect") {
      println("sum common: " + joinedHash
        .select(graft.functions.ShingleExpressions
          .sortedLongIntersectCount(col("set_a"), col("set_b")).as("c"))
        .agg(sum(col("c"))).head())
    }
    val joinedBc = candM
      .join(broadcast(sets)
        .select(col("id").as("id_a"), col("hs").as("set_a"),
                col("sz").as("sz_a")), "id_a")
      .join(broadcast(sets)
        .select(col("id").as("id_b"), col("hs").as("set_b"),
                col("sz").as("sz_b")), "id_b")
    time("bcjoin+intersect") {
      println("sum common: " + joinedBc
        .select(graft.functions.ShingleExpressions
          .sortedLongIntersectCount(col("set_a"), col("set_b")).as("c"))
        .agg(sum(col("c"))).head())
    }
    val verified = joined
      .withColumn("common", graft.functions.ShingleExpressions
        .sortedLongIntersectCount(col("set_a"), col("set_b")))
      .withColumn("jaccard", col("common").cast("double") /
        (col("sz_a") + col("sz_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= tau)
    time("verify count")(println("pairs: " + verified.count()))
    time("full operator") {
      println("full: " + DedupOps.ngramJaccardPairs(
        docs, "doc_id", "text", n, tau).count())
    }
    spark.stop()
  }
}
