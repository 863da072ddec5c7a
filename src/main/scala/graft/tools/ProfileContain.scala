package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.dedup.DedupOps

/** Scratch stage profiler for removeContained (dev tool). Findings at
  * sf0.1 (recorded so the next optimization attempt doesn't repeat
  * them): (1) hash-order prefixes (rank = position in the sorted hs
  * array, zero rank shuffles) explode candidates 119k → 4.4M and the
  * query 13 s → 158 s — the df rarest-first order IS the operator's
  * scale story, keep it; (2) the positional overlapBound prunes only
  * ~0.2% of candidates here (119,180 vs 119,403 without) but costs
  * nothing extra since the ranked frame serves both join roles;
  * (3) warm stage budget: freq 2.0 + rank window 2.7 + postB semi 1.7
  * + candidates 1.8 + verify 3.4 — two different shuffle keys (sh for
  * df, id for rank) make the rank machinery irreducible below ~4.5 s
  * at this fixed job latency.
  */
object ProfileContain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s")
      r
    }
    val n = 12; val tau = 0.9
    val base = Tables.load(spark, dir, "documents")
    val docs = base.select(col("doc_id"), col("text"))
    val snips = base
      .filter(pmod(col("doc_id"), lit(7)) === 0 && length(col("text")) >= 250)
      .select((col("doc_id") + 100000).as("doc_id"),
              substring(col("text"), 51, 150).as("text"))
    val all = docs.unionByName(snips)

    // df-order PREFIX via aggregate slice; container side = RAW postings
    // (no freq join, no window) — overlapBound dropped
    time("FULL no-positional variant") {
      val sets = DedupOps.hashedSets(all, "doc_id", "text", n)
      val postings = sets.select(col("id"), col("sz"), explode(col("hs")).as("sh"))
      val freq = postings.groupBy("sh").agg(count(lit(1)).as("df"))
      val bound = (col("sz") - ceil(lit(tau) * col("sz") - lit(1e-9)).cast("int") + 1)
      val prefixA = postings.join(freq, "sh")
        .groupBy(col("id"), col("sz"))
        .agg(slice(array_sort(collect_list(
               struct(col("df").as("df"), col("sh").as("sh")))),
             lit(1), bound.cast("int")).as("pref"))
        .select(col("id"), col("sz"), explode(col("pref.sh")).as("sh"))
      val postB = postings.join(prefixA.select("sh").distinct(), Seq("sh"), "left_semi")
      val sizeOrder = col("b.sz") > col("a.sz") ||
        (col("b.sz") === col("a.sz") && col("b.id") < col("a.id"))
      val cand = prefixA.as("a")
        .join(postB.as("b"),
              col("a.sh") === col("b.sh") && sizeOrder &&
                col("b.sz") >= lit(tau) * col("a.sz") - lit(1e-9))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      println("cand " + cand.count())
      val candIds = cand.select(col("id_a").as("id"))
        .union(cand.select(col("id_b").as("id"))).distinct()
      val needed = sets.join(candIds, Seq("id"), "left_semi")
      val removed = cand
        .join(needed.hint("shuffle_hash")
                .select(col("id").as("id_a"), col("hs").as("set_a"),
                        col("sz").as("sz_a")), "id_a")
        .join(needed.hint("shuffle_hash")
                .select(col("id").as("id_b"), col("hs").as("set_b"),
                        col("sz").as("sz_b")), "id_b")
        .withColumn("common", graft.functions.ShingleExpressions
          .sortedLongIntersectCount(col("set_a"), col("set_b")))
        .filter(col("common").cast("double") / col("sz_a").cast("double") >= tau)
        .select(col("id_a").as("doc_id")).distinct()
      println("survivors " + all.join(removed, Seq("doc_id"), "left_anti").count())
      sets.unpersist(false)
    }
    time("FULL df-order removeContained") {
      println("full " + DedupOps.removeContained(all, "doc_id", "text", n, tau).count())
    }
    spark.stop()
  }
}
