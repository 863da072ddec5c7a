package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.DedupOps
import graft.functions.ShingleExpressions

/** Dev probe: head-to-head of verify-join shapes on a ScaleCurve corpus
  * (x64 is where the payload-through-shuffle cliff lives). Candidates
  * come from the production prefix machinery; the three verify shapes:
  *   A. shuffle_hash payload joins (production as of r10)
  *   B. explicit broadcast(needed) payload joins
  *   C. shuffle_hash join1 + broadcast join2 (halves the wide shuffle)
  * Usage: runMain graft.tools.VerifyShapes <dir> [shapes]
  */
object VerifyShapes {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/x64")
    val shapes = args.lift(1).getOrElse("ABC")
    val cpus = graft.Bench.defaultCpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (n, tau) = (12, 0.7)
    val docs = Tables.load(spark, dir, "documents")
    val sets = DedupOps.hashedSets(docs, "doc_id", "text", n).cache()
    // production candidates, cached so each shape pays only its verify
    val cand = {
      // reuse the full pipeline once, then recover candidates by
      // re-deriving them: cheaper to just call the pair join and strip
      // the verify — reimplement the candidate join via ScaleProbe's
      // mirror (kept in sync with DedupOps bounds)
      import org.apache.spark.sql.expressions.Window
      val postings = sets.select(col("id"), col("sz"),
                                 explode(col("hs")).as("sh"))
      val freq = postings.groupBy("sh").agg(count(lit(1)).as("df"))
      val prefix = postings.join(freq, "sh")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("id"))
            .orderBy(col("df").asc, col("sh").asc)))
        .filter(col("rn") <=
          floor(lit(1.0 - tau) * col("sz") + lit(1e-9)).cast("int") + 1)
        .select("id", "sh", "sz", "rn")
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
      prefix.as("a")
        .join(prefix.as("b"),
              col("a.sh") === col("b.sh") && col("a.id") < col("b.id") &&
                col("a.sz") >= lit(tau) * col("b.sz") - lit(1e-9) &&
                col("b.sz") >= lit(tau) * col("a.sz") - lit(1e-9) &&
                overlapBound >= minOverlap &&
                inIndexPrefix)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct().cache()
    }
    println(s"[shapes] sets=${sets.count()} cand=${cand.count()}")

    def needed: DataFrame = {
      val candIds = cand.select(col("id_a").as("id"))
        .union(cand.select(col("id_b").as("id"))).distinct()
      sets.join(candIds, Seq("id"), "left_semi")
    }
    def score(df: DataFrame): DataFrame =
      df.withColumn("common", ShingleExpressions.sortedLongIntersectCount(
          col("set_a"), col("set_b")))
        .withColumn("jaccard", col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common")).cast("double"))
        .filter(col("jaccard") >= tau)
        .select(col("id_a"), col("id_b"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[shapes] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs " +
        f"rows=$rows")
    }

    val aSide = (d: DataFrame) => d.select(col("id").as("id_a"),
      col("hs").as("set_a"), col("sz").as("sz_a"))
    val bSide = (d: DataFrame) => d.select(col("id").as("id_b"),
      col("hs").as("set_b"), col("sz").as("sz_b"))

    if (shapes.contains('A')) time("A shuffle_hash x2") {
      score(cand.join(aSide(needed.hint("shuffle_hash")), "id_a")
                .join(bSide(needed.hint("shuffle_hash")), "id_b")).count()
    }
    if (shapes.contains('B')) time("B broadcast x2") {
      score(cand.join(broadcast(aSide(needed)), "id_a")
                .join(broadcast(bSide(needed)), "id_b")).count()
    }
    if (shapes.contains('C')) time("C shuffle_hash + broadcast") {
      score(cand.join(aSide(needed.hint("shuffle_hash")), "id_a")
                .join(broadcast(bSide(needed)), "id_b")).count()
    }
    spark.stop()
  }
}
