package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.DedupOps
import graft.text.TextOps

/** The training-data curation flagship (north-star scope): the standard
  * corpus-cleaning pass a 100 TB text pipeline runs before tokenization —
  *
  *   exact dedup (content hash, keep lowest id)
  *   → near-dup removal (12-gram Jaccard ≥ τ, drop the higher id of
  *     every surviving pair — the greedy keep-first policy)
  *   → language filter
  *   → quality gate (token floor) + quality scoring
  *
  * Everything is one lazy dataflow: the only shuffles are the content-hash
  * dedup and the near-dup join's hashed-shingle exchanges; the text bytes
  * themselves move at most once.
  */
object CorpusPipeline {

  def curate(docs: DataFrame, lang: String = "en",
             tau: Double = 0.7, minTokens: Int = 20): DataFrame = {
    // exact dedup on content fingerprint, deterministic survivor
    val w = Window.partitionBy(TextOps.fingerprint(col("text")))
      .orderBy(col("doc_id").asc)
    // referenced twice below (near-dup input + final keep join): lazy
    // checkpoint so the md5 window runs once at first action while plan
    // construction stays side-effect free
    val exactKept = docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .localCheckpoint(false)

    // near-dup removal: any doc with a ≥τ neighbour of smaller id drops
    val dropIds = DedupOps
      .ngramJaccardPairs(exactKept, "doc_id", "text", n = 12, tau = tau)
      .select(col("id_b").as("doc_id")).distinct()
    val kept = exactKept.join(dropIds, Seq("doc_id"), "left_anti")

    kept
      .filter(col("lang") === lang)
      .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long"))
      .filter(col("n_tokens") >= minTokens)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
              TextOps.qualityScore(col("text")).as("quality_score"),
              TextOps.fingerprint(col("text")).as("fingerprint"))
  }

  def flagship(spark: SparkSession, dir: String): DataFrame =
    curate(Tables.load(spark, dir, "documents"))
}
