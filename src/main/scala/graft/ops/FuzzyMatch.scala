package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.StringDistance

/** Entity resolution by blocked fuzzy matching — the record-linkage
  * staple (variant spellings of the same real-world entity: "cold
  * widget" / "old widget"). The classic two-phase shape:
  *
  *  1. BLOCK: a cheap deterministic key buckets candidates (default:
  *     lowercased last whitespace token — "same head noun, variant
  *     qualifier"). Blocking is the recall/cost dial: pairs in
  *     different blocks are never compared BY DESIGN (at corpus scale
  *     an unblocked fuzzy join is n² string comparisons; the key
  *     bounds the quadratic to Σ block², the SemDeDup/LSH-bucket
  *     argument).
  *  2. VERIFY: native codegen'd Jaro–Winkler (DuckDB-identical
  *     semantics, so the whole operator is oracle-checkable) on the
  *     blocked pairs, keep rounded jw ≥ tau.
  *
  * Runs on the DISTINCT name strings (entity resolution is a property
  * of the string domain, not the row count — dedupe the corpus's
  * billions of rows down to its distinct entities FIRST, then map the
  * match table back), so the join input is vocabulary-sized.
  */
object FuzzyMatch {

  /** Canonical blocking key: lowercased last whitespace token. */
  def lastTokenBlock(c: Column): Column =
    lower(element_at(split(c, " "), -1))

  /** Undirected fuzzy match pairs over one table's distinct names:
    * (name_a < name_b, rounded jw ≥ tau), compared only within a block.
    */
  def fuzzyPairs(df: DataFrame, nameCol: String, tau: Double,
                 blockKey: Column => Column = lastTokenBlock)
      : DataFrame = {
    require(tau >= 0.0 && tau <= 1.0, s"tau in [0,1], got $tau")
    val names = df.select(col(nameCol).as("name"))
      .filter(col("name").isNotNull).distinct()
      .select(col("name"), blockKey(col("name")).as("blk"))
    val a = names.select(col("name").as("name_a"), col("blk"))
    val b = names.select(col("name").as("name_b"), col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("jw", round(
        StringDistance.jaroWinkler(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= tau)
      .select(col("name_a"), col("name_b"), col("jw"))
  }

  /** Edit-distance similarity self-join: undirected pairs of distinct
    * names with levenshtein ≤ maxDist — the other classic fuzzy-match
    * verifier (typo-class variants, where Jaro–Winkler's prefix bias
    * is wrong). Candidate generation uses the LENGTH bound instead of
    * a content key: |len(a) − len(b)| > d ⇒ dist > d, so the probe
    * side explodes its 2d+1 admissible lengths and the join runs on
    * the length key — each true pair meets at exactly ONE key
    * (len_b), so no post-join dedup is needed. Verification is
    * Spark's built-in bounded levenshtein(a, b, d) (early-exits above
    * d), codegen'd as a join residual.
    *
    * At scale the length key is admittedly coarse (names concentrate
    * on few lengths); compose with `fuzzyPairs`' blocking key for a
    * two-level key when a length bucket is corpus-sized.
    */
  def editPairs(df: DataFrame, nameCol: String, maxDist: Int)
      : DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val names = df.select(col(nameCol).as("name"))
      .filter(col("name").isNotNull).distinct()
      .withColumn("len", length(col("name")))
    val probes = names
      .withColumn("lkey", explode(sequence(
        col("len") - maxDist, col("len") + maxDist)))
      .select(col("name").as("name_a"), col("lkey"))
    val targets = names
      .select(col("name").as("name_b"), col("len").as("lkey"))
    probes.join(targets, Seq("lkey"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("name_a"), col("name_b"),
              col("dist").cast("long").as("dist"))
  }
}
