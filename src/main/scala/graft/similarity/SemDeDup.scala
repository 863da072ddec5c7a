package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.dedup.ConnectedComponents
import graft.functions.VectorExpressions.cosineSim

/** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication", arXiv:2303.09540): remove
  * SEMANTIC duplicates — documents whose embeddings nearly coincide even
  * when their surface text shares no n-grams (template rewrites,
  * translations, paraphrase mirrors) — the gap lexical (MinHash/Jaccard)
  * dedup provably cannot close.
  *
  * The paper's pipeline, re-expressed relationally:
  *  1. CLUSTER the embedding space (k-means). The clustering is the
  *     BLOCKING structure: pairwise similarity is computed only WITHIN a
  *     cluster, so the quadratic pair cost drops from n² to Σ|cluster|²
  *     — with k ∝ n/c̄ that is O(n·c̄), linear in the corpus for a fixed
  *     mean cluster size. This is the same economics as the LSH band
  *     join, with learned (data-adaptive) buckets instead of random ones.
  *  2. PAIR within each cluster at cosine ≥ tau.
  *  3. GROUP pairs into semantic-duplicate components (connected
  *     components — pairwise keep/drop gets transitive chains wrong in
  *     both directions, the q_dup_clusters argument).
  *  4. KEEP exactly one member per component: the one with the LOWEST
  *     cosine to its cluster centroid (the paper's §3 policy — keeping
  *     the outlier preserves diversity; near-centroid members are the
  *     redundant mass), ties on the lower id.
  *
  * Scale shape: assignment is the zero-shuffle ivfAssignTo pass (codebook
  * folded into one broadcast row); the pair join shuffles (list_id, id,
  * vec) once, keyed by list — per-list partitions are the |cluster|²
  * work units; components shuffle only id pairs; the election windows
  * run over component rows (duplicate docs only), never the corpus.
  *
  * Codebook: pass `cents` from `ivfTrain` for the production path (real
  * k-means, k sized to the corpus). Default = the deterministic
  * `seedCentroids` codebook, which keeps the whole operator — argmax
  * assignment included — SQL-expressible, so the oracle checks every
  * per-doc decision (assignment, centroid similarity, keep flag)
  * hash-exactly; the trained path changes only the codebook rows.
  *
  * Returns one row per input doc: (id, list_id, cent_sim, keep) —
  * `cent_sim` rounded to 6 (engine-portable, the knnJoin contract);
  * degenerate (zero-norm/empty) vectors carry a null cent_sim, land in
  * list 0 (the ivfAssignTo contract), and sort NULLS FIRST in the
  * election — i.e. a degenerate member is preferentially kept (it is
  * maximally far from "redundant near-centroid mass").
  */
object SemDeDup {

  def semDeDup(emb: DataFrame, idCol: String, vecCol: String,
               nlist: Int, tau: Double,
               cents: Option[DataFrame] = None): DataFrame = {
    require(nlist >= 1, s"nlist must be >= 1 (got $nlist)")
    val cb = cents.getOrElse(
      SimilarityOps.seedCentroids(emb, idCol, vecCol, nlist))
    // One scan pass: list assignment (broadcast folded codebook) + the
    // centroid similarity for the keep election (broadcast nlist-row
    // codebook). Persisted: it feeds both pair sides AND the output.
    val withSim = SimilarityOps.ivfAssignTo(emb, idCol, vecCol, cb)
      .join(broadcast(cb), Seq("list_id"))
      .select(col(idCol).as("id"), col("list_id"), col(vecCol).as("__v"),
              round(cosineSim(col(vecCol), col("cvec")), 6).as("cent_sim"))
      .persist(StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheScope.register)

    // Within-cluster pairs only — the cluster key bounds the join.
    val a = withSim.select(col("list_id"), col("id").as("id_a"),
                           col("__v").as("va"))
    val b = withSim.select(col("list_id").as("__lb"), col("id").as("id_b"),
                           col("__v").as("vb"))
    val pairs = a.join(b, col("list_id") === col("__lb") &&
                          col("id_a") < col("id_b"))
      .filter(cosineSim(col("va"), col("vb")) >= tau)
      .select(col("id_a"), col("id_b"))

    val comps = ConnectedComponents.connectedComponents(pairs, "id_a", "id_b")
    val elect = comps
      .join(withSim.select(col("id"), col("cent_sim")), Seq("id"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("comp"))
          .orderBy(col("cent_sim").asc_nulls_first, col("id").asc)))
      .select(col("id"), (col("__rk") === 1).as("keep"))

    withSim.select(col("id"), col("list_id"), col("cent_sim"))
      .join(elect, Seq("id"), "left")
      .select(col("id"), col("list_id"), col("cent_sim"),
              coalesce(col("keep"), lit(true)).as("keep"))
  }
}
