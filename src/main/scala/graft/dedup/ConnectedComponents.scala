package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an undirected edge list, via the
  * alternating large-star / small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", ACM SoCC 2014).
  *
  * This is the missing last step of near-dup dedup at corpus scale: the
  * pair joins (DedupOps.ngramJaccardPairs / minhashLshPairs) emit EDGES,
  * but a curation pipeline must collapse transitive duplicate chains
  * (A~B, B~C but not A~C directly) into CLUSTERS and elect one canonical
  * document per cluster. Pairwise-only dedup either over-deletes (drop
  * both ends) or under-deletes (keep one end per pair, chains survive).
  *
  * Why this algorithm and not label propagation: plain min-label
  * propagation converges in O(diameter) rounds — fine for near-clique
  * duplicate clusters, quadratic-round on long chains (a 100 TB crawl
  * has mirror chains hundreds deep). Large-star/small-star contracts
  * star subtrees each round and provably converges in O(log² n) rounds
  * (in practice ≤ ~5 on real dup graphs) to the canonical star forest:
  * every node points at its component's MINIMUM id. Each round is two
  * groupBy-join passes that shuffle only (node, node) id pairs — never
  * payloads — with map-side combine on the min aggregate, so a hot node
  * (a boilerplate doc duplicated millions of times) aggregates partially
  * per map task instead of buffering a giant neighbor list.
  *
  * Round r: E ← smallStar(largeStar(E)); stop when the edge multiset is
  * unchanged (checked by count + an order-independent hash-sum — one
  * cheap action per round on a frame already materialized for lineage
  * truncation).
  *
  * CACHE OWNERSHIP: the returned frame reads from an internally
  * persisted edge frame (evictable MEMORY_AND_DISK; all intermediate
  * rounds are unpersisted eagerly). The CALLER releases it —
  * `spark.catalog.clearCache()` (as Bench/Verify do per action) or
  * unpersist of the returned frame's cache via the session — same
  * contract as DedupOps.hashedSets.
  */
object ConnectedComponents {

  /** Connected components of the undirected graph given by `edges`
    * (two id columns; self-loops ignored). Returns (id, comp): one row
    * per node appearing in at least one edge, comp = min id in the
    * node's component.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1 (got $maxIter)")
    // Canonical start: (u > v) directed edges, self-loops dropped. The
    // distinct collapses parallel edges so round cost is bounded by the
    // simple-graph size from the start.
    var e = truncated(edges
      .select(greatest(col(aCol), col(bCol)).as("u"),
              least(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // No up-front signature action: the star operator is deterministic,
    // so sig(round i) == sig(round i−1) detects its fixpoint just as
    // well as comparing against the input — and round 1's signature
    // action is what materializes the (lazy) canonical-edge cache
    // anyway. One cluster job saved per invocation; an empty graph
    // reads as a 0-count first-round signature.
    var sig: (Long, String) = null

    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // --- large-star: for each node u, connect every STRICTLY LARGER
      // neighbor v to m(u) = min(N(u) ∪ {u}). Emitted edges (v, m) have
      // v > u ≥ m, so they stay canonical and never self-loop.
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mLarge = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val afterLarge = sym.join(mLarge, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()

      // --- small-star: point each edge large→small, then connect every
      // smaller-or-equal neighbor (and u itself) to m(u) = min neighbor.
      val mSmall = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      val next = truncated(afterLarge.join(mSmall, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mSmall.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct())
        .persist(StorageLevel.MEMORY_AND_DISK)

      val nextSig = signature(next)
      e.unpersist()
      e = next
      converged = nextSig == sig || nextSig._1 == 0L
      sig = nextSig
      it += 1
    }
    // A non-converged edge set is NOT a star forest — reading components
    // off it would silently merge or split clusters. Real graphs converge
    // in single-digit rounds (the O(log² n) bound is loose in practice);
    // hitting the cap means something is wrong — fail loudly.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"(last round: ${sig._1} edges)")

    // Converged star forest: every edge is (child, root). Components =
    // children plus the roots themselves (roots never appear on the u
    // side of a star edge).
    e.select(col("u").as("id"), col("v").as("comp"))
      .union(e.select(col("v").as("id"), col("v").as("comp")))
      .distinct()
  }

  /** Per-cluster summary over near-dup pairs: cluster_id = canonical
    * (minimum) member, member list sorted. The downstream curation step
    * is then a semi/anti join: keep id == cluster_id, drop the rest.
    */
  def duplicateClusters(pairs: DataFrame, aCol: String = "id_a",
                        bCol: String = "id_b"): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"),
           sort_array(collect_list(col("id"))).as("members"))

  /** Lineage truncation for the iterative loop: each round's plan embeds
    * the previous round's plan ~12× (sym, afterLarge and their aggregates
    * are each referenced several times), so WITHOUT truncation the
    * logical plan — and the analyzer's walk over it — grows exponentially
    * with rounds (round 9 of the spec's path graph took minutes before
    * aborting). Re-rooting the frame as a LogicalRDD leaf over the
    * about-to-be-persisted rows keeps every round's plan constant-size.
    * NOT localCheckpoint: its blocks are non-evictable and piled up
    * un-reclaimably across runs in round 1 — `df.rdd` over a persisted
    * frame reads the evictable cache instead (and merely recomputes
    * through normal lineage if evicted).
    */
  private def truncated(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** Order-independent edge-multiset signature: (count, sum of per-edge
    * hashes). Cheap convergence check that cannot confuse two
    * consecutive rounds' edge sets in practice; a collision would only
    * cost extra rounds' worth of work if it ended iteration early AND
    * the sets differed — with 64-bit hashes the chance is negligible,
    * and maxIter bounds the damage in either direction.
    */
  private def signature(e: DataFrame): (Long, String) = {
    // sum over decimal(38,0): ANSI-safe (a Long sum of 64-bit hashes
    // overflows almost immediately under Spark 4's exact arithmetic)
    val r = e.agg(count(lit(1)),
                  sum(xxhash64(col("u"), col("v"))
                    .cast("decimal(38,0)"))).head()
    (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toString)
  }
}
