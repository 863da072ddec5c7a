package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.cosineSim

/** Similarity search over an embedding column (north-star scope).
  *
  * Tiers, in the order a 100 TB pipeline escalates through them:
  *  1. brute-force top-k against one probe — a broadcast of the probe and
  *     one narrow scan pass; exact, O(n·d), the correctness baseline;
  *  2. LSH (random hyperplanes) — probe touches only its bucket:
  *     O(n/2^bits · d) per query at some recall cost;
  *  3. IVF (inverted file) — coarse quantizer assigns every vector to its
  *     nearest centroid ONCE (a write-time transform); queries scan only
  *     `nprobe` inverted lists. The assignment is a broadcast join against
  *     the centroid table, so building the index is one scan pass too.
  *
  * All cosine math runs through the codegen'd native expression
  * (graft.functions.CosineSimilarity) in double precision.
  */
object SimilarityOps {

  /** Higher-order-function cosine (portable formulation, used to
    * cross-check the native expression in tests).
    */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val ad = transform(a, _.cast("double"))
    val bd = transform(b, _.cast("double"))
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Exact brute-force top-k neighbours of one stored vector.
    * The probe row is collected once (1 row) and broadcast as a literal
    * cross-join side; Catalyst plans scan → project(cosine) →
    * TakeOrderedAndProject, i.e. a distributed top-k with no full sort.
    */
  def topKNeighbors(emb: DataFrame, idCol: String, vecCol: String,
                    probeId: Long, k: Int): DataFrame = {
    val probe = broadcast(
      emb.filter(col(idCol) === probeId).select(col(vecCol).as("__probe")))
    emb.filter(col(idCol) =!= probeId)
      .crossJoin(probe)
      .withColumn("sim", cosineSim(col(vecCol), col("__probe")))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("sim"), 6).as("sim"))
  }

  /** All-pairs cosine above a threshold. Quadratic by nature; kept exact
    * here (the oracle-checkable contract). The scale path for corpus-level
    * near-dup is `lshBuckets` + within-bucket pairs.
    */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                  tau: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cosineSim(col("va"), col("vb")))
      .filter(col("sim") >= tau)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** Random-hyperplane LSH signature: bit j = sign(v · h_j), with
    * hyperplane components h_j[i] ∈ {±1} derived from xxhash64(j, i) —
    * deterministic, no stored model. Returns an integer bucket id in
    * [0, 2^bits). One fused codegen'd pass over the vector
    * (graft.functions.LshBucket); the HOF formulation below is kept as
    * the cross-check twin.
    */
  def lshBucket(vec: Column, bits: Int): Column =
    graft.functions.VectorExpressions.lshBucket(vec, bits)

  /** Portable higher-order-function formulation of `lshBucket` — walks the
    * vector once per bit through intermediate arrays, so it's the slow
    * path; used in tests to pin the native expression's semantics.
    */
  def lshBucketHof(vec: Column, bits: Int): Column = {
    val withIdx = zip_with(
      transform(vec, _.cast("double")),
      sequence(lit(0), size(vec) - 1),
      (x, i) => struct(x.as("x"), i.as("i")))
    val bitCols = (0 until bits).map { j =>
      val s = aggregate(withIdx, lit(0.0), (acc, e) =>
        acc + e.getField("x") *
          when(pmod(xxhash64(lit(j), e.getField("i")), lit(2)) === 0,
               lit(1.0)).otherwise(lit(-1.0)))
      when(s > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** ANN top-k via LSH: probe only scans its own bucket. */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
              probeId: Long, k: Int, bits: Int = 6): DataFrame = {
    val bucketed = emb.withColumn("bucket", lshBucket(col(vecCol), bits))
    val probe = broadcast(
      bucketed.filter(col(idCol) === probeId)
        .select(col(vecCol).as("__probe"), col("bucket").as("__pbucket")))
    bucketed
      .join(probe, col("bucket") === col("__pbucket"))
      .filter(col(idCol) =!= probeId)
      .withColumn("sim", cosineSim(col(vecCol), col("__probe")))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("sim"), 6).as("sim"))
  }

  /** Embedding near-dup pairs, LSH-bucketed (the corpus-scale path for
    * cosinePairs): vectors pair only within an LSH bucket, so the join is
    * Σ bucket² instead of n². Random-hyperplane LSH preserves angle:
    * P(same b-bit bucket) = (1−θ/π)^b, so high-cosine pairs survive with
    * known probability and everything surfaced is exact-verified. Returns
    * the same schema/contract as cosinePairs minus LSH misses.
    */
  def lshCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                     tau: Double, bits: Int = 4): DataFrame = {
    val bucketed = emb.withColumn("bucket", lshBucket(col(vecCol), bits))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"),
                            col(vecCol).as("va"))
    val b = bucketed.select(col("bucket").as("bucket_b"),
                            col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
      .withColumn("sim", cosineSim(col("va"), col("vb")))
      .filter(col("sim") >= tau)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** IVF index build: pick `nlist` deterministic seed centroids (the
    * lowest-id vectors stand in for a k-means codebook — the plumbing, not
    * the training, is the engine's job), broadcast them, and assign every
    * vector to its nearest centroid. At scale this is the write-time pass
    * that turns a flat 100 TB embedding table into `nlist` inverted lists.
    */
  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String,
                nlist: Int): DataFrame = {
    val centroids = broadcast(
      emb.orderBy(col(idCol).asc).limit(nlist)
        .select(col(idCol).as("cid"), col(vecCol).as("cvec")))
    val w = Window.partitionBy(col(idCol)).orderBy(
      col("csim").desc, col("cid").asc)
    emb.crossJoin(centroids)
      .withColumn("csim", cosineSim(col(vecCol), col("cvec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col(vecCol), col("cid").as("list_id"))
  }

  /** IVF query: search the `nprobe` lists whose centroids are nearest the
    * probe, brute-force within them.
    */
  def ivfTopK(assigned: DataFrame, idCol: String, vecCol: String,
              probeId: Long, k: Int, nprobe: Int): DataFrame = {
    val probe = broadcast(
      assigned.filter(col(idCol) === probeId)
        .select(col(vecCol).as("__probe")))
    val centroids = assigned
      .join(assigned.select(col("list_id").as("lid")).distinct(),
            col(idCol) === col("lid"))
      .select(col("lid"), col(vecCol).as("cvec"))
    val targetLists = broadcast(
      centroids.crossJoin(probe)
        .withColumn("csim", cosineSim(col("cvec"), col("__probe")))
        .orderBy(col("csim").desc, col("lid").asc)
        .limit(nprobe)
        .select(col("lid")))
    assigned
      .join(targetLists, col("list_id") === col("lid"))
      .filter(col(idCol) =!= probeId)
      .crossJoin(probe)
      .withColumn("sim", cosineSim(col(vecCol), col("__probe")))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("sim"), 6).as("sim"))
  }
}
