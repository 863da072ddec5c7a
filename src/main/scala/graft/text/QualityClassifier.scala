package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Model-based document quality filtering: distill a cheap labeling
  * signal into a linear classifier over hashed bag-of-words features and
  * score the whole corpus with it — the fastText-classifier recipe
  * behind GPT-3/LLaMA-style "looks like the reference corpus" filters
  * and FineWeb-Edu's distilled educational-quality gate (label a small
  * slice expensively, train a tiny model, filter 100 TB cheaply).
  *
  * Spark-native full-batch logistic regression:
  *   - Features are sparse (doc, bucket, x) triples — hashing-trick
  *     token counts, L1-normalized per document. The corpus never
  *     densifies; a document costs O(distinct tokens) rows.
  *   - The weight vector lives on the driver (dim+1 doubles, bias as
  *     bucket=dim) and folds into each iteration's expressions as ONE
  *     array literal — the IVF codebook-fold pattern — so the margin
  *     pass is a narrow projection + one partial+final aggregate, no
  *     join against a weight table.
  *   - The gradient is the only other aggregate: triples ⋈ residuals
  *     co-partitioned on the doc id (both sides hash-partitioned by the
  *     same column, no extra exchange), then a bucket-keyed sum whose
  *     output is ≤ dim+1 rows — the one collect, size-gated by
  *     construction.
  * Full-batch GD (not SGD) keeps training RNG-free and deterministic:
  * same data → same model, re-derivable anywhere. Each iteration is two
  * scans of the persisted triples; dim and iters are both small
  * constants, so training cost is O(iters · corpus tokens) with O(dim)
  * driver state — the part that must be tiny at 100 TB.
  */
object QualityClassifier {

  /** Hashed bag-of-words features as sparse triples (id, bucket, x):
    * `Hashing.bucket` token hash mod dim (md5-prefix in the
    * oracle-portable default — identical in DuckDB, which is what makes
    * the full GD loop hash-exact against its unrolled-CTE twin;
    * xxhash64 in Production), counts L1-normalized per document (the
    * per-doc window partitions on the doc id — a bounded group, at most
    * dim rows). Lowercased whitespace tokens, the TextOps contract.
    */
  def hashedFeatures(df: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", dim: Int = 256,
                     mode: Hashing.Mode = Hashing.OraclePortable)
      : DataFrame = {
    require(dim >= 2, s"dim must be >= 2 (got $dim)")
    val w = Window.partitionBy(col(idCol))
    // NOT spreadSmallScan'd: same allocation-bound-explode finding as
    // TextOps.bigramPairs (r11) — splitting the scan inflated task time
    // with no wall win in the shared local-mode heap
    df.select(col(idCol),
              explode(TextOps.tokens(lower(col(textCol)))).as("__term"))
      .select(col(idCol),
              Hashing.bucket(col("__term"), dim, mode).cast("int")
                .as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).cast("double").as("__cnt"))
      .withColumn("x", col("__cnt") / sum(col("__cnt")).over(w))
      .drop("__cnt")
  }

  /** Train by full-batch gradient descent on log-loss:
    *   w ← w − lr · Xᵀ(σ(Xw) − y) / n
    * `labels` is (idCol, labelCol ∈ {0.0, 1.0}); only labeled documents
    * with ≥ 1 token train (the inner join — a doc with no tokens has no
    * features and cannot move any weight). A per-doc bias feature
    * (bucket = dim, x = 1) rides the same triples frame, so the bias
    * trains through the identical two-aggregate path with no special
    * case. Returns dim+1 weights, w(dim) = bias.
    *
    * CACHE OWNERSHIP: the triples pin is scoped here — released before
    * returning (the CacheScope contract would outlive the loop; training
    * is the only consumer).
    */
  def train(df: DataFrame, labels: DataFrame, idCol: String = "doc_id",
            textCol: String = "text", labelCol: String = "y",
            dim: Int = 256, iters: Int = 10, lr: Double = 2.0,
            mode: Hashing.Mode = Hashing.OraclePortable,
            gate: Long = DriverTrainGate)
      : Array[Double] = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    val lab = labels.select(col(idCol), col(labelCol).cast("double").as("y"))
      .filter(col("y").isNotNull)
    // featurize ONLY the labeled slice: the inner join below would drop
    // unlabeled docs anyway, but Catalyst cannot push that join under
    // hashedFeatures' aggregate + window — without this semi-join the
    // distill recipe ("label a small slice, filter 100 TB cheaply")
    // paid a full-corpus tokenize/shuffle to keep the sliver
    val labeled = df.join(lab.select(col(idCol)), Seq(idCol), "left_semi")
    val feats = hashedFeatures(labeled, idCol, textCol, dim, mode)
    val ids = feats.select(col(idCol)).distinct()
    val bias = ids.select(col(idCol), lit(dim).as("bucket"), lit(1.0).as("x"))
    val f = feats.unionByName(bias).join(lab, idCol)
      .repartition(col(idCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // TWO REGIMES, the pqTrain precedent: the labeled slice is SMALL
      // BY DESIGN (the whole distill premise — label a small slice
      // expensively, train a tiny model, filter 100 TB cheaply), so a
      // triples frame at or below the gate collects once and runs the
      // GD on the driver — one action replaces iters × (window + agg +
      // collect) scheduled rounds (measured: q_quality_classifier's 8
      // iteration stages dominated its wall). Same arithmetic, same
      // 1e-9 grid; DriverGdSpec-style equivalence pinned in
      // QualityClassifierSpec. Above the gate the distributed loop
      // below runs unchanged.
      if (f.count() <= gate) trainDriver(f, idCol, dim, iters, lr)
      else trainDistributed(f, idCol, dim, iters, lr)
    } finally f.unpersist()
  }

  /** Triples gate for the driver GD regime (rows of (id, bucket, x, y);
    * 1M triples ≈ tens of MB of driver heap — the size-gated-collect
    * discipline). A distill pipeline's labeled slice sits far below it
    * at any corpus scale; the distributed loop serves the rest.
    */
  val DriverTrainGate: Long = 1L << 20

  /** The shared 1e-9 weight grid both regimes round onto after every
    * iteration (BigDecimal.valueOf = Spark round()'s shortest-decimal
    * HALF_UP semantics) — ONE definition so the regimes and the
    * unrolled-CTE oracle can never drift apart on the grid. The spec's
    * scalar replica keeps its own copy on purpose: it is the
    * independent pin.
    */
  private def grid9(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Driver regime of `train`: ONE collect of the cached triples, then
    * the identical GD arithmetic (margins as per-doc sums, gradient by
    * bucket, the shared 1e-9 weight grid) as a scalar loop — sum-order
    * ulps vs the distributed window/aggregate are absorbed by the grid,
    * exactly the property the unrolled-CTE oracle already relies on.
    */
  private def trainDriver(f: DataFrame, idCol: String, dim: Int,
                          iters: Int, lr: Double): Array[Double] = {
    val byDoc = f.select(col(idCol), col("bucket").cast("int"),
                         col("x").cast("double"), col("y").cast("double"))
      .collect()
      .groupBy(_.get(0)).values.toArray
    val n = byDoc.length.toDouble
    require(n > 0, "no labeled documents with tokens to train on")
    var w = Array.fill(dim + 1)(0.0)
    for (_ <- 0 until iters) {
      val g = new Array[Double](dim + 1)
      byDoc.foreach { ts =>
        var m = 0.0
        ts.foreach(r => m += r.getDouble(2) * w(r.getInt(1)))
        val res = 1.0 / (1.0 + math.exp(-m)) - ts.head.getDouble(3)
        ts.foreach(r => g(r.getInt(1)) += r.getDouble(2) * res)
      }
      w = Array.tabulate(dim + 1)(b => grid9(w(b) - lr * g(b) / n))
    }
    w
  }

  /** Distributed regime of `train` — `private[graft]` so the spec can
    * pin driver ≡ distributed without a gate-sized fixture.
    */
  private[graft] def trainDistributed(f: DataFrame, idCol: String,
                                      dim: Int, iters: Int,
                                      lr: Double): Array[Double] = {
    val n = f.select(col(idCol)).distinct().count().toDouble
    require(n > 0, "no labeled documents with tokens to train on")
    var w = Array.fill(dim + 1)(0.0)
    // ONE pass over the cached triples per iteration: the doc margin
    // is a whole-partition window sum (f is hash-partitioned by id,
    // so the window plans with NO exchange), the residual projects
    // per row (every row of a doc carries its y), and the gradient
    // aggregates by bucket. The groupBy-margin + join-back
    // formulation read the cache twice per iteration and paid a join
    // — measured as 8 near-identical stages dominating
    // q_quality_classifier.
    val byId = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
    for (_ <- 0 until iters) {
      val grad = f
        .withColumn("m",
          sum(col("x") * element_at(lit(w), col("bucket") + 1))
            .over(byId))
        .withColumn("r",
          lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y"))
        .groupBy(col("bucket"))
        .agg(sum(col("x") * col("r")).as("g"))
        .collect() // ≤ dim+1 rows by construction
      val next = w.clone()
      grad.foreach { row =>
        val b = row.getInt(0)
        next(b) -= lr * row.getDouble(1) / n
      }
      // shared decimal grid (scale 9), the iterative-oracle recipe:
      // per-iteration rounding absorbs engine/aggregation-order ulps
      // (Java vs DuckDB exp(), window-sum order) so the unrolled-CTE
      // twin stays hash-exact; 1e-9 is noise three orders below the
      // 1e-6 score grid.
      w = next.map(grid9)
    }
    w
  }

  /** Deterministic fingerprint of a trained model: a 64-bit fold of
    * the weights on a 1e-6 grid (the same grid `score` rounds to).
    * Full-batch GD is RNG-free, so the same data trains the same model
    * and the same checksum — the board query carries it as a constant
    * column, and QualityClassifierSpec pins it against an independent
    * scalar reimplementation of the GD loop, so the fingerprint ties
    * the served scores to VERIFIED coefficients rather than "some
    * iterative internals". (The grid absorbs aggregation-order ulps;
    * bit-level determinism within a session is separately spec-pinned.)
    */
  def checksum(model: Array[Double]): Long = {
    var h = 0x9E3779B97F4A7C15L ^ model.length.toLong
    model.foreach { v =>
      val q = math.rint(v * 1e6).toLong
      h = java.lang.Long.rotateLeft(
        h ^ (q * 0xC2B2AE3D27D4EB4FL), 31) * 0x9E3779B97F4A7C15L
    }
    h
  }

  /** Score every document: p = σ(w·x + bias), rounded to 1e-6. The
    * model folds in as one array literal (no join); documents with no
    * tokens have no features and drop out — the lmScore contract.
    */
  def score(df: DataFrame, model: Array[Double],
            idCol: String = "doc_id", textCol: String = "text",
            mode: Hashing.Mode = Hashing.OraclePortable)
      : DataFrame = {
    val dim = model.length - 1
    hashedFeatures(df, idCol, textCol, dim, mode)
      .groupBy(col(idCol))
      .agg(sum(col("x") * element_at(lit(model), col("bucket") + 1))
             .as("__m"))
      .select(col(idCol),
              round(lit(1.0) /
                (lit(1.0) + exp(-(col("__m") + lit(model(dim))))), 6)
                .as("p_good"))
  }

  /** Mean log-loss of a model over labeled documents (the training
    * objective; monotone-decrease is the spec-level convergence check).
    */
  def logLoss(df: DataFrame, labels: DataFrame, model: Array[Double],
              idCol: String = "doc_id", textCol: String = "text",
              labelCol: String = "y",
              mode: Hashing.Mode = Hashing.OraclePortable): Double = {
    val lab = labels.select(col(idCol), col(labelCol).cast("double").as("y"))
    val eps = 1e-12
    // mode must thread through (a Production-trained model scored in
    // OraclePortable buckets yields a meaningless loss, silently)
    score(df, model, idCol, textCol, mode).join(lab, idCol)
      .select(avg(-(col("y") * log(greatest(col("p_good"), lit(eps))) +
        (lit(1.0) - col("y")) *
          log(greatest(lit(1.0) - col("p_good"), lit(eps))))).as("l"))
      .head().getDouble(0)
  }
}
