package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's runtime data-quality gates as first-class values
  * (SURVEY.md §5 item 2). The reference `raise`s inside Airflow task
  * callables (dags/nyc_taxi_pipeline_dag.py:188-201); here a failed gate is
  * a `Left(QualityError)` so pipelines can compose checks without
  * exceptions-as-control-flow.
  *
  * Each check costs exactly one aggregation job over the frame; checks never
  * collect row data to the driver, only the already-scalar aggregate.
  */
final case class QualityError(check: String, detail: String)

object Quality {

  /** A1 — fail if the table is empty.
    * Ref: dags/nyc_taxi_pipeline_dag.py:188-192 ("No data found in table").
    */
  def requireNonEmpty(df: DataFrame): Either[QualityError, DataFrame] = {
    // limit(1) before the count: existence, not a full scan.
    val any = df.limit(1).count()
    if (any > 0) Right(df)
    else Left(QualityError("non_empty", "No data found in table!"))
  }

  /** A2/P8 — fail if any key column holds a NULL.
    * Ref: dags/nyc_taxi_pipeline_dag.py:195-201 ("rows with NULL values in
    * key fields").
    */
  def requireNoNulls(df: DataFrame,
                     cols: Seq[String]): Either[QualityError, DataFrame] = {
    require(cols.nonEmpty,
      "requireNoNulls: need at least one column (empty.reduce otherwise)")
    val anyNull = cols.map(c => col(c).isNull).reduce(_ || _)
    val bad = df.filter(anyNull).limit(1).count()
    if (bad == 0) Right(df)
    else Left(QualityError("no_nulls", s"NULL values in key fields: ${cols.mkString(",")}"))
  }

  /** One foreign-key constraint for [[Quality.referentialOrphans]]. */
  final case class FkConstraint(name: String, child: DataFrame,
                                childKey: String, parent: DataFrame,
                                parentKey: String)

  /** Referential-integrity audit (extension beyond the reference's null
    * gates): one row per FK constraint with the orphan census. SQL FK
    * semantics — a NULL child key asserts nothing (counted separately
    * as `null_keys`, never as an orphan).
    *
    * Scale: each constraint costs ONE pass over the child's key column
    * (narrow projection — key only, no payload): the DISTINCT parent
    * keyset carries a presence marker through a broadcast LEFT join (no
    * row multiplication — parents are distinct) and a single aggregate
    * reads child_rows / null_keys / orphan_rows together. Parent keysets
    * here are dimension-sized and explicitly broadcast; for a fact-sized
    * parent drop the broadcast hint and the same presence-marker LEFT
    * join degrades gracefully to a shuffled join on the key (still one
    * child pass). Output is one scalar row per constraint — nothing wide
    * ever leaves the executors.
    */
  def referentialOrphans(constraints: Seq[FkConstraint]): DataFrame = {
    require(constraints.nonEmpty, "referentialOrphans: no constraints")
    val per = constraints.map { fk =>
      val childKeys = fk.child.select(col(fk.childKey).as("__k"))
      // parents carry a presence marker through a broadcast LEFT join
      // (parents are distinct, so no row multiplication) and ONE
      // aggregate reads off rows / null keys / orphans together —
      // r11: the anti-join + separate base aggregate + crossJoin shape
      // scanned the child table TWICE per constraint and cost two extra
      // jobs each; one pass is strictly better at any scale, same rows.
      val parents = fk.parent.select(col(fk.parentKey).as("__k")).distinct()
        .withColumn("__hit", lit(1))
      childKeys.join(broadcast(parents), Seq("__k"), "left")
        .agg(count(lit(1)).as("child_rows"),
             // coalesce: sum over zero rows is NULL (the nullCensus rule)
             coalesce(sum(when(col("__k").isNull, 1L).otherwise(0L)),
                      lit(0L)).as("null_keys"),
             coalesce(sum(when(col("__k").isNotNull && col("__hit").isNull,
                               1L).otherwise(0L)), lit(0L))
               .as("orphan_rows"))
        .select(lit(fk.name).as("fk"), col("child_rows"), col("null_keys"),
                col("orphan_rows"), (col("orphan_rows") === 0L).as("ok"))
    }
    per.reduce(_.unionByName(_))
  }

  /** Distribution-shift report (day-2 drift monitoring): compare how a
    * weight is distributed over a dimension in two snapshots. Emits one
    * row per dimension value with both shares and that value's
    * contribution to the Jensen–Shannon divergence (base-2 bits;
    * the per-value terms sum to the total JSD, which is bounded in
    * [0, 1] — alarm thresholds are portable across dimensions). JSD
    * over KL because it is symmetric and finite when a value exists in
    * only one snapshot (KL would be infinite there, which is exactly
    * the novel-category case a drift monitor must survive).
    *
    * Scale: each snapshot reduces to one |dim|-row aggregate
    * (map-side-combined); totals fold as one-row cross joins; the
    * full-outer join runs over |dim| rows. Nothing is ever shuffled at
    * corpus volume beyond the two aggregates.
    */
  def distributionShift(a: DataFrame, b: DataFrame, dim: String,
                        weight: Column): DataFrame = {
    def shares(df: DataFrame, share: String): DataFrame = {
      val g = df.groupBy(col(dim)).agg(weight.cast("double").as("__w"))
      val tot = g.agg(sum(col("__w")).as("__t"))
      g.crossJoin(broadcast(tot))
        .select(col(dim), (col("__w") / col("__t")).as(share))
    }
    val pa = shares(a, "share_a")
    val pb = shares(b, "share_b")
    // 0·log(0) := 0 — a value absent from one snapshot contributes only
    // through the other side's term (JSD's finiteness guarantee)
    def term(p: Column, m: Column): Column =
      when(p > 0d, p * log2(p / m) * 0.5).otherwise(lit(0d))
    // null-SAFE key: a null dimension value is one real category, and
    // a plain equi-join would never match the two sides' null groups —
    // two rows whose js_bits sum to (share_a+share_b)/2 bits for a
    // possibly-unchanged distribution (a drift monitor firing on
    // stability); the oracle twin joins IS NOT DISTINCT FROM. Explicit
    // aliases: both snapshots usually derive from ONE source frame, and
    // dataframe-column references trip the ambiguous-self-join check
    pa.as("__pa").join(pb.as("__pb"),
        col(s"__pa.$dim") <=> col(s"__pb.$dim"), "full_outer")
      .select(coalesce(col(s"__pa.$dim"), col(s"__pb.$dim")).as(dim),
              coalesce(col("share_a"), lit(0d)).as("share_a"),
              coalesce(col("share_b"), lit(0d)).as("share_b"))
      .withColumn("__m",
        (col("share_a") + col("share_b")) / 2d)
      .select(col(dim),
              round(col("share_a"), 6).as("share_a"),
              round(col("share_b"), 6).as("share_b"),
              round(term(col("share_a"), col("__m")) +
                    term(col("share_b"), col("__m")), 6).as("js_bits"))
  }

  /** A3 — warn-level null census; never fails (the reference only logs it,
    * dags/nyc_taxi_pipeline_dag.py:95-96). Returns (columnName -> nullCount).
    */
  def nullCensus(df: DataFrame): Map[String, Long] = {
    // coalesce: sum() over ZERO rows is NULL, and getLong on it throws —
    // the census must return all-zeros on an empty table, which is
    // exactly when a quality check is most likely to be consulted
    val exprs = df.columns.map(c =>
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(c))
    val row = df.agg(exprs.head, exprs.tail: _*).head()
    df.columns.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
  }

  /** A declarative data-contract check (the Deequ/Great-Expectations
    * staple). Row-local predicates and uniqueness all evaluate in ONE
    * aggregate pass over the frame — k checks cost one scan, not k —
    * then unpivot to one report row per check (the `profile` shape).
    * Violation semantics are prove-it: a NULL value can only violate
    * `NotNull` (a range/regex/set check on NULL asserts nothing —
    * compose with NotNull when absence itself is the defect), matching
    * SQL CHECK-constraint semantics. `Unique` counts the surplus among
    * fully-non-null key tuples (count − countDistinct), SQL UNIQUE
    * semantics where null keys don't collide. Referential checks live
    * in [[referentialOrphans]] (they need a second frame).
    */
  sealed trait Expectation
  object Expectation {
    final case class NotNull(column: String) extends Expectation
    final case class Unique(columns: Seq[String]) extends Expectation
    final case class InRange(column: String, lo: Double, hi: Double)
        extends Expectation
    final case class Matches(column: String, regex: String)
        extends Expectation
    final case class InSet(column: String, values: Seq[String])
        extends Expectation
  }

  def expectations(df: DataFrame,
                   checks: Seq[Expectation]): DataFrame = {
    import Expectation._
    require(checks.nonEmpty, "expectations: no checks given")
    require(checks.forall {
      case Unique(cs) => cs.nonEmpty
      case _ => true
    }, "expectations: Unique needs at least one column")
    def violations(cond: Column): Column =
      coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L))
    val labeled = checks.zipWithIndex.map {
      case (NotNull(c), i) =>
        ("not_null", c, violations(col(c).isNull).as(s"__e$i"))
      case (Unique(cs), i) =>
        val allSet = cs.map(col(_).isNotNull).reduce(_ && _)
        ("unique", cs.mkString("+"),
         (violations(allSet) -
           coalesce(countDistinct(cs.head, cs.tail: _*), lit(0L)))
           .as(s"__e$i"))
      case (InRange(c, lo, hi), i) =>
        ("in_range", c,
         violations(col(c).isNotNull &&
           (col(c) < lo || col(c) > hi)).as(s"__e$i"))
      case (Matches(c, re), i) =>
        ("matches", c,
         violations(col(c).isNotNull && !col(c).rlike(re)).as(s"__e$i"))
      case (InSet(c, vs), i) =>
        ("in_set", c,
         violations(col(c).isNotNull &&
           !col(c).isin(vs: _*)).as(s"__e$i"))
    }
    val one = df.agg(count(lit(1)).as("__n"), labeled.map(_._3): _*)
    def sq(s: String) = "'" + s.replace("'", "''") + "'"
    val stackArgs = labeled.zipWithIndex.map { case ((lbl, tgt, _), i) =>
      s"${sq(lbl)}, ${sq(tgt)}, `__e$i`"
    }.mkString(", ")
    one.select(
      expr(s"stack(${checks.size}, $stackArgs) AS " +
           "(check_name, target, n_violations)"),
      col("__n").as("n_rows"))
      .select(col("check_name"), col("target"), col("n_rows"),
              col("n_violations"),
              (col("n_violations") === 0L).as("passed"))
  }
  /** Population Stability Index between two snapshots of a numeric
    * column — the standard distribution-drift monitor a day-2 pipeline
    * runs per feature per refresh (PSI < 0.1 stable, 0.1–0.25 drifting,
    * > 0.25 shifted; the credit-scoring rule of thumb). Fixed-width
    * bins [0, binWidth·numBins) with a clamped overflow/underflow bin at
    * each end of the id range (bin = clamp(floor(v/w), 0, numBins)), so
    * the binning is engine-portable with no quantile estimation; add-one
    * (Laplace) smoothing keeps empty bins finite on BOTH sides, making
    * psi total and deterministic rather than undefined when a bin dies
    * between snapshots. One row per bin: counts, smoothed shares, and
    * the psi contribution (rounded 1e-6); Σ psi_contrib is the index.
    *
    * Scale shape: each side is one partial+final count aggregate over
    * ≤ numBins+1 keys (map-side combined); the bin spine and the two
    * total counts fold in as broadcasts; nothing row-sized survives the
    * first aggregate.
    */
  def psiDrift(base: DataFrame, current: DataFrame, valueCol: String,
               binWidth: Double = 10.0, numBins: Int = 10): DataFrame = {
    require(binWidth > 0 && numBins >= 1, "binWidth > 0, numBins >= 1")
    val spark = base.sparkSession
    def binned(df: DataFrame, n: String) = df
      .filter(col(valueCol).isNotNull)
      .select(least(greatest(floor(col(valueCol) / binWidth), lit(0)),
                    lit(numBins)).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(n))
    val spine = spark.range(0, numBins + 1L)
      .select(col("id").cast("int").as("bin"))
    val joined = spine
      .join(binned(base, "n_base"), Seq("bin"), "left_outer")
      .join(binned(current, "n_cur"), Seq("bin"), "left_outer")
      .select(col("bin"),
              coalesce(col("n_base"), lit(0L)).as("n_base"),
              coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum(col("n_base")).as("__tb"),
                            sum(col("n_cur")).as("__tc"))
    val k = lit(numBins + 1.0)
    joined.crossJoin(broadcast(totals))
      .withColumn("p_base",
        (col("n_base") + lit(1.0)) / (col("__tb") + k))
      .withColumn("p_cur",
        (col("n_cur") + lit(1.0)) / (col("__tc") + k))
      .select(col("bin"), col("n_base"), col("n_cur"),
              round(col("p_base"), 6).as("p_base"),
              round(col("p_cur"), 6).as("p_cur"),
              round((col("p_cur") - col("p_base")) *
                log(col("p_cur") / col("p_base")), 6).as("psi_contrib"))
  }
}
