package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bloom-filter primitives for large-set membership screens.
  *
  * The broadcast-membership ops elsewhere in the engine
  * (contaminationStream's sorted-array fold, the IVF codebook fold) pay
  * 8 bytes per element — perfect for eval suites, impossible when the
  * reference set is itself corpus-sized (corpus-vs-corpus
  * decontamination, URL/doc blocklists at web scale: 10⁹ grams = 8 GB
  * exact vs ~1.2 GB of Bloom bits at ~1% fpp). A Bloom screen has NO
  * false negatives, so an exact verify pass over the (tiny) surviving
  * candidate set restores exactness — the screen's only job is to keep
  * 99.x% of the corpus out of the expensive exact join.
  *
  * One filter layout shared by build and probe: `numBits` bits in
  * ⌈numBits/64⌉ longs; element hash h probes k bit positions via
  * Kirsch–Mitzenmacher double hashing (h + i·h₂ with h₂ = fmix64(h)|1 —
  * two independent-enough streams from ONE 64-bit hash, the standard
  * construction). Both sides call the same static helpers below, so the
  * aggregate and the probe can never drift.
  */
object BloomExpressions {
  /** Aggregate: OR-fold long hashes into a `numBits`-bit Bloom filter
    * (array<bigint> of bit words). Map-side partials are each a bitset,
    * merged by bitwise OR — one filter per group lands on the driver
    * side of the agg, never the elements.
    */
  def bloomAgg(hashes: Column, numBits: Long, k: Int): Column =
    Bridge.toColumn(BloomFilterAgg(Bridge.toExpression(hashes), numBits, k)
      .toAggregateExpression())

  /** Count of `hashes` elements whose k probe bits are ALL set in
    * `words` — the per-doc candidate test (≥ minShared gates a doc into
    * the exact verify join). Superset-of-truth by construction.
    */
  def bloomHitCount(hashes: Column, words: Column, k: Int): Column =
    Bridge.toColumn(BloomHitCount(
      Bridge.toExpression(hashes), Bridge.toExpression(words), k))

  /** Sharded probe: `shards` is S bitsets (array-of-arrays, index =
    * shard id); element h tests ONLY shard pmod(h, S) — the build side
    * partitions elements the same way, so each sub-filter stays inside
    * the single-buffer serialization bound and total capacity scales to
    * S × Bloom.MaxWords·64 bits (~10¹¹ grams at 64 shards, 10
    * bits/gram). fpp is unchanged when shards are sized per their
    * element share (uniform under pmod of a good hash).
    */
  def bloomHitCountSharded(hashes: Column, shards: Column,
                           k: Int): Column =
    Bridge.toColumn(BloomHitCountSharded(
      Bridge.toExpression(hashes), Bridge.toExpression(shards), k))
}

/** Static probe/insert logic — the single source of truth for the bit
  * layout, called from interpreted eval AND generated code (the
  * generated call stays inside whole-stage codegen; there is no
  * per-element virtual dispatch beyond one static invoke).
  */
object Bloom {
  /** murmur3 fmix64 finalizer: decorrelates the second probe stream
    * from the raw hash.
    */
  def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33; h
  }

  /** Set element h's k probe bits in `words` (numBits = words.length·64). */
  def insert(words: Array[Long], h: Long, k: Int): Unit = {
    val numBits = words.length.toLong * 64L
    val h2 = fmix64(h) | 1L
    var i = 0
    while (i < k) {
      val idx = ((h + i.toLong * h2) & Long.MaxValue) % numBits
      words((idx >>> 6).toInt) |= 1L << (idx & 63L)
      i += 1
    }
  }

  /** True iff ALL k probe bits for h are set. */
  def contains(words: ArrayData, h: Long, k: Int): Boolean = {
    val numBits = words.numElements().toLong * 64L
    val h2 = fmix64(h) | 1L
    var i = 0
    while (i < k) {
      val idx = ((h + i.toLong * h2) & Long.MaxValue) % numBits
      if ((words.getLong((idx >>> 6).toInt) & (1L << (idx & 63L))) == 0L)
        return false
      i += 1
    }
    true
  }

  /** Sharded twin of `hitCount`: element h probes only sub-filter
    * pmod(h, S). The shard selector MUST match the build-side
    * partitioner (DedupOps.shardOf / pmod(hash, S)).
    */
  def hitCountSharded(hashes: ArrayData, shards: ArrayData, k: Int): Int = {
    val s = shards.numElements()
    val n = hashes.numElements()
    var i = 0; var c = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        // pmod: Java % is negative for negative h
        val shard = ((h % s) + s) % s
        if (contains(shards.getArray(shard.toInt), h, k)) c += 1
      }
      i += 1
    }
    c
  }

  /** #elements of `hashes` contained in the filter (null slots skipped —
    * a null hash is no element, not element 0).
    */
  def hitCount(hashes: ArrayData, words: ArrayData, k: Int): Int = {
    val n = hashes.numElements()
    var i = 0; var c = 0
    while (i < n) {
      if (!hashes.isNullAt(i) && contains(words, hashes.getLong(i), k))
        c += 1
      i += 1
    }
    c
  }

  /** long[] <-> packed bytes, shared by both sketch aggregates'
    * partial→final serialization (one definition, one overflow check).
    */
  val MaxWords: Int = Int.MaxValue / 8 // ByteBuffer.allocate is Int-sized

  def toBytes(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }
}

/** OR-fold of long hashes into one Bloom bitset per group. The buffer is
  * a primitive long[words] mutated in place; partial→final shuffle ships
  * the packed words. Null inputs are skipped (SUM-style); an input-less
  * group still evaluates to the EMPTY filter (all zeros) — membership
  * over it is all-false, which is the right screen semantics for an
  * empty reference set.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Long,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  // bound where the SERIALIZED form still fits a ByteBuffer (Int-sized):
  // a filter any bigger would pass construction and then die in the
  // partial->final shuffle
  require(numBits / 64 <= Bloom.MaxWords.toLong,
    s"numBits $numBits exceeds the serializable bitset size " +
      s"(${Bloom.MaxWords.toLong * 64} bits)")
  require(k >= 1 && k <= 32, s"k must be in [1, 32], got $k")

  private def nWords: Int = (numBits / 64).toInt

  override def prettyName: String = "bloom_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case LongType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires bigint input, got ${other.catalogString}")
    }
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.insert(buffer, v.asInstanceOf[Long], k)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    Bloom.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Bloom.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): BloomFilterAgg =
    copy(child = c)
}

/** #elements of the left (array<bigint> hashes) whose k probe bits are
  * all set in the right (array<bigint> Bloom words). Codegen emits one
  * static call — no per-row interpretation.
  */
case class BloomHitCount(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 1 && k <= 32, s"k must be in [1, 32], got $k")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bloom_hit_count"
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      // hashes side: null slots are legal (skipped = "no element");
      // words side: only a complete bitset is a valid filter —
      // Bloom.contains reads words.getLong(i) unchecked, and
      // ArrayData.getLong on a null slot silently yields garbage, so a
      // hand-built array<bigint> with nulls must be rejected at analysis
      // (the sketch aggregates' output is containsNull=false already)
      case (ArrayType(LongType, _), ArrayType(LongType, false)) =>
        TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, true)) =>
        TypeCheckFailure(s"$prettyName filter argument must be " +
          "array<bigint> without nulls (use bloom_agg output)")
      case _ =>
        TypeCheckFailure(s"$prettyName requires (array<bigint> hashes, " +
          s"array<bigint> filter words), got ${left.dataType.catalogString}" +
          s", ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    Bloom.hitCount(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Bloom.hitCount($a, $b, $k);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomHitCount = copy(l, r)
}

/** Sharded membership count: the right side is S complete bitsets
  * (array<array<bigint>>, outer index = shard id); element h probes only
  * sub-filter pmod(h, S). Lifts `BloomFilterAgg`'s single-ByteBuffer
  * serialization ceiling to S× while keeping one codegen'd static call
  * per row. Both levels must be containsNull=false — a null shard or a
  * null word slot would read garbage bits (the BloomHitCount argument).
  */
case class BloomHitCountSharded(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 1 && k <= 32, s"k must be in [1, 32], got $k")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bloom_hit_count_sharded"
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _),
            ArrayType(ArrayType(LongType, false), false)) =>
        TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckFailure(s"$prettyName shards argument must be " +
          "array<array<bigint>> without nulls at either level")
      case _ =>
        TypeCheckFailure(s"$prettyName requires (array<bigint> hashes, " +
          s"array<array<bigint>> shards), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    Bloom.hitCountSharded(l.asInstanceOf[ArrayData],
                          r.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Bloom.hitCountSharded($a, $b, $k);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomHitCountSharded = copy(l, r)
}
