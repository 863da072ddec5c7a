package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's deterministic-hash policy, in ONE place.
  *
  * Every RNG-free coin in the engine — content fingerprints, seeded
  * shuffle-order keys, rate-sampling bytes, train/val/test arms, DSIR
  * feature buckets, line-dedup keys — derives from a content hash. Two
  * interchangeable modes:
  *
  *  - [[Hashing.OraclePortable]] (default): md5 hex strings. Byte-
  *    identical in Spark and DuckDB, so every coin-consuming operator
  *    stays oracle-checkable end-to-end. The cost is real: md5 is a
  *    cryptographic hash materializing a 32-char string per doc/line/
  *    coin — at 100 TB that is the single largest avoidable constant
  *    factor on the hottest paths.
  *  - [[Hashing.Production]]: xxhash64 (Spark-native, codegen'd, one
  *    64-bit word, no string materialization; the same public XXH64
  *    algorithm Spark uses for shuffle hashing). Identical operator
  *    semantics — deterministic, re-derivable, uniform — but a
  *    DIFFERENT permutation/assignment than md5 mode, and not
  *    expressible in the DuckDB oracle (hence not the default; the
  *    correctness suite pins md5-mode results, and mode-equivalence
  *    specs pin that production mode preserves each operator's
  *    CONTRACT rather than its exact output).
  *
  * Null contract (both modes): a null input has NO coin — every helper
  * returns null for null input, so samplers/splitters drop or
  * null-assign rather than silently concentrating null rows in one
  * arm. md5 gives this for free; xxhash64 does NOT (Spark's hash
  * functions skip null children and return a seed-derived constant),
  * so the production paths guard explicitly.
  *
  * Collision note: 64-bit keys birthday-collide around ~5·10⁹ distinct
  * values. Where the hash is an internal GROUPING key whose collision
  * would merge distinct content (fingerprints, line-dedup keys), the
  * production fingerprint therefore concatenates two independently-
  * seeded xxhash64 words (128 bits, collision-free at any realistic
  * corpus size — the same width md5 provides). Where the hash is only
  * an ORDER/RATE coin (shuffle keys, sampling bytes), collisions cost
  * nothing (ties break on id) and a single word is used.
  */
object Hashing {

  sealed trait Mode
  /** md5 hex — DuckDB-oracle-checkable; the correctness-suite default. */
  case object OraclePortable extends Mode
  /** xxhash64 — production scale path; same contracts, different coins. */
  case object Production extends Mode

  private def nullGuard(in: Column, out: Column): Column =
    when(in.isNull, lit(null)).otherwise(out)

  /** 128-bit content fingerprint as a fixed-width hex string (32 chars
    * in both modes, so schemas and downstream string ops are
    * mode-independent). Identity key for exact dedup.
    */
  def fingerprint(text: Column, mode: Mode = OraclePortable): Column =
    mode match {
      case OraclePortable => md5(text)
      case Production => nullGuard(text,
        concat(lpad(lower(hex(xxhash64(text))), 16, "0"),
               lpad(lower(hex(xxhash64(text, lit(1)))), 16, "0")))
    }

  /** Seeded order coin: the sort key of the deterministic permutation
    * (epoch reshuffles, sampling order). STRING in md5 mode, LONG in
    * production mode — only ever used as a sort/range-partition key
    * with an id tie-break, so the type difference is invisible to
    * consumers.
    */
  def orderCoin(seed: String, id: Column, mode: Mode): Column = mode match {
    case OraclePortable =>
      md5(concat_ws("|", lit(seed), id.cast("string")))
    case Production => xxhash64(lit(seed), id)
  }

  /** Uniform sampling byte in [0, 256) from the content; null text →
    * null (no coin).
    */
  def hashByte(text: Column, mode: Mode = OraclePortable): Column =
    mode match {
      case OraclePortable =>
        // ≡ conv(substring(md5(text),1,2),16,10).cast("int") — the first
        // digest byte — without the hex-string/substring/conv allocations
        // (Md5ExpressionsSpec pins bit-equality; null → null either way)
        shiftright(graft.functions.Md5Ops.md5Prefix16(text), 8).cast("int")
      case Production =>
        nullGuard(text, pmod(xxhash64(text), lit(256L)).cast("int"))
    }

  /** Deterministic 14:1:1 train/val/test arm from the content hash;
    * null text → null arm.
    */
  def splitArm(text: Column, mode: Mode = OraclePortable): Column =
    mode match {
      case OraclePortable =>
        // first hex digit of md5 = first digest nibble: '0'..'9','a'..'f'
        // order IS nibble order, so h < 'e' ⇔ nibble < 14, h = 'e' ⇔ 14
        // (Md5ExpressionsSpec pins arm equality; null → null either way)
        val nib = shiftright(graft.functions.Md5Ops.md5Prefix16(text), 12)
        when(nib < 14, "train").when(nib === 14, "val")
          .when(nib.isNotNull, "test")
      case Production =>
        val a = pmod(xxhash64(text), lit(16L))
        nullGuard(text,
          when(a < 14L, "train").when(a === 14L, "val").otherwise("test"))
    }

  /** Unseeded per-id coin (stratified-sample order): the id's content
    * hash with no seed prefix — kept distinct from `orderCoin` so the
    * md5-mode bytes match the established oracle SQL exactly.
    */
  def idCoin(id: Column, mode: Mode): Column = mode match {
    case OraclePortable => md5(id.cast("string"))
    case Production => xxhash64(id)
  }

  /** Feature-hash bucket in [0, dim) (DSIR's hashed n-grams). */
  def bucket(c: Column, dim: Int, mode: Mode): Column = mode match {
    case OraclePortable =>
      // ≡ pmod(conv(substring(md5(c),1,4),16,10), dim): the conv value
      // IS the first two digest bytes (∈ [0,65535], so pmod = %); this
      // runs per GRAM on the DSIR/classifier paths — the one md5 coin
      // that is hot enough for the hex-string allocations to matter
      // (Md5ExpressionsSpec pins bit-equality)
      pmod(graft.functions.Md5Ops.md5Prefix16(c), lit(dim.toLong))
    case Production => nullGuard(c, pmod(xxhash64(c), lit(dim.toLong)))
  }
}
