package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compression-based text quality signal: the deflate length of a
  * document's UTF-8 bytes. ratio = deflate_len/octet_length is the
  * standard machine-generated/boilerplate filter of the web-corpus
  * recipes (near-0 → pathological repetition, near-1 → high entropy:
  * binary junk, base64 blobs, random tokens) — a repetition detector
  * that, unlike n-gram censuses, catches long-period and structural
  * repeats too.
  *
  * Scale: one native expression inside whole-stage codegen; the Deflater
  * (native zlib state) and output buffer are THREAD-LOCAL and reset per
  * row, so the per-row cost is the deflate itself, not allocation —
  * the same amortization a mapPartitions decoder would get, without
  * leaving the codegen'd projection. Output length is counted, never
  * materialized.
  */
object CompressExpressions {

  private val deflaters = new ThreadLocal[Deflater] {
    // raw deflate (nowrap): the 2-byte zlib header/adler trailer are
    // per-stream constants, not signal
    //
    // LIFETIME: instances are never end()ed — each executor task
    // thread retains its ~256 KB of native zlib state for the thread's
    // lifetime. Spark's task pools are fixed-size and long-lived, so
    // this is a bounded, amortized cost, not a leak; only a runtime
    // that churns task threads would accumulate state (register a
    // thread-exit cleaner there).
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, true)
  }
  private val bufs = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Deflate byte count of a string's UTF-8 bytes (level 6, raw
    * stream). Total function: empty input yields the ~2-byte empty
    * block. Deterministic for a fixed JDK zlib — which is why the
    * board query is rows-only (no DuckDB identity) and pinned by
    * CompressSpec's planted fixtures instead.
    */
  def deflatedLen(s: UTF8String): Long = {
    val d = deflaters.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val b = bufs.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(b)
    total
  }

  /** Column API: deflate byte count. */
  def deflateLen(text: Column): Column =
    Bridge.toColumn(DeflateLen(Bridge.toExpression(text)))
}

case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"
  override def checkInputDataTypes() =
    TextExpressions.requireType(child, prettyName, "string")(_ == StringType)

  /** Codegen entry point (addReferenceObj instance-call convention —
    * the generated Java cannot name Scala object forwarders reliably).
    */
  def compute(s: UTF8String): Long = CompressExpressions.deflatedLen(s)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflate", this, classOf[DeflateLen].getName)
    nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $ref.compute($str);")
  }

  override protected def withNewChildInternal(c: Expression): DeflateLen =
    copy(child = c)
}
