package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE helper for [[DeflateSize]] — a standalone object (no
  * companion class) so scalac emits a static forwarder the generated
  * whole-stage code can call as `graft.plans.Deflate.deflatedLen(...)`.
  *
  * One `Deflater` per executor thread (ThreadLocal + reset), level 6,
  * raw/nowrap: per-row allocation of a native zlib stream would
  * dominate the hot loop. Output length is deterministic for a given
  * JVM's bundled zlib — the expression is gated rows-only for exactly
  * that reason (no portable SQL reproduces a specific zlib encoder).
  */
object Deflate {
  // native-resource discipline: one zlib stream per executor thread,
  // bounded by pool size, and `end()`ed when the owning thread dies
  // (the Cleaner fires once the Thread is unreachable — the action
  // captures only the Deflater, so it cannot pin the thread). On
  // JDK 12+ java.util.zip.Deflater also carries its own internal
  // cleaner as a GC backstop; this registration just makes release
  // prompt instead of whenever the ThreadLocal map gets collected.
  private val cleaner = java.lang.ref.Cleaner.create()
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater = {
      val d = new java.util.zip.Deflater(6, true)
      cleaner.register(Thread.currentThread(), () => d.end())
      d
    }
  }

  def deflatedLen(bytes: Array[Byte]): Int = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def deflatedLen(s: UTF8String): Int = deflatedLen(s.getBytes)

  /** Column face: DEFLATE-compressed byte length of a string's UTF-8
    * bytes. ratio = deflate_size(text) / octet_length(text) is the
    * classic low-entropy / boilerplate quality signal (highly
    * repetitive text compresses far below ~1.0 × random-ish prose).
    */
  def deflate_size(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      DeflateSize(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Compressed-size expression: DEFLATE (level 6, raw) byte length of
  * the input string's UTF-8 bytes. Codegen'd — the generated code
  * calls the static [[Deflate.deflatedLen]] helper directly, so the
  * expression stays inside whole-stage codegen (no UDF serialization,
  * no interpreted fallback); the zlib call itself is native and
  * partition-local, zero shuffle.
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"deflate_size requires a string argument, got ${child.dataType}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  override def nullSafeEval(input: Any): Any =
    Deflate.deflatedLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Deflate.deflatedLen($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}
