package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First `nBytes` of md5(input) as an unsigned big-endian long — the
  * engine-portable string hash used by minhash/simhash (equals
  * `conv(substr(md5(x), 1, 2*nBytes), 16, 10)` and DuckDB's
  * `CAST('0x' || substr(md5(x), 1, 2*nBytes) AS BIGINT)`).
  *
  * Native instead of composed because the composed form hex-encodes the full
  * digest, substrings it, and string-parses the result PER ROW — on the
  * shingle-explode path that's hundreds of millions of avoidable string ops
  * at sf0.1 and beyond. Here: one digest, one big-endian fold, no strings.
  */
case class Md5PrefixLong(child: Expression, nBytes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (nBytes < 1 || nBytes > 7)
      TypeCheckResult.TypeCheckFailure("nBytes must be in [1,7] to stay positive in a long")
    else child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs string/binary input, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix_long"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    Md5PrefixLong.prefix(bytes, nBytes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md5PrefixLong.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val conv = if (child.dataType == StringType) ".getBytes()" else ""
    defineCodeGen(ctx, ev, c => s"$cls.prefix($c$conv, $nBytes)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5PrefixLong {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Big-endian unsigned value of the first n digest bytes. */
  def prefix(bytes: Array[Byte], n: Int): Long =
    prefix(bytes, 0, bytes.length, n)

  /** Range variant — digest `len` bytes from `off` without copying (the
    * ShingleHashesLong zero-copy gram path). */
  def prefix(bytes: Array[Byte], off: Int, len: Int, n: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var acc = 0L
    var i = 0
    while (i < n) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc
  }

  val Name = "graft_md5_prefix_long"

  val fromChildren: Seq[Expression] => Expression = children =>
    Builders.arity(Name, "(text, n_bytes)", 2, children)(1) match {
      case Literal(n: Int, IntegerType) => Md5PrefixLong(children(0), n)
      case other => throw new IllegalArgumentException(
        s"$Name second argument must be a literal int, got $other")
    }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(Name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[Md5PrefixLong].getName, Name),
        fromChildren)
    }
  }

  def md5PrefixLong(c: Column, nBytes: Int): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(Name, c, lit(nBytes))
  }
}
