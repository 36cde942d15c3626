package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML tag strip + fixed-entity decode in ONE per-row kernel — the text
  * a crawl-corpus operator should see (every TextOps scorer assumes clean
  * text; real crawls are markup). Semantics are EXACTLY the relational
  * form the oracle runs, in this order:
  *
  *   1. remove every `<[^>]*>` span (a `<` with no later `>` is literal
  *      text — the regex can't match it either);
  *   2. over the CONCATENATED remains, decode the six fixed entities as
  *      sequential full-string replaces: `&lt;` `&gt;` `&quot;` `&#39;`
  *      `&nbsp;` (to a plain space) and `&amp;` LAST — last so a decoded
  *      `&` can never re-trigger an earlier entity (`&amp;lt;` decodes to
  *      the literal text `&lt;`, the HTML-correct reading). Unknown
  *      entities pass through untouched.
  *
  * Decoding AFTER the strip (not interleaved) matters for exactness: a
  * tag can split an entity (`a&l<b>t;` strips to `a&lt;` which then
  * decodes to `a<`), and the oracle's regexp_replace-then-replace chain
  * sees exactly that splice. The strip phase is the one that runs over
  * raw markup (bytes-heavy at 100 TB) and it is a single indexOf-driven
  * scan; the decode passes run over the already-shrunken visible text.
  * Codegen'd via a static kernel call (the SimhashLong pattern), so the
  * scan stays inside whole-stage codegen.
  */
case class HtmlStrip(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_strip"

  override def nullSafeEval(input: Any): Any =
    HtmlStrip.strip(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HtmlStrip.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$cls.strip($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlStrip {

  /** The per-row kernel; public so generated code can call it. */
  def strip(html: UTF8String): UTF8String = {
    val s = html.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i + 1)
        if (close < 0) { sb.append(s, i, s.length); i = s.length }
        else i = close + 1
      } else {
        sb.append(c); i += 1
      }
    }
    // sequential full-string replaces, &amp; last — the oracle's exact chain
    val out = sb.toString
      .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")
    UTF8String.fromString(out)
  }

  val Name = "graft_html_strip"

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(Name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[HtmlStrip].getName, Name),
        (children: Seq[Expression]) => {
          require(children.length == 1,
            s"$Name takes exactly 1 argument (html string); got ${children.length}")
          HtmlStrip(children.head)
        })
    }
  }

  def htmlStrip(c: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(Name, c)
  }
}
