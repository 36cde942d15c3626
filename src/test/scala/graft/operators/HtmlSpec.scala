package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  /** The relational twin of HtmlStrip.strip — an independent formulation
    * of the same tokenize-and-decode pass the DuckDB oracle runs (the
    * oracle uses list_transform; this uses Spark's higher-order
    * transform, with `conv` for the hex value). The native kernel must
    * equal it byte-for-byte.
    */
  private def relationalStrip(c: org.apache.spark.sql.Column) = {
    val stripped = regexp_replace(c, "<[^>]*>", "")
    val tokRe = "&lt;|&gt;|&quot;|&nbsp;|&amp;|" +
      "&#[0-9]{1,7};|&#[xX][0-9a-fA-F]{1,6};|&|[^&]+"
    def decodable(v: org.apache.spark.sql.Column) =
      v.isin(9L, 10L, 13L) || (v >= 32L && v <= 255L)
    array_join(transform(regexp_extract_all(stripped, lit(tokRe), lit(0)), t => {
      val dec = t.substr(lit(3), length(t) - 3).cast("long")
      val hex = conv(t.substr(lit(4), length(t) - 4), 16, 10).cast("long")
      def chr(v: org.apache.spark.sql.Column) = call_function("char", v)
      when(t === "&lt;", lit("<")).when(t === "&gt;", lit(">"))
        .when(t === "&quot;", lit("\"")).when(t === "&nbsp;", lit(" "))
        .when(t === "&amp;", lit("&"))
        .when(t.rlike("^&#[0-9]+;$"),
          when(decodable(dec), chr(dec)).otherwise(t))
        .when(t.rlike("^&#[xX][0-9a-fA-F]+;$"),
          when(decodable(hex), chr(hex)).otherwise(t))
        .otherwise(t)
    }), "")
  }

  test("native strip equals the regex+replace chain on adversarial fragments") {
    val cases = Seq(
      "<p>plain</p>",
      "no markup at all",
      "",
      "unclosed <tag stays literal",
      "a<b<c>d",                       // regex eats <b<c> in one match
      "a&l<b>t;",                      // tag splices an entity together -> a<
      "&amp;lt; decodes to the literal &lt;",
      "&amp; &lt;b&gt; &quot;q&quot; &nbsp; &#39;a&#39;",
      "&unknown; passes through",
      "<a href=\"x\">link</a> text <br/> more",
      "<<>> <> <x y=\"<\">after",      // '<' inside attribute value
      "trailing open <",
      "&&lt;",
      "<P CLASS=\"x\">case</P>",
      // numeric character references (round 16)
      "&#39; &#039; &#0039;",          // leading zeros all decode to '
      "&#x27;&#X27; &#xa0;&#XA0;",     // hex, both x cases and digit cases
      "&#3<b>9;",                      // tag splices a NUMERIC ref -> '
      "&#x2<i>7;",                     // same for hex
      "&#38;lt;",                      // decoded & must NOT re-trigger &lt;
      "&amp;#60;",                     // decoded & must NOT re-trigger &#60;
      "&#9;&#10;&#13; &#31;&#8;",      // tab/lf/cr decode; 31 and 8 do not
      "&#999; &#x110000; stay",        // out of range pass through
      "&#12345678; &#xABCDEF1;",       // digit run too long: not a ref
      "&#; &#x; &#z &# 39; &#39")      // malformed refs stay literal
    val diff = cases.toDF("h")
      .select(Html.stripHtml($"h").as("a"), relationalStrip($"h").as("b"))
      .filter(not($"a" <=> $"b"))
      .collect()
    assert(diff.isEmpty, diff.mkString("; "))
    // corpus-scale fuzz: documents text wrapped in markup, both paths equal
    val docs = graft.core.Tables.documents(spark, sf)
      .select(concat(lit("<div t=\"1\">"), $"text",
        lit("&amp;<br>tail&lt;")).as("h"))
    assert(docs.select(Html.stripHtml($"h").as("a"),
        relationalStrip($"h").as("b"))
      .filter(not($"a" <=> $"b")).count() == 0)
    // NULL in, NULL out (UnaryExpression null-safe contract)
    assert(Seq[Option[String]](None).toDF("h")
      .select(Html.stripHtml($"h")).collect().head.isNullAt(0))
  }

  test("mainContent keeps long link-sparse blocks, drops nav/short/link-dense") {
    val body = (1 to 30).map(i => s"word$i").mkString(" ") // long, no links
    val html =
      s"""<div><h1>Title</h1>
         |<nav><a href="/">home</a> <a href="/b">browse all the links</a></nav>
         |<p>$body</p>
         |<p>tiny</p>
         |<p>Read <a href="/y">details</a> about corpus quality here.</p></div>""".stripMargin
    val out = Html.mainContent(Seq((1L, html)).toDF("id", "h"), "id", "h",
        minChars = 25, maxLinkPct = 30)
      .as[(Long, Long, Long, String, Long)].collect().head
    val (_, nBlocks, nKept, main, mainLen) = out
    assert(nKept == 2L, s"kept $nKept: [$main]")
    assert(main.contains(body) && main.contains("details about corpus"))
    assert(!main.contains("home") && !main.contains("tiny"), main)
    assert(nBlocks >= 4L && mainLen == main.length.toLong)
    // order: the body paragraph precedes the details paragraph
    assert(main.indexOf(body) < main.indexOf("Read details"))
    // no-visible-text doc: zero blocks, empty main (left-join path)
    val empty = Html.mainContent(Seq((7L, "<p></p><div></div>")).toDF("id", "h"),
        "id", "h", 25, 30)
      .as[(Long, Long, Long, String, Long)].collect().head
    assert(empty == ((7L, 0L, 0L, "", 0L)), empty.toString)
  }

  test("robotsPolicy: quoted, unquoted, both orders, none shorthand, token exactness") {
    val pages = Seq(
      (0L, """<head><META NAME="robots" CONTENT="noindex, nofollow"></head>""", true, true),
      (1L, """<head><meta content='nofollow' name=robots></head>""", false, true),
      (2L, """<head><meta name="ROBOTS" content="NONE"></head>""", true, true),
      (3L, """<head><meta name="robots" content="nosnippet"></head>""", false, false),
      // unquoted content values — legal HTML5, must not slip the gate
      // (ADVICE r18 #2), in both attribute orders
      (4L, """<head><meta name=robots content=noindex></head>""", true, false),
      (5L, """<head><meta content=noindex,nofollow name=robots></head>""", true, true),
      (6L, "<body>no meta at all</body>", false, false),
      // unquoted value ends at whitespace: the next attribute must not
      // bleed into the directive list
      (7L, """<head><meta name=robots content=noindex data-x=1></head>""", true, false))
    val got = Html.robotsPolicy(
        pages.map(p => (p._1, p._2)).toDF("id", "page"), "id", "page")
      .as[(Long, Boolean, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == pages.map(p => (p._1, p._3, p._4)),
      got.mkString("; "))
  }

  test("Gopher rules flip in the expected direction once markup is stripped") {
    // 35 words of mean length ~4.5 with stopwords: passes Gopher clean.
    // The same text glued into markup: tags fuse into "words", pushing the
    // mean word length past the ceiling -> raw HTML FAILS the same gate.
    val words = Seq.fill(5)(Seq("the", "team", "ships", "data", "into",
      "lake", "jobs")).flatten
    val clean = words.mkString(" ")
    val html = words.grouped(7).map(g =>
      "<p class=\"block\">" + g.mkString(" ") + "</p>").mkString("")
    val df = Seq((clean, html)).toDF("clean", "html")
    // minStopwords = 1: the "\n" block joins fuse a trailing word with the
    // next block's leading "the", so only the first block's survives —
    // the gate must still separate clean/main (pass) from raw (fail)
    def keep(c: org.apache.spark.sql.Column) =
      TextOps.gopherRules(c, 30L, 10000L, 3.0, 5.0, 1L)._4
    val r = df.select(
      keep($"clean").as("k_clean"),
      keep($"html").as("k_raw"),
      keep(Html.stripHtml($"html")).as("k_stripped_raw")).collect().head
    assert(r.getBoolean(0), "clean text must pass Gopher")
    assert(!r.getBoolean(1), "raw HTML must fail Gopher (tag-fused words)")
    // strip alone is not enough here (tags were glued without spaces, so
    // words fuse): mainContent on properly-blocked markup is the fix
    val viaMain = Html.mainContent(Seq((1L, html)).toDF("id", "h"), "id", "h",
        minChars = 10, maxLinkPct = 30)
      .select(keep(col("main"))).collect().head.getBoolean(0)
    assert(viaMain, "main-content text must pass the same Gopher gate")
  }
}
