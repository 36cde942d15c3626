package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** UnicodeFix: mojibake repair + NFC + control policy. The mojibake
  * corruptions are produced INDEPENDENTLY (Java charset round-trips —
  * exactly how real pipelines create them), so repair(corrupt(x)) == x is
  * a genuine inverse test, not the kernel checked against itself.
  */
class UnicodeFixSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSamples[A](gen: Gen[A], cases: Int)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var tries = 0
    while (produced < cases && tries < cases * 20) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) => f(a); produced += 1
        case None => ()
      }
      seed = seed.next
      tries += 1
    }
    assert(produced == cases, s"generator too sparse: $produced/$cases")
  }

  private def fix(xs: Seq[String]): Seq[String] =
    xs.toDF("t").select(UnicodeFix.unicodeFix(col("t")).as("f"))
      .as[String].collect().toSeq

  /** What a latin-1 (resp. cp1252) misdecode of x's UTF-8 bytes produces. */
  private def mojibake(x: String, charset: String): String =
    new String(x.getBytes(java.nio.charset.StandardCharsets.UTF_8), charset)

  // clean strings: NFC-normal, control-free, repair-stable (each contains
  // non-ASCII so the round-trip genuinely exercises multi-byte repair).
  // ’“‘–€™ are cp1252 specials; the rest are
  // latin-1-range accents. ” (U+201D) and — (U+2014) are deliberately
  // absent: their corruption chains pass through byte 0x9D, which Java's
  // cp1252 decoder maps to U+FFFD — a LOSSY corruption no repair can
  // invert (asserted as pass-through below).
  private val clean = Seq(
    "café au lait",
    "it’s a “quote‘ – ok",
    "price €99 ™",
    "niño déjà vu über")

  test("repair(mojibake(x)) == x for latin-1 and cp1252 misdecodes, single and double") {
    for (cs <- Seq("ISO-8859-1", "windows-1252"); x <- clean) {
      val once = mojibake(x, cs)
      val twice = mojibake(once, cs)
      assert(once != x, s"corruption must corrupt: '$x' @$cs")
      assert(fix(Seq(once)) == Seq(x), s"single $cs mojibake of '$x' (was '$once')")
      assert(fix(Seq(twice)) == Seq(x), s"double $cs mojibake of '$x'")
    }
  }

  test("lossy corruption (cp1252 0x9D -> U+FFFD) passes through, never crashes") {
    val lossy = mojibake("a ”quote” b", "windows-1252") // contains U+FFFD
    assert(lossy.contains('\uFFFD'))
    assert(fix(Seq(lossy)) == Seq(lossy), "unrepairable text must pass through")
  }

  test("clean text is a fixpoint: no decay of genuine latin-1-range text") {
    val asciiAnd = clean ++ Seq("plain ascii words", "",
      "tabs\tand\nnewlines kept",
      "mixed café then 中文 stays") // CJK blocks repair entirely
    assert(fix(asciiAnd) == asciiAnd)
  }

  test("NFC composes combining sequences; C0/DEL/C1 stripped, tab/newline/CR kept") {
    // e + U+0301 -> é; A + U+030A -> Å
    assert(fix(Seq("éclair", "Å ring")) ==
      Seq("éclair", "Å ring"))
    // BEL between a and b goes; DEL and C1 NEL go; \t \n \r stay
    assert(fix(Seq("a\u0007bcdef\tg\nh\ri\u007F\u0085j")) ==
      Seq("abcdef\tg\nh\rij"))
  }

  test("idempotence: fix(fix(x)) == fix(x) over adversarial generated strings") {
    val junkChar: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "),
      Gen.oneOf('é', 'Ã', '©', 'â', '€', '™',
        '’', '\u0301', '\u0007', '\u007F', '\u0085', 'ÿ')
        .map(_.toString))
    val strGen = Gen.listOf(junkChar).map(_.mkString)
    forAllSamples(Gen.listOfN(32, strGen), 6) { xs =>
      val once = fix(xs)
      assert(fix(once) == once,
        s"not idempotent on: ${xs.map(_.codePoints().toArray.mkString("[", ",", "]"))}")
    }
  }

  test("Gopher mwl-gate flip: mojibake text fails the 4.0-5.0 band, fixed text passes") {
    // every word is 'cafés' (5 chars -> mwl 5.0, in-band at the edge);
    // latin-1 mojibake turns each into 6-char 'cafÃ©s' -> mwl 6.0,
    // out of band. The fn4 lesson, at the codepoint level: the gate's
    // verdict flips purely on repair.
    val doc = Seq.fill(40)("cafés").mkString(" ")
    val broken = mojibake(doc, "ISO-8859-1")
    def mwlOk(c: org.apache.spark.sql.Column) = {
      val mwl = length(regexp_replace(c, " ", "")).cast("double") /
        greatest(size(split(c, " ")).cast("double"), lit(1.0))
      mwl >= 4.0 && mwl <= 5.0
    }
    val row = Seq(broken).toDF("t")
      .select(mwlOk(col("t")).as("before"),
        mwlOk(UnicodeFix.unicodeFix(col("t"))).as("after"))
      .head()
    assert(!row.getBoolean(0) && row.getBoolean(1),
      "mojibake must fail the Gopher word-length band and pass after repair")
  }
}
