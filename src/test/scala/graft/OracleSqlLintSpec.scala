package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lints over the committed DuckDB oracle SQL (VERDICT r7 ask #1).
  *
  * The driver's checker hashes typed values, so a SUM over an integer CASE
  * literal must be cast: DuckDB types `SUM(CASE WHEN ... THEN 1 ...)` as
  * HUGEINT (int128) while Spark emits int64 — values match, hashes don't
  * (the x19 round-7 red row). Banning the uncast form here makes the class
  * of bug unrepresentable in the committed oracle surface.
  */
class OracleSqlLintSpec extends AnyFunSuite {

  /** Offending snippets: every `SUM(CASE WHEN ... THEN <int literal>` whose
    * SUM is not directly wrapped in `CAST(`. Paren-depth-aware so WHEN
    * conditions containing parens (IN lists, function calls) are handled.
    */
  private[graft] def uncastIntSums(sql: String): Seq[String] = {
    val s = sql.replaceAll("\\s+", " ")
    val upper = s.toUpperCase
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var from = 0
    while ({ from = upper.indexOf("SUM", from); from >= 0 }) {
      val afterSum = upper.drop(from + 3).dropWhile(_ == ' ')
      if (afterSum.startsWith("(") &&
          afterSum.drop(1).dropWhile(_ == ' ').startsWith("CASE ")) {
        // is the SUM wrapped in CAST( ?
        val prefix = upper.substring(0, from).reverse.dropWhile(_ == ' ')
        val wrapped = prefix.startsWith("(TSAC") // "CAST(" reversed
        if (!wrapped) {
          // scan from the CASE for the first THEN at the CASE's paren depth
          var i = upper.indexOf("CASE ", from)
          var depth = 0
          var thenAt = -1
          while (thenAt < 0 && i < upper.length - 4) {
            upper.charAt(i) match {
              case '(' => depth += 1
              case ')' => depth -= 1
              case 'T' if depth == 0 && upper.startsWith("THEN ", i) &&
                upper.charAt(i - 1) == ' ' => thenAt = i
              case _ => ()
            }
            i += 1
          }
          if (thenAt >= 0) {
            val arg = upper.drop(thenAt + 5).dropWhile(_ == ' ')
              .takeWhile(c => c != ' ' && c != ')')
            if (arg.nonEmpty && arg.forall(c => c.isDigit || c == '-'))
              out += s.substring(from, math.min(s.length, thenAt + 12))
          }
        }
      }
      from += 3
    }
    out.toSeq
  }

  test("every integer-literal SUM(CASE ...) in oracle SQL is wrapped in CAST") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => uncastIntSums(sql).map(sn => s"$name: $sn...")
    }
    assert(offenders.isEmpty,
      s"uncast integer SUM(CASE ...) in oracle SQL (wrap in CAST(... AS BIGINT)):\n${offenders.mkString("\n")}")
  }

  test("lint catches the x19 bug shape and accepts the fixed form (self-check)") {
    val bad = // the literal round-7 offender, parens in the IN list and all
      """SELECT l_returnflag,
        |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS high_line_count
        |FROM lineitem GROUP BY 1""".stripMargin
    assert(uncastIntSums(bad).nonEmpty)
    val good = bad.replace("SUM(CASE", "CAST(SUM(CASE")
      .replace("END) AS high", "END) AS BIGINT) AS high")
    assert(uncastIntSums(good).isEmpty)
    // non-integer THEN is out of scope (engines agree on the type)
    val decimal = "SELECT SUM(CASE WHEN x THEN CAST(p AS DECIMAL(25,4)) ELSE y END) FROM t"
    assert(uncastIntSums(decimal).isEmpty)
  }
}
