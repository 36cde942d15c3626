package graft.tools

import graft.sources.Xlsx

/** One-off generator for the committed test workbook
  * (src/test/resources/fixtures/eia930/reference.xlsx): the two-sheet shape
  * the reference reads with `pd.read_excel(url, sheet_name=['BAs', 'Energy
  * Sources'])` (EIA930PipelineHourlyData.py:33-34). The BAs sheet carries 8
  * columns so the 6-column slice is observable, plus a deliberately absent
  * cell (sparse row) to pin the reader's gap handling. Deterministic output —
  * re-running reproduces the committed bytes.
  */
object GenXlsxFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/eia930/reference.xlsx")
    val baHeader: Seq[Any] = Seq("BA Code", "BA Name", "Time Zone",
      "Region/Country Code", "Region/Country Name", "Generation Only BA",
      "Demand by BA Subregion", "Active BA")
    val bas: Seq[Seq[Any]] = Seq(
      baHeader,
      Seq("CISO", "California ISO", "Pacific", "US48", "United States", "No", "Yes", "Yes"),
      Seq("ERCO", "ERCOT", "Central", "US48", "United States", "No", "No", "Yes"),
      // sparse row: Time Zone cell intentionally absent (null)
      Seq("MISO", "Midcontinent ISO", null, "US48", "United States", "No", "No", "Yes"),
      Seq("PJM", "PJM Interconnection", "Eastern", "US48", "United States", "No", "No", "Yes"))
    val es: Seq[Seq[Any]] = Seq(
      Seq("Energy Source Code", "Energy Source Name", "Share"),
      Seq("NG", "Natural gas", 0.42),
      Seq("SUN", "Solar", 0.11),
      Seq("WND", "Wind", 0.13),
      Seq("COL", "Coal", 0.16))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out).getParent)
    Xlsx.write(out, Seq("BAs" -> bas, "Energy Sources" -> es))
    println(s"wrote $out")
  }
}
