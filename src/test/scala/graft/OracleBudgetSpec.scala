package graft

import org.scalatest.funsuite.AnyFunSuite

/** Times every committed DuckDB oracle at sf0.01 — the driver's correctness
  * SF — and fails if any single statement exceeds the per-oracle budget.
  * This is the repo-side guard against round 9's failure mode: oracle cost
  * (two ~4-minute BPE replays from exponential CTE re-inlining, a
  * four-chain ANN statement) silently blew the driver's wall-clock budget
  * and the round's correctness artifact came back EMPTY. A query is only
  * "done" if its oracle is cheap enough for the gate to actually run.
  *
  * Runs through the driver-side python3 + duckdb (the same engine the gate
  * uses); CANCELS (not fails) when that environment is absent, so the spec
  * is a no-op outside the driver's machine.
  */
class OracleBudgetSpec extends AnyFunSuite {

  private val BudgetSecPerOracle = 60.0

  test("every committed oracle stays within the per-statement DuckDB budget at sf0.01") {
    val available =
      try new ProcessBuilder("python3", "-c", "import duckdb")
        .start().waitFor() == 0
      catch { case _: Exception => false }
    assume(available, "python3 + duckdb unavailable (driver-side only)")
    // no-op outside the driver machine even when duckdb happens to exist:
    // without the fixture dir the view creation would THROW and fail the
    // suite instead of cancelling
    assume(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get("/root/testdata/sf0.01")),
      "sf0.01 fixture directory unavailable (driver-side only)")

    val dir = java.nio.file.Files.createTempDirectory("graft_oracle_budget")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      java.nio.file.Files.writeString(dir.resolve(name + ".sql"), sql): Unit
    }
    val driver =
      """import duckdb, glob, os, sys, time
        |sf, d, budget = sys.argv[1], sys.argv[2], float(sys.argv[3])
        |con = duckdb.connect()
        |for t in ["region", "nation", "customer", "supplier", "part",
        |          "orders", "lineitem", "events", "documents", "embeddings"]:
        |    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        |bad = []
        |for f in sorted(glob.glob(os.path.join(d, "*.sql"))):
        |    name = os.path.basename(f)[:-4]
        |    t0 = time.time()
        |    con.sql(open(f).read()).fetchall()
        |    sec = time.time() - t0
        |    if sec > budget:
        |        bad.append(f"{name}: {sec:.1f}s")
        |        print(f"OVER {name} {sec:.2f}", flush=True)
        |    elif sec > budget / 4:
        |        print(f"warn {name} {sec:.2f}", flush=True)
        |sys.exit(1 if bad else 0)
        |""".stripMargin
    val pyPath = dir.resolve("budget.py")
    java.nio.file.Files.writeString(pyPath, driver)
    val proc = new ProcessBuilder("python3", pyPath.toString,
      "/root/testdata/sf0.01", dir.toString, BudgetSecPerOracle.toString)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes, "UTF-8")
    val finished = proc.waitFor(15, java.util.concurrent.TimeUnit.MINUTES)
    assert(finished, "oracle budget run did not finish within 15 minutes")
    info(if (out.trim.isEmpty) "all oracles under budget/4" else out.trim)
    assert(proc.exitValue == 0,
      s"oracle(s) over the ${BudgetSecPerOracle}s DuckDB budget:\n$out")
  }
}
