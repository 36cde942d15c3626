#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run Verify's parquet dumps against
the DuckDB oracle SQL and compare (columns sorted by name, rows compared
exactly). Usage: python3 tools/check_correctness.py <sfDir> <outDir>
"""
import json
import sys

import duckdb


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            pass  # selftest fixture dirs carry no corpus tables
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: engine output missing: {e}")
            failures += 1
            continue
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        # Row-order-insensitive compare (driver may or may not sort rows):
        # sort both by all columns.
        cols = list(want.columns)
        try:
            want_s = want.sort_values(cols, na_position="first").reset_index(drop=True)
            got_s = got.sort_values(cols, na_position="first").reset_index(drop=True)
        except Exception:
            want_s, got_s = want, got
        diffs = []
        # Dtype-KIND drift gate: the driver's hash normalizes integer widths
        # (int8 vs int64 both hash as ints) but distinguishes float from int —
        # a DuckDB SUM(BIGINT) silently returns HUGEINT, which pandas
        # materializes as float64, flipping the hash even when every value is
        # identical (the r12 sm9/t22/ds5 saga). Fail loudly on int-vs-float so
        # oracle type drift is caught locally before the driver sees it.
        kind_drift = []
        for c in cols:
            wk, gk = want_s[c].dtype.kind, got_s[c].dtype.kind
            wk = "i" if wk == "u" else wk
            gk = "i" if gk == "u" else gk
            if {wk, gk} == {"i", "f"}:
                kind_drift.append(f"{c}: oracle={want_s[c].dtype} engine={got_s[c].dtype}")
        if kind_drift:
            print(f"FAIL {name}: int-vs-float dtype drift (driver hash is "
                  f"kind-sensitive): " + "; ".join(kind_drift))
            failures += 1
            continue
        for c in cols:
            a, b = want_s[c], got_s[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np
                aa, bb = a.to_numpy(dtype=float), b.to_numpy(dtype=float)
                neq = ~((aa == bb) | (np.isnan(aa) & np.isnan(bb)))
                if neq.any():
                    i = int(np.argmax(neq))
                    diffs.append(f"{c}[{i}]: {bb[i]!r} != {aa[i]!r} (exact)")
            else:
                neq = ~((a == b) | (a.isna() & b.isna()))
                if neq.any():
                    i = int(neq.to_numpy().argmax())
                    diffs.append(f"{c}[{i}]: {b.iloc[i]!r} != {a.iloc[i]!r}")
        if diffs:
            print(f"FAIL {name}: {len(diffs)} mismatched column(s): " + "; ".join(diffs[:3]))
            failures += 1
        else:
            print(f"PASS {name} ({len(want)} rows, {len(cols)} cols)")
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries pass")
    return 1 if failures else 0


def selftest() -> int:
    """Seeded type-drift fixture: an engine dump whose values match the
    oracle exactly but with int64 where the oracle yields float64 (the
    DuckDB SUM(BIGINT) -> HUGEINT -> float64 shape that made sm9/t22/ds5
    driver-red for three rounds). The checker must FAIL it — and pass the
    same dump once the oracle casts to BIGINT.
    """
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES (1, 10), (2, 20)) v(k, x)")
        con.execute(f"COPY t TO '{d}/t.parquet' (FORMAT PARQUET)")
        os.makedirs(f"{d}/q1")
        # engine side: int64 sums (what Spark writes)
        con.execute(
            "COPY (SELECT k, CAST(SUM(CAST(x AS BIGINT)) AS BIGINT) AS s "
            f"FROM t GROUP BY k) TO '{d}/q1/part.parquet' (FORMAT PARQUET)")
        drifting = ("SELECT k, SUM(CAST(x AS BIGINT)) AS s "
                    "FROM t GROUP BY k")  # HUGEINT -> float64 in pandas
        fixed = ("SELECT k, CAST(SUM(CAST(x AS BIGINT)) AS BIGINT) AS s "
                 "FROM t GROUP BY k")
        import json as j
        for sql, want_fail, label in [(drifting, True, "uncast HUGEINT sum"),
                                      (fixed, False, "cast BIGINT sum")]:
            with open(f"{d}/oracle_sql.json", "w") as f:
                j.dump({"q1": sql.replace("FROM t", f"FROM '{d}/t.parquet'")}, f)
            rc = main(d, d)
            if bool(rc) != want_fail:
                print(f"SELFTEST FAIL: {label}: rc={rc}, wanted "
                      f"{'nonzero' if want_fail else 'zero'}")
                return 1
        print("SELFTEST PASS: dtype-kind gate catches the seeded drift "
              "and accepts the cast form")
        return 0


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
