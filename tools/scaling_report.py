#!/usr/bin/env python3
"""Scaling probe: compare two bench artifacts (smaller SF vs larger SF) and
write SCALING.md — per-query wall-time growth vs the data-growth factor of
the tables the query reads, flagging anything superlinear beyond tolerance.

The point: local wall-clock at one SF says nothing about 100 TB; the GROWTH
RATE between SFs is the testable proxy. A linear operator should grow at
most ~ the data factor (plus fixed overhead, which makes measured ratios
UNDER-estimate asymptotic growth — fine for a red-flag gate); a pair join
that grows like factor^2 is a scale-killer even if it is fast today.

Usage: scaling_report.py <bench_small.json> <bench_large.json> <out.md>
"""
import json
import sys

# Data-growth factor between sf0.01 and sf0.1 per query family (fixture row
# counts: tpch/events tables 10x, documents 10x, embeddings 4x).
FAMILY_FACTOR = [
    # embeddings-driven (4x rows sf0.01 -> sf0.1)
    (("s1", "s2", "s3", "s4", "s5_knn", "s6", "s7", "s8", "s9", "s10",
      "s11", "s12", "s13", "s14", "s15", "s16", "s17", "s18", "s19",
      "s20", "s21", "s22", "s23", "d8", "d11", "d19", "d20", "e1",
      "sm10", "ds3", "r1", "e2", "e3", "ds8", "b1", "b2", "s26"), 4.0),
    # everything else reads documents / events / tpch tables (10x)
]
DEFAULT_FACTOR = 10.0

# Documented superlinear correctness baselines (kept on purpose as oracles
# for the subquadratic paths; Bench skips them beyond sf0.1).
DOCUMENTED_QUADRATIC = {"d5_jaccard_bruteforce", "d8_embedding_neardup"}

# Wall-time floor: below this, fixed per-query overhead (session, planning,
# parquet open) dominates and ratios are noise, not scaling signal.
MIN_SECONDS = 0.5

# Tolerance: flag when time grows faster than factor^EXP_TOL. 1.3 allows
# log factors, per-stage constants, and shuffle setup on top of linear.
EXP_TOL = 1.3


def factor_for(name: str) -> float:
    for prefixes, f in FAMILY_FACTOR:
        if any(name == p or name.startswith(p + "_") or name.startswith(p)
               and name[len(p):len(p) + 1] in ("_",) for p in prefixes):
            return f
    return DEFAULT_FACTOR


def main(small_path: str, large_path: str, out_path: str) -> int:
    small = json.load(open(small_path))
    large = json.load(open(large_path))
    # preserve hand-written one-off sections (e.g. the sf1 probe) across
    # regeneration: everything from the first "## One-off" heading onward
    preserved = ""
    try:
        prev = open(out_path).read()
        idx = prev.find("\n## One-off")
        if idx >= 0:
            preserved = prev[idx:]
    except FileNotFoundError:
        pass
    sq, lq = small["queries"], large["queries"]
    rows = []
    flagged = []
    for name in sorted(lq):
        if name not in sq:
            continue
        t0, t1 = sq[name], lq[name]
        f = factor_for(name)
        ratio = t1 / max(t0, 1e-9)
        limit = f ** EXP_TOL
        status = "ok"
        if name in DOCUMENTED_QUADRATIC:
            status = "documented-baseline"
        elif t1 < MIN_SECONDS:
            status = "overhead-bound"
        elif ratio > limit:
            status = "FLAG"
            flagged.append(name)
        rows.append((name, t0, t1, f, ratio, status))
    with open(out_path, "w") as out:
        out.write("# SCALING — wall-time growth vs data growth "
                  f"({small['sf']} -> {large['sf']})\n\n")
        out.write(
            "Growth-rate probe: a query whose wall time grows faster than\n"
            f"`factor^{EXP_TOL}` (factor = its tables' row growth between the\n"
            "two SFs) is flagged as superlinear — the 100 TB red flag local\n"
            "absolute times cannot show. Queries under "
            f"{MIN_SECONDS} s at the larger SF are overhead-bound (fixed\n"
            "session/planning cost dominates; ratios there are noise).\n"
            "Documented quadratic correctness baselines (d5, d8) are listed\n"
            "but exempt — they exist to validate the subquadratic paths and\n"
            "the bench skips them beyond sf0.1.\n\n")
        out.write("| query | t_small (s) | t_large (s) | data factor | "
                  "time ratio | status |\n|---|---|---|---|---|---|\n")
        for name, t0, t1, f, ratio, status in rows:
            out.write(f"| {name} | {t0:.2f} | {t1:.2f} | {f:.0f}x "
                      f"| {ratio:.2f}x | {status} |\n")
        out.write(f"\nFlagged superlinear: {flagged if flagged else 'none'}\n")
        out.write(preserved)
    print(f"wrote {out_path}: {len(rows)} queries, flagged={flagged}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
