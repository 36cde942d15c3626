#!/usr/bin/env python3
"""Global BroadcastNestedLoopJoin adjudicator over the DumpPlans output
(VERDICT r16 ask #2; bounds per r17 ask #5): every BNLJ in every committed
plan dump must be one of the two BENIGN classes, else this check fails
NAMING the query — so the 300-odd BNLJs no longer need manual spot-checks
every round, and a real nested-loop join can't hide among them.

Class A (auto-proven): ONE-ROW-AGGREGATE build side — the scalar-attach
idiom. From the BNLJ's build child, descend through single-child
pass-through nodes (Project/Filter/Exchange/BroadcastExchange/Sort/...),
resolving ReusedExchange references, until an aggregate node; benign iff
its detail block shows `Keys: []` (a global aggregate -> exactly one row).

Class B (allowlist WITH BOUNDS): BOUNDED-BROADCAST build side — bounded by
CONSTRUCTION, not by data. For every class-B BNLJ the tool now COMPUTES a
row bound from the plan itself, recursively: Keys:[] aggregate = 1; keyed
aggregate <= its input bound; Range(s,e) = e-s; a scan with a pushed
LessThan(col,n)/LessThanOrEqual/EqualTo on an id column = n / n+1 / 1
(ids are nonnegative integers in this engine — the vec_id contract);
limits cap their child; Union sums; joins multiply ((l+1)*(r+1) — safe
for every join type); pass-throughs and Filters inherit. A query's entry
must carry an exact BNLJ count and either PROVE a bound from the plan or
DECLARE one (hand-reviewed storage-side facts the dump can't show, e.g. a
persisted one-row codebook table). The check FAILS when: a class-B BNLJ
appears beyond the entry's count; an entry is stale (count shrank); no
bound is provable and none is declared; or the bound exceeds ROW_BUDGET.
Every entry's bound is printed, so the allowlist is an audited table of
numbers instead of growing prose.

Usage: python3 tools/check_bnlj.py [PLANS.md]
       python3 tools/check_bnlj.py --selftest
"""
import re
import sys

INF = float("inf")

# The broadcast a class-B entry may carry. Observed real bounds are <= ~2k
# (query batches of 8, 256-bucket model grids, per-language unions); the
# budget is an order of magnitude above the legitimate ceiling and many
# below anything corpus-shaped.
ROW_BUDGET = 65536

# A DECLARED (hand-reviewed) bound above this cap is only acceptable when
# the query is RUNTIME-ASSERTED: BnljBoundsSpec executes it and measures
# every BNLJ build side against the same number, so the declaration can't
# silently rot when the plan changes (VERDICT r18 ask #3). New declared
# entries above the cap FAIL here until they gain a BnljBoundsSpec row.
DECLARED_CAP = 64
RUNTIME_ASSERTED = {
    # mirrored in src/test/scala/graft/BnljBoundsSpec.scala — update BOTH
    "t28_trained_langid", "t29_langid_margin",
    "e10_confusion_counts", "e15_cohens_kappa",
    "fts8_ql_dirichlet", "lm10_jm_rank",
    "sk3_skew_report", "w16_funnel_latency",
    "t22_quality_classifier",
}

# query -> (exact count of non-scalar BNLJs, reviewed reason,
#           declared bound or None when the plan must prove it)
BOUNDED_BROADCAST_ALLOWLIST = {
    # ANN family: broadcast 8-row query batch (vec_id < 8, pushed filter)
    # and/or index-parameter-bounded centroid/codebook constant tables
    "s1_knn_bruteforce": (1, "broadcast 8-row query batch", None),
    "s7_sq8_knn": (1, "broadcast query batch + SQ8 bounds row chain", None),
    "s8_pq_adc_knn": (1, "broadcast query batch + 16-seed codebook chain", None),
    "s11_pq_trained": (1, "broadcast query batch + trained codebook chain", None),
    # s16_ann_recall: removed in round 19 — the shared seeded shortlist +
    # pinned ground truth replaced every per-arm broadcast-query-batch
    # subtree with checkpoint leaves; its plan now has ZERO BNLJs
    "s26_matryoshka_recall": (4, "broadcast 8-row query batch per truncation arm", None),
    "s19_ivfpq_persisted": (1, "broadcast 8-row query batch over persisted index", 8),
    "s20_ivfpq_persisted_refine": (1, "broadcast 8-row query batch", 8),
    "s23_ivfpq_deleted": (1, "broadcast 8-row query batch", 8),
    "s24_ivfpq_filtered_serve": (1, "broadcast 8-row query batch", 8),
    "s25_binary_sign_knn": (1, "broadcast 8-row query batch", None),
    "ds3_ann_ingest_exactly_once": (1, "broadcast 8-row query batch", 8),  # batch rides a checkpointed RDD scan: no pushed filter in the dump
    "e2_retrieval_metrics": (2, "broadcast query batch, approx + exact arms", None),
    "r1_hard_negatives": (1, "broadcast query batch joined to labels", None),
    "d8_embedding_neardup": (1, "documented quadratic baseline: broadcast prepared side", "data"),
    "d32_semantic_decontaminate": (1, "broadcast benchmark set (|B|-bounded, documented)", "data"),
    "fn5_decontamination_funnel": (1, "d32's broadcast benchmark set inside the funnel", "data"),
    # retrieval scoring: the broadcast side is the query-term statistics
    # table — bounded by |query terms| (a literal list), not by data
    "fts3_hybrid_rrf": (1, "broadcast query-term stats", None),
    "fts8_ql_dirichlet": (1, "broadcast query-term corpus-frequency table", 64),  # |literal query terms| rows
    "lm10_jm_rank": (1, "broadcast query-term corpus-frequency table", 64),
    # trained/plan-literal model grids: Range(256) hash buckets and Unions
    # of per-language constant relations (langs x buckets, documented
    # constant-bounded in TextOps)
    "t22_quality_classifier": (1, "Union of plan-literal class priors", 8),
    "t28_trained_langid": (3, "Range(256) bucket grid x2 + per-lang model Union", 2048),  # 5 langs x 256 buckets + grids
    "t29_langid_margin": (3, "Range(256) bucket grid x2 + per-lang model Union", 2048),
    "e10_confusion_counts": (1, "Union of two scalar-aggregate threshold arms", 1024),  # each arm Range-bounded x a one-row threshold
    "e15_cohens_kappa": (1, "Union of two scalar-aggregate threshold arms", 1024),
    # two-level bucket walk: the broadcast side joins two scalar aggregates
    "sk3_skew_report": (2, "broadcast join of scalar percentile cut rows", 16),  # LocalTableScans of driver-resolved quantile values
    # bitext mining: per index serve, one BNLJ broadcasts the persisted
    # CODEBOOK table — one packed row per index (array<array<array<bigint>>>,
    # bounded by index params m x k), scanned from STORAGE so no bound is
    # visible in the plan: declared 1 (AnnIndex.writeIvfPq writes exactly
    # one codebook row per index; reviewed). The serve subtree appears 3x
    # per query (fwd, bwd, and the stats reuse duplicate it).
    "b1_bitext_mining": (3, "persisted one-row codebook table x3 serve subtrees", 1),
    "b2_bitext_refined": (3, "persisted one-row codebook table x3 serve subtrees", 1),
    # funnel latency percentiles: the sk3 shape — broadcast join of scalar
    # percentile cut rows (median + p90 resolve)
    "w16_funnel_latency": (2, "broadcast join of scalar percentile cut rows", 16),
}

PASS_THROUGH = {
    "Project", "Filter", "Exchange", "BroadcastExchange", "Sort",
    "AdaptiveSparkPlan", "ColumnarToRow", "InputAdapter", "Coalesce",
    "WholeStageCodegen",
}
LIMITS = {"LocalLimit", "GlobalLimit", "CollectLimit", "TakeOrderedAndProject"}
AGGREGATES = {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}
JOINS = {"BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
         "BroadcastNestedLoopJoin", "CartesianProduct"}

TREE_LINE = re.compile(r"^((?:   |:  |\+- |:- |\|  )*)([A-Za-z][A-Za-z0-9_]*)(.*)$")
NODE_ID = re.compile(r"\((\d+)\)\s*$")


def parse_segments(lines):
    """Maximal runs of tree-shaped lines -> list of node lists
    [(depth, name, rest, id)] per segment."""
    segments, cur = [], []
    for ln in lines:
        m = TREE_LINE.match(ln.rstrip())
        # a tree line has indent tokens or is a bare root node name; detail
        # lines ("(12) HashAggregate", "Input [3]: ...") don't match the
        # grammar because they start with '(' or contain ':' early
        if m and not ln.startswith("("):
            indent, name, rest = m.groups()
            idm = NODE_ID.search(rest)
            cur.append((len(indent) // 3, name, rest, idm.group(1) if idm else None))
        else:
            if len(cur) > 1:
                segments.append(cur)
            cur = []
    if len(cur) > 1:
        segments.append(cur)
    return segments


def parse_details(lines):
    """(N) NodeName detail blocks -> {id: {attr_line, ...}}."""
    details, cur_id = {}, None
    for ln in lines:
        m = re.match(r"^\((\d+)\)\s+\S+", ln)
        if m:
            cur_id = m.group(1)
            details[cur_id] = []
        elif cur_id is not None and ln.strip():
            details[cur_id].append(ln.strip())
        elif not ln.strip():
            cur_id = None
    return details


def children(nodes, i):
    """Indices of direct children of nodes[i] (in tree order)."""
    d = nodes[i][0]
    out = []
    for j in range(i + 1, len(nodes)):
        if nodes[j][0] <= d:
            break
        if nodes[j][0] == d + 1:
            out.append(j)
    return out


def build_side_ok(nodes, i, details, by_id):
    """Descend from node index i; True iff a Keys: [] aggregate proves the
    subtree emits one row."""
    seen = set()
    while True:
        depth, name, rest, nid = nodes[i]
        if i in seen:
            return False, f"cycle at {name}"
        seen.add(i)
        if name in AGGREGATES:
            attrs = details.get(nid, [])
            if any(a == "Keys: []" for a in attrs):
                return True, ""
            keys = [a for a in attrs if a.startswith("Keys")]
            return False, f"{name} ({nid}) with grouping keys {keys}"
        if name == "ReusedExchange":
            m = re.search(r"Reuses operator id: (\d+)", " ".join(details.get(nid, [])))
            if not m or m.group(1) not in by_id:
                return False, f"unresolvable ReusedExchange ({nid})"
            i = by_id[m.group(1)]
            continue
        if name not in PASS_THROUGH and name not in LIMITS:
            return False, f"non-aggregate build side: {name} ({nid})"
        ch = children(nodes, i)
        if len(ch) != 1:
            return False, f"pass-through {name} with {len(ch)} children"
        i = ch[0]


def scan_bound(attrs):
    """Row bound a parquet scan's pushed filters prove. Ids in this engine
    are nonnegative integers, so LessThan(col, n) admits at most n rows."""
    for a in attrs:
        if a.startswith("PushedFilters:"):
            m = re.search(r"LessThanOrEqual\(\w+,(\d+)\)", a)
            if m:
                return int(m.group(1)) + 1
            m = re.search(r"LessThan\(\w+,(\d+)\)", a)
            if m:
                return int(m.group(1))
            if re.search(r"EqualTo\(\w+,[^)]*\)", a):
                return 1
    return INF


def row_bound(nodes, i, details, by_id, depth=0):
    """Upper bound on rows the subtree at nodes[i] can emit, provable from
    the plan alone; INF when nothing in the dump bounds it."""
    if depth > 64:
        return INF
    _, name, rest, nid = nodes[i]
    attrs = details.get(nid, [])
    ch = children(nodes, i)

    def child_bounds():
        return [row_bound(nodes, c, details, by_id, depth + 1) for c in ch]

    if name in AGGREGATES:
        if any(a == "Keys: []" for a in attrs):
            return 1
        return min(child_bounds(), default=INF)  # grouped agg <= input rows
    if name == "ReusedExchange":
        m = re.search(r"Reuses operator id: (\d+)", " ".join(attrs))
        if m and m.group(1) in by_id:
            return row_bound(nodes, by_id[m.group(1)], details, by_id, depth + 1)
        return INF
    if name == "Range":
        m = re.search(r"Range \((-?\d+), (-?\d+)", " ".join(attrs) + " " + rest)
        if m:
            return max(0, int(m.group(2)) - int(m.group(1)))
        return INF
    if name in LIMITS:
        m = re.search(r"Arguments: (\d+)", " ".join(attrs))
        if not m:
            m = re.search(r"^ (\d+)", rest)
        cap = int(m.group(1)) if m else INF
        return min([cap] + child_bounds())
    if name == "Union":
        bs = child_bounds()
        return INF if any(b is INF for b in bs) else sum(bs)
    if name in JOINS:
        bs = child_bounds()
        if len(bs) != 2 or any(b is INF for b in bs):
            return INF
        return (bs[0] + 1) * (bs[1] + 1)  # safe for every join type
    if name.startswith("Scan"):
        return scan_bound(attrs)
    if name in PASS_THROUGH or name == "ShuffleQueryStage" or name == "BroadcastQueryStage":
        bs = child_bounds()
        return min(bs, default=INF)
    return INF


def check(text):
    """-> list of (query, problem, bound) offenders (class-A failures,
    annotated with the plan-proven row bound of the build side)."""
    offenders = []
    query = "<preamble>"
    block = []
    in_fence = False
    for ln in text.splitlines():
        if ln.startswith("## "):
            query = ln[3:].strip()
        if ln.startswith("```"):
            if in_fence:
                offenders.extend((query, p, b) for p, b in check_block(block))
                block = []
            in_fence = not in_fence
            continue
        if in_fence:
            block.append(ln)
    return offenders


def check_block(lines):
    problems = []
    details = parse_details(lines)
    for nodes in parse_segments(lines):
        by_id = {n[3]: idx for idx, n in enumerate(nodes) if n[3]}
        for i, (depth, name, rest, nid) in enumerate(nodes):
            if name != "BroadcastNestedLoopJoin":
                continue
            ch = children(nodes, i)
            if len(ch) != 2:
                problems.append((f"BNLJ ({nid}) with {len(ch)} children", INF))
                continue
            build = ch[0] if "BuildLeft" in rest else ch[1]
            ok, why = build_side_ok(nodes, build, details, by_id)
            if not ok:
                bound = row_bound(nodes, build, details, by_id)
                problems.append((f"BNLJ ({nid}): {why}", bound))
    return problems


SELFTEST = """## scratch_bad_bnlj

```
== Physical Plan ==
AdaptiveSparkPlan (5)
+- BroadcastNestedLoopJoin Cross BuildRight (4)
   :- Scan parquet  (1)
   +- BroadcastExchange (3)
      +- Scan parquet  (2)


(2) Scan parquet
Output [1]: [x#1L]

(4) BroadcastNestedLoopJoin
Join type: Cross
```

## scratch_good_bnlj

```
== Physical Plan ==
AdaptiveSparkPlan (6)
+- BroadcastNestedLoopJoin Cross BuildRight (5)
   :- Scan parquet  (1)
   +- BroadcastExchange (4)
      +- HashAggregate (3)
         +- Scan parquet  (2)


(3) HashAggregate
Input [1]: [x#1L]
Keys: []
Functions [1]: [count(1)]
```

## scratch_allowlisted_bounded

```
== Physical Plan ==
AdaptiveSparkPlan (6)
+- BroadcastNestedLoopJoin Cross BuildRight (5)
   :- Scan parquet  (1)
   +- BroadcastExchange (4)
      +- Filter (3)
         +- Scan parquet  (2)


(2) Scan parquet
Output [1]: [vec_id#1L]
PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,8)]
```

## scratch_allowlisted_unbounded

```
== Physical Plan ==
AdaptiveSparkPlan (6)
+- BroadcastNestedLoopJoin Cross BuildRight (5)
   :- Scan parquet  (1)
   +- BroadcastExchange (4)
      +- Filter (3)
         +- Scan parquet  (2)


(2) Scan parquet
Output [1]: [x#1L]
PushedFilters: [IsNotNull(x)]
```

## scratch_big_declared

```
== Physical Plan ==
AdaptiveSparkPlan (6)
+- BroadcastNestedLoopJoin Cross BuildRight (5)
   :- Scan parquet  (1)
   +- BroadcastExchange (4)
      +- Filter (3)
         +- Scan parquet  (2)


(2) Scan parquet
Output [1]: [x#1L]
PushedFilters: [IsNotNull(x)]
```
"""

SELFTEST_ALLOWLIST = {
    "scratch_allowlisted_bounded": (1, "query batch", None),
    "scratch_allowlisted_unbounded": (1, "claimed bounded, plan disagrees", None),
    # a big declared bound with NO runtime assertion must fail by name
    "scratch_big_declared": (1, "reviewed prose, no spec", 4096),
}


def adjudicate(text, allowlist=None):
    """Class-A failures resolved against the Class-B allowlist, with a row
    bound REQUIRED per entry (plan-proven or declared) and checked against
    ROW_BUDGET. -> (failures, bound_report) where bound_report is
    [(query, n_bnljs, bound, 'proven'|'declared')]."""
    if allowlist is None:
        allowlist = BOUNDED_BROADCAST_ALLOWLIST
    off = check(text)
    by_query = {}
    for q, p, b in off:
        by_query.setdefault(q, []).append((p, b))
    sections = set(re.findall(r"^## (\S+)", text, re.MULTILINE))
    failures = []
    report = []
    for q, probs in sorted(by_query.items()):
        allowed, reason, declared = allowlist.get(q, (0, "", None))
        if len(probs) > allowed:
            extra = probs if allowed == 0 else probs[allowed:]
            for p, _ in extra:
                failures.append(
                    f"FAIL {q}: {p} — not scalar-attach and beyond the "
                    f"allowlisted count ({allowed}); a NEW nested-loop join "
                    "needs a fix or a reviewed allowlist entry")
            continue
        worst = max(b for _, b in probs)
        if worst is not INF:
            kind = "proven"
        elif declared == "data":
            # documented data-sized broadcast (quadratic baseline / benchmark
            # set): exempt from the budget BY REVIEW, printed as such
            report.append((q, len(probs), "data-sized", "documented"))
            continue
        elif declared is not None:
            worst, kind = declared, "declared"
            if worst > DECLARED_CAP and q not in RUNTIME_ASSERTED:
                failures.append(
                    f"FAIL {q}: declared bound {worst} exceeds DECLARED_CAP "
                    f"{DECLARED_CAP} with no runtime assertion — add the "
                    "query to BnljBoundsSpec (and RUNTIME_ASSERTED) or prove "
                    "the bound from the plan")
                continue
            if q in RUNTIME_ASSERTED:
                kind = "declared+runtime-asserted"
        else:
            failures.append(
                f"FAIL {q}: allowlisted BNLJ build side has NO provable row "
                "bound in the plan and no declared bound in the allowlist — "
                "prove it (limit/range/pushed-filter) or declare a reviewed one")
            continue
        if worst > ROW_BUDGET:
            failures.append(
                f"FAIL {q}: build-side bound {worst} exceeds the "
                f"ROW_BUDGET {ROW_BUDGET} — this broadcast is not 'bounded'")
            continue
        report.append((q, len(probs), worst, kind))
    for q, (allowed, reason, declared) in sorted(allowlist.items()):
        if q in sections and len(by_query.get(q, [])) < allowed:
            failures.append(
                f"STALE {q}: allowlist expects {allowed} bounded-broadcast "
                f"BNLJs, dump has {len(by_query.get(q, []))} — tighten the entry")
    return failures, report


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        off = check(SELFTEST)
        flagged = sorted({q for q, _, _ in off})
        assert flagged == ["scratch_allowlisted_bounded",
                           "scratch_allowlisted_unbounded",
                           "scratch_bad_bnlj", "scratch_big_declared"], flagged
        failures, report = adjudicate(SELFTEST, SELFTEST_ALLOWLIST)
        assert any("scratch_bad_bnlj" in f for f in failures), failures
        assert any("scratch_allowlisted_unbounded" in f and "NO provable" in f
                   for f in failures), failures
        assert any("scratch_big_declared" in f and "DECLARED_CAP" in f
                   for f in failures), failures
        assert not any("scratch_allowlisted_bounded" in f for f in failures), failures
        assert report == [("scratch_allowlisted_bounded", 1, 8, "proven")], report
        print("selftest OK: raw BNLJ flagged, scalar-attach accepted, "
              "bounded allowlist entry proven <=8, unbounded allowlist "
              "entry fails by name, big declared bound without a runtime "
              "assertion fails by name")
        return 0
    path = sys.argv[1] if len(sys.argv) > 1 else "PLANS.md"
    with open(path) as f:
        text = f.read()
    failures, report = adjudicate(text)
    n_bnlj = text.count("BroadcastNestedLoopJoin")
    for q, n, bound, kind in report:
        print(f"  {q}: {n} BNLJ(s), build side {kind} <= {bound} rows")
    if failures:
        for f_ in failures:
            print(f_)
        return 1
    n_allowed = sum(n for _, n, _, _ in report)
    print(f"OK: every BNLJ in {path} is scalar-attach or an allowlisted "
          f"bounded broadcast ({n_allowed} allowlisted across {len(report)} "
          f"queries, every bound <= {ROW_BUDGET}); "
          f"{n_bnlj} BNLJ mentions scanned")
    return 0


if __name__ == "__main__":
    sys.exit(main())
