#!/usr/bin/env python3
"""Global BroadcastNestedLoopJoin adjudicator over the DumpPlans output
(VERDICT r16 ask #2): every BNLJ in every committed plan dump must be one of
the two BENIGN classes, else this check fails NAMING the query — so the
300-odd BNLJs no longer need manual spot-checks every round, and a real
nested-loop join can't hide among them.

Class A (auto-proven): ONE-ROW-AGGREGATE build side — the scalar-attach
idiom. From the BNLJ's build child, descend through single-child
pass-through nodes (Project/Filter/Exchange/BroadcastExchange/Sort/...),
resolving ReusedExchange references, until an aggregate node; benign iff
its detail block shows `Keys: []` (a global aggregate -> exactly one row).

Class B (reviewed allowlist): BOUNDED-BROADCAST build side — a cross join
against a side bounded by CONSTRUCTION, not by data: an ANN query batch
(`PushedFilters: LessThan(vec_id, 8)`), a centroid/codebook table (LIMIT
16 / index parameters), a plan-literal model grid (Range(256), a Union of
per-language constants), a query-term count. These cannot be proven from
the dump alone, so each is an explicit (query -> exact count + reason)
entry below. The count is EXACT: a new unexplained BNLJ in an allowlisted
query fails (extend the entry only with a reviewed reason), and a stale
entry (count shrank) also fails so the table tracks the plans.

Usage: python3 tools/check_bnlj.py [PLANS.md]
       python3 tools/check_bnlj.py --selftest
"""
import re
import sys

# query -> (exact count of non-scalar BNLJs, reviewed reason)
BOUNDED_BROADCAST_ALLOWLIST = {
    # ANN family: broadcast 8-row query batch (vec_id < 8, pushed filter)
    # and/or index-parameter-bounded centroid/codebook constant tables
    "s1_knn_bruteforce": (1, "broadcast 8-row query batch"),
    "s7_sq8_knn": (1, "broadcast query batch + SQ8 bounds row chain"),
    "s8_pq_adc_knn": (1, "broadcast query batch + 16-seed codebook chain"),
    "s11_pq_trained": (1, "broadcast query batch + trained codebook chain"),
    "s16_ann_recall": (12, "per-method recall harness: broadcast query batch per arm"),
    "s26_matryoshka_recall": (4, "broadcast 8-row query batch per truncation arm"),
    "s19_ivfpq_persisted": (1, "broadcast 8-row query batch over persisted index"),
    "s20_ivfpq_persisted_refine": (1, "broadcast 8-row query batch"),
    "s23_ivfpq_deleted": (1, "broadcast 8-row query batch"),
    "s24_ivfpq_filtered_serve": (1, "broadcast 8-row query batch"),
    "s25_binary_sign_knn": (1, "broadcast 8-row query batch"),
    "ds3_ann_ingest_exactly_once": (1, "broadcast 8-row query batch"),
    "e2_retrieval_metrics": (2, "broadcast query batch, approx + exact arms"),
    "r1_hard_negatives": (1, "broadcast query batch joined to labels"),
    "d8_embedding_neardup": (1, "documented quadratic baseline: broadcast prepared side"),
    "d32_semantic_decontaminate": (1, "broadcast benchmark set (|B|-bounded, documented)"),
    "fn5_decontamination_funnel": (1, "d32's broadcast benchmark set inside the funnel"),
    # retrieval scoring: the broadcast side is the query-term statistics
    # table — bounded by |query terms| (a literal list), not by data
    "fts3_hybrid_rrf": (1, "broadcast query-term stats"),
    "fts8_ql_dirichlet": (1, "broadcast query-term corpus-frequency table"),
    "lm10_jm_rank": (1, "broadcast query-term corpus-frequency table"),
    # trained/plan-literal model grids: Range(256) hash buckets and Unions
    # of per-language constant relations (langs x buckets, documented
    # constant-bounded in TextOps)
    "t22_quality_classifier": (1, "Union of plan-literal class priors"),
    "t28_trained_langid": (3, "Range(256) bucket grid x2 + per-lang model Union"),
    "t29_langid_margin": (3, "Range(256) bucket grid x2 + per-lang model Union"),
    "e10_confusion_counts": (1, "Union of two scalar-aggregate threshold arms"),
    "e15_cohens_kappa": (1, "Union of two scalar-aggregate threshold arms"),
    # two-level bucket walk: the broadcast side joins two scalar aggregates
    "sk3_skew_report": (2, "broadcast join of scalar percentile cut rows"),
    # bitext mining: per index serve, one BNLJ broadcasts the persisted
    # CODEBOOK table — one packed row per index (array<array<array<bigint>>>,
    # bounded by index params m x k), scanned from storage so the one-row
    # proof isn't in the plan; the serve subtree appears 3x per query (fwd,
    # bwd, and the stats reuse duplicate it)
    "b1_bitext_mining": (3, "persisted one-row codebook table x3 serve subtrees"),
    "b2_bitext_refined": (3, "persisted one-row codebook table x3 serve subtrees"),
    # funnel latency percentiles: the sk3 shape — broadcast join of scalar
    # percentile cut rows (median + p90 resolve)
    "w16_funnel_latency": (2, "broadcast join of scalar percentile cut rows"),
}

PASS_THROUGH = {
    "Project", "Filter", "Exchange", "BroadcastExchange", "Sort",
    "AdaptiveSparkPlan", "ColumnarToRow", "InputAdapter", "Coalesce",
    "WholeStageCodegen", "LocalLimit", "CollectLimit",
}
AGGREGATES = {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}

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
        if name not in PASS_THROUGH:
            return False, f"non-aggregate build side: {name} ({nid})"
        ch = children(nodes, i)
        if len(ch) != 1:
            return False, f"pass-through {name} with {len(ch)} children"
        i = ch[0]


def check(text):
    """-> list of (query, problem) offenders."""
    offenders = []
    query = "<preamble>"
    block = []
    in_fence = False
    for ln in text.splitlines():
        if ln.startswith("## "):
            query = ln[3:].strip()
        if ln.startswith("```"):
            if in_fence:
                offenders.extend((query, p) for p in check_block(block))
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
                problems.append(f"BNLJ ({nid}) with {len(ch)} children")
                continue
            build = ch[0] if "BuildLeft" in rest else ch[1]
            ok, why = build_side_ok(nodes, build, details, by_id)
            if not ok:
                problems.append(f"BNLJ ({nid}): {why}")
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
"""


def adjudicate(text):
    """Class-A failures resolved against the Class-B allowlist.
    -> (failures, n_allowed) where failures is a list of strings."""
    off = check(text)
    by_query = {}
    for q, p in off:
        by_query.setdefault(q, []).append(p)
    sections = set(re.findall(r"^## (\S+)", text, re.MULTILINE))
    failures = []
    n_allowed = 0
    for q, probs in sorted(by_query.items()):
        allowed, reason = BOUNDED_BROADCAST_ALLOWLIST.get(q, (0, ""))
        if len(probs) > allowed:
            extra = probs if allowed == 0 else probs[allowed:]
            for p in extra:
                failures.append(
                    f"FAIL {q}: {p} — not scalar-attach and beyond the "
                    f"allowlisted count ({allowed}); a NEW nested-loop join "
                    "needs a fix or a reviewed allowlist entry")
        else:
            n_allowed += len(probs)
    for q, (allowed, reason) in sorted(BOUNDED_BROADCAST_ALLOWLIST.items()):
        if q in sections and len(by_query.get(q, [])) < allowed:
            failures.append(
                f"STALE {q}: allowlist expects {allowed} bounded-broadcast "
                f"BNLJs, dump has {len(by_query.get(q, []))} — tighten the entry")
    return failures, n_allowed


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        off = check(SELFTEST)
        assert [q for q, _ in off] == ["scratch_bad_bnlj"], off
        failures, _ = adjudicate(SELFTEST)
        assert len(failures) == 1 and "scratch_bad_bnlj" in failures[0], failures
        print(f"selftest OK: injected two-row BNLJ flagged as {off[0]}, "
              "scalar-attach accepted")
        return 0
    path = sys.argv[1] if len(sys.argv) > 1 else "PLANS.md"
    with open(path) as f:
        text = f.read()
    failures, n_allowed = adjudicate(text)
    n_bnlj = text.count("BroadcastNestedLoopJoin")
    if failures:
        for f_ in failures:
            print(f_)
        return 1
    print(f"OK: every BNLJ in {path} is scalar-attach or an allowlisted "
          f"bounded broadcast ({n_allowed} allowlisted); "
          f"{n_bnlj} BNLJ mentions scanned")
    return 0


if __name__ == "__main__":
    sys.exit(main())
