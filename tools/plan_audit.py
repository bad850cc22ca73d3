"""Registry-wide physical-plan audit: one row per registered query with
its Exchange count, join shapes, and scan-pushdown evidence, written to
PLAN_AUDIT.md.

This materializes the `.explain("formatted")` discipline as a reviewable
artifact: plan regressions (an accidental cartesian, a lost broadcast, a
filter that stopped pushing) show up as a diff of this file, not just as
a test failure.

Usage: python tools/plan_audit.py [sf_dir] > /dev/null  (writes PLAN_AUDIT.md)
"""

from __future__ import annotations

import contextlib
import io
import re
import sys
import time

sys.path.insert(0, ".")

# ---------------------------------------------------------------------------
# Estimate-built-broadcast detection (the q235 x100 failure class, r9/r10).
#
# A BroadcastHashJoin whose build side rides a size ESTIMATE over
# corpus-scaled lineage is a latent at-scale abort: the static planner's
# selectivity/aggregate estimate can sit under the broadcast threshold while
# the true relation is ~GB, and the runtime broadcast then dies ("Not enough
# memory to build and broadcast", q235 at x100). Empirical r10 finding that
# widens the class: a lazily-materialized frame (util.materialize ->
# localCheckpoint -> `Scan ExistingRDD`) COPIES its original plan's estimate
# into the LogicalRDD — "materialized" does NOT mean real stats, so builds
# over ExistingRDD lineage are classified corpus-scaled-estimate too.
#
# Classification walks each BroadcastExchange subtree bottom-up:
#   corpus-scaled leaves: parquet scans of the SF tables (all but
#     region/nation) and `Scan ExistingRDD` (every materialize() call site
#     in this engine wraps a corpus-scaled relation);
#   bounded leaves: region/nation, LocalTableScan, ReusedExchange;
#   keyless aggregates and Limit/TakeOrderedAndProject bound the subtree;
#   aggregates grouping ONLY by bounded-domain columns bound it (their
#     output cardinality is fixed by the domain, not the corpus);
#   Filter / keyed aggregates / joins / Generate mark the subtree
#     estimate-derived without bounding it.
#
# Two severity classes (the r10 refinement, mechanism-backed):
#
# FATAL — the build lineage contains `Generate` (explode) or `Scan
#   ExistingRDD`. Spark's size-only estimator models Generate as
#   child-size x output-width-ratio with NO fanout term, so a token/
#   shingle/edge explosion is under-estimated by (fanout x width ratio) —
#   unbounded, growing with document size. A LogicalRDD COPIES that
#   under-estimate at materialization. This is the exact q235 shape whose
#   runtime broadcast of a ~GB relation aborted at x100. Every fatal site
#   must be pinned (shuffle_hash) or restructured.
#
# LINEAR (benign, dispositioned as a class) — Filter/aggregate/join
#   estimates over raw parquet scans. Without CBO, Filter propagates its
#   child's sizeInBytes unchanged, aggregates scale by row-width ratio,
#   and joins over-estimate (size product) — all track or over-track the
#   real file size, so at 100 TB the estimate crosses the broadcast
#   threshold WITH the data and the planner degrades to a shuffle join on
#   its own (demonstrated at x100 in the hand-written section). The small
#   -SF broadcast of a filtered dimension is the plan you want.
# ---------------------------------------------------------------------------

_BOUNDED_TABLES = {"region", "nation"}
# column names whose value domain is fixed regardless of corpus size
_BOUNDED_KEYS = {
    "l_returnflag", "l_linestatus", "l_shipmode", "l_shipinstruct",
    "l_quantity", "l_discount", "l_tax", "l_shipdate", "l_commitdate",
    "l_receiptdate", "o_orderstatus", "o_orderpriority", "o_orderdate",
    "c_mktsegment", "c_nationkey", "s_nationkey", "n_nationkey", "n_name",
    "n_regionkey", "r_regionkey", "r_name", "p_brand", "p_mfgr",
    "p_container", "p_size", "p_type", "event_type", "lang", "source",
    "status", "digit", "bucket", "band", "month", "day", "hour", "dow",
    "week", "grp", "decile", "quartile", "code", "label_true",
    # embeddings: label is a bounded classification domain; dim is the
    # fixed embedding dimensionality
    "label", "dim",
    # util.bucketed_global_rank's reserved internal bucket key: bounded
    # cardinality is that helper's documented PREcondition ("whenever the
    # leading sort key has bounded cardinality"), so its per-bucket
    # count/offset tables are bounded wherever the helper is used
    "_bkt",
}
_BOUNDING_NODES = {"GlobalLimit", "CollectLimit", "LocalLimit", "TakeOrderedAndProject"}
_AGG_NODES = {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}

# Dispositioned fatal-class sites: builds whose TRUE size is bounded by an
# operator contract the physical plan cannot show. Keyed by query name;
# each entry is (chain_prefix, reason) — a flagged site whose chain starts
# with chain_prefix is reported as DISPOSITIONED (with the reason) instead
# of counted fatal. Keep reasons concrete: what bounds the build, and why
# a pin is wrong or impossible there.
DISPOSITIONS: dict[str, list[tuple[str, str]]] = {
    "q50_fuzzy_prefix_pairs": [
        (
            "Project>Scan ExistingRDD",
            "the CAPPED block table: <= |lang x length-band domain (30)| "
            "x max_block (500) rows at any corpus scale — over-cap blocks "
            "drop whole before the self-join, so the broadcast bound is "
            "structural, not an estimate (the r10 shuffle-hash pin "
            "measured 3.9x slower at sf0.1 for zero scale benefit); the "
            "uncapped variant pins shuffle-hash in code",
        ),
        (
            "Project>Filter>Scan ExistingRDD",
            "same capped block table (plan variant with a residual "
            "not-null filter over the materialized scan)",
        ),
    ],
    "q233_kmeans_iterated": [
        (
            "Scan ExistingRDD",
            "k-row centroid table (k=8, fixed by the operator contract); "
            "the Lloyd assignment is a cross join where broadcast is the "
            "only non-cartesian strategy, and k bounds the build at any "
            "corpus scale",
        ),
        (
            "HashAggregate>Exchange>HashAggregate>Generate>Project",
            "the Lloyd centroid-recompute aggregate keyed by (cell, dim): "
            "cell is the assignment id (< k=8 by contract) and dim the "
            "fixed embedding dimensionality, so the build is k x d rows "
            "at any corpus scale — bounded in truth, like the centroid "
            "cross-join above (interior to the per-round materialize)",
        ),
    ],
    "q74_incremental_dedup": [
        (
            "HashAggregate>Exchange>HashAggregate>Project>Scan ExistingRDD",
            "the NEW batch's touched-bucket set (distinct (band, bh) over "
            "the materialized new-batch bands) — batch-scaled by the "
            "ingest contract, broadcast deliberately (F.broadcast in "
            "dedup.lsh_candidate_pairs_incremental) to semi-join the "
            "store without shuffling it; the corpus-scaled cap/probe "
            "joins around it are pinned shuffle-hash",
        ),
    ],
}


def _parse_trees(text: str):
    """Yield (nodes, details) per physical-plan/subquery section.

    nodes: list of (depth, name, id, child_indices...) in pre-order;
    details: {id: {attr: value}} for that section."""
    # keep tree/detail numbering consistent within a section
    sections = re.split(r"^(?=Subquery:)", text, flags=re.M)
    node_re = re.compile(r"^([:\s+\-]*)\*?\s?([A-Za-z][A-Za-z0-9 ]*?)\s*\((\d+)\)\s*$")
    detail_re = re.compile(r"^\((\d+)\) ([A-Za-z][A-Za-z0-9 ]*?)(?: \[codegen.*)?$")
    for sec in sections:
        nodes = []  # (depth, name, id)
        details: dict[int, dict[str, str]] = {}
        cur = None
        for line in sec.splitlines():
            m = node_re.match(line)
            if m and (m.group(1) or not nodes) and "==" not in line:
                prefix, name, nid = m.groups()
                nodes.append((len(prefix) // 3, name.strip(), int(nid)))
                continue
            dm = detail_re.match(line)
            if dm:
                cur = details.setdefault(int(dm.group(1)), {"_name": dm.group(2)})
                continue
            if cur is not None and ":" in line:
                k, _, v = line.partition(":")
                cur[k.split("[")[0].strip()] = v.strip()
        if nodes:
            yield nodes, details


def _subtree(nodes, i):
    """Indices of the subtree rooted at nodes[i] (pre-order, by depth)."""
    d = nodes[i][0]
    out = [i]
    for j in range(i + 1, len(nodes)):
        if nodes[j][0] <= d:
            break
        out.append(j)
    return out


def _children(nodes, idxs):
    """Direct children (within idxs) of idxs[0]."""
    d = nodes[idxs[0]][0]
    return [j for j in idxs[1:] if nodes[j][0] == d + 1]


def _classify(nodes, details, i) -> tuple[str, bool]:
    """(scale, estimate_derived) for the subtree rooted at nodes[i]."""
    _, name, nid = nodes[i]
    idxs = _subtree(nodes, i)
    kids = _children(nodes, idxs)
    det = details.get(nid, {})
    if name.startswith("Scan parquet") or name == "Scan parquet":
        loc = det.get("Location", "")
        table = re.search(r"/(\w+)\.parquet", loc)
        bounded = table and table.group(1) in _BOUNDED_TABLES
        return ("bounded" if bounded else "corpus", False)
    if name == "Scan ExistingRDD":
        return ("corpus", True)  # LogicalRDD copies the ESTIMATE (r10)
    if name in ("LocalTableScan", "ReusedExchange", "ReusedSubquery"):
        return ("bounded", False)
    if name in _BOUNDING_NODES:
        return ("bounded", False)
    sub = [_classify(nodes, details, k) for k in kids] or [("bounded", False)]
    scale = "corpus" if any(s == "corpus" for s, _ in sub) else "bounded"
    est = any(e for _, e in sub)
    if name in _AGG_NODES:
        keys_raw = det.get("Keys", "")
        keys = re.findall(r"(\w+?)#\d+", keys_raw)
        if not keys:
            return ("bounded", False)  # scalar aggregate: 1 row
        if all(k in _BOUNDED_KEYS for k in keys):
            return ("bounded", True)  # bounded-domain group keys
        return (scale, True)
    if name == "Filter":
        # an equality or upper bound against a literal on a key/id column
        # selects O(1) / O(literal) rows (the ANN query-point pattern
        # `vec_id = 0`; the benchmark-slice pattern `doc_id < 20`) —
        # bounded in truth regardless of lineage
        cond = det.get("Condition", "")
        if re.search(r"\(\w*(?:id|key)\w*#\d+L? (?:=|<|<=) \d+\)", cond) and " OR " not in cond:
            return ("bounded", False)
        return (scale, True)
    if "Join" in name or name == "Generate":
        return (scale, True)
    return (scale, est)


def estimate_built_broadcasts(
    plan_text: str, dispositions: list[tuple[str, str]] | None = None
) -> tuple[list[str], list[str], int]:
    """(fatal_sites, dispositioned_sites, n_linear): fatal-class
    BroadcastExchange builds (to pin), sites cleared by a DISPOSITIONS
    entry, and the count of benign linear-tracking estimate builds
    (class disposition in PLAN_AUDIT.md's hand-written section)."""
    fatal, okayed, linear = [], [], 0
    for nodes, details in _parse_trees(plan_text):
        for i, (_, name, nid) in enumerate(nodes):
            if name != "BroadcastExchange":
                continue
            kids = _children(nodes, _subtree(nodes, i))
            if not kids:
                continue
            scale, est = _classify(nodes, details, kids[0])
            if scale != "corpus" or not est:
                continue
            sub_names = {nodes[j][1] for j in _subtree(nodes, kids[0])}
            if "Generate" in sub_names or "Scan ExistingRDD" in sub_names:
                chain = ">".join(
                    nodes[j][1] for j in _subtree(nodes, kids[0])[:5]
                )
                matched = next(
                    (
                        reason
                        for prefix, reason in dispositions or []
                        if chain.startswith(prefix)
                    ),
                    None,
                )
                if matched is not None:
                    okayed.append(f"({nid}) {chain} — DISPOSITIONED: {matched}")
                else:
                    fatal.append(f"({nid}) {chain}")
            else:
                linear += 1
    return fatal, okayed, linear


def audit_interior_plans(
    plans: list[str], dispositions: list[tuple[str, str]] | None = None
) -> tuple[list[str], list[str], int, int]:
    """Classify the plans captured from util.materialize()/session-cache
    sites while a query was constructed (util.PLAN_CAPTURE): joins
    INTERIOR to a checkpoint execute during materialization, print as
    `Scan ExistingRDD` leaves downstream, and are invisible to an
    explain of the query's final frame — the r10 audit's documented
    blind spot, closed here. Returns (fatal_sites, dispositioned_sites,
    n_linear, n_cartesian) aggregated over all interior plans."""
    fatal, okayed, linear, cart = [], [], 0, 0
    for k, p in enumerate(plans):
        f, o, n_lin = estimate_built_broadcasts(p, dispositions)
        fatal += [f"[interior {k}] {s}" for s in f]
        okayed += [f"[interior {k}] {s}" for s in o]
        linear += n_lin
        cart += len(re.findall(r"CartesianProduct", p))
    return fatal, okayed, linear, cart


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import hadoop_jobanalyzer_spark.util as _util
    from hadoop_jobanalyzer_spark.plans.registry import QUERIES
    from hadoop_jobanalyzer_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PLAN_AUDIT — physical plan shape per registered query",
        "",
        f"Generated by `tools/plan_audit.py` at {sf_dir}. Columns:",
        "Exchanges (shuffles in the plan), BHJ (broadcast hash joins),",
        "SMJ (sort-merge joins), BNLJ (broadcast nested loops — allow-listed",
        "1-row/tiny-domain cases only, see tests/test_plan_quality.py),",
        "PushedScans (scans with non-empty PushedFilters), Cartesian (must",
        "be 0 everywhere), EstBHJ (FATAL-class broadcast builds: a size",
        "ESTIMATE over Generate/ExistingRDD lineage, where the estimator",
        "has no fanout term — the q235 x100 abort class; must be 0 or",
        "pinned), EstLin (benign linear-tracking estimate builds over raw",
        "parquet — safe as a class, dispositioned in the hand-written",
        "section below), Int (interior plans captured from",
        "materialize()/session-cache sites during query construction —",
        "these execute inside a checkpoint and print as `Scan ExistingRDD`",
        "downstream, so only this capture can audit them; cache builds",
        "attribute to their first consumer in sorted order), IntEstBHJ",
        "(fatal-class sites inside those interior plans; must be 0 or",
        "dispositioned; interior cartesians fold into the Cartesian",
        "column).",
        "",
        "| query | Exchanges | BHJ | SMJ | BNLJ | PushedScans | Cartesian | EstBHJ | EstLin | Int | IntEstBHJ |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    t0 = time.time()
    totals = {"CartesianProduct": 0, "EstBHJ": 0, "EstLin": 0, "IntEstBHJ": 0}
    est_sites: dict[str, list[str]] = {}
    for name in sorted(QUERIES):
        fn, _ = QUERIES[name]
        spark.catalog.clearCache()
        _util.PLAN_CAPTURE = interior = []
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
        finally:
            _util.PLAN_CAPTURE = None
        p = buf.getvalue()
        n_ex = len(re.findall(r"^\(\d+\) Exchange", p, re.M))
        bhj = len(re.findall(r"^\(\d+\) BroadcastHashJoin", p, re.M))
        smj = len(re.findall(r"^\(\d+\) SortMergeJoin", p, re.M))
        bnlj = len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", p, re.M))
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", p))
        cart = len(re.findall(r"CartesianProduct", p))
        est, okayed, n_lin = estimate_built_broadcasts(p, DISPOSITIONS.get(name))
        i_est, i_okayed, i_lin, i_cart = audit_interior_plans(
            interior, DISPOSITIONS.get(name)
        )
        cart += i_cart
        totals["CartesianProduct"] += cart
        totals["EstBHJ"] += len(est)
        totals["EstLin"] += n_lin + i_lin
        totals["IntEstBHJ"] += len(i_est)
        if est or okayed or i_est or i_okayed:
            est_sites[name] = est + okayed + i_est + i_okayed
        lines.append(
            f"| {name} | {n_ex} | {bhj} | {smj} | {bnlj} | {pushed} | {cart} "
            f"| {len(est)} | {n_lin} | {len(interior)} | {len(i_est)} |"
        )
        print(
            f"{name}: ex={n_ex} bhj={bhj} smj={smj} bnlj={bnlj} est={len(est)} "
            f"lin={n_lin} int={len(interior)} int_est={len(i_est)}",
            flush=True,
        )
    # keep the artifact deterministic (no wall time) so round_close's
    # dirty-diff check only fires on real plan-shape changes
    print(f"audited in {time.time() - t0:.0f}s", flush=True)
    lines += [
        "",
        f"{len(QUERIES)} queries audited; "
        f"cartesian products: {totals['CartesianProduct']} (expected 0); "
        f"fatal estimate-built broadcasts: {totals['EstBHJ']} (expected 0); "
        f"fatal interior (checkpoint-hidden) sites: {totals['IntEstBHJ']} "
        f"(expected 0); "
        f"linear-class estimate builds: {totals['EstLin']} (class-dispositioned below).",
        "",
    ]
    if est_sites:
        lines += [
            "## Fatal estimate-built broadcast sites (flagged)",
            "",
            "Build-side chains (first 5 nodes) per flagged BroadcastExchange;",
            "each needs a shuffle_hash pin, a restructure, or a hand-written",
            "disposition below the marker.",
            "",
        ]
        for name in sorted(est_sites):
            for site in est_sites[name]:
                lines.append(f"- {name}: {site}")
        lines.append("")
    # Preserve hand-written analysis below the marker across regenerations
    # (the rewrite used to silently drop it — r3 lesson).
    marker = "<!-- hand-written below; plan_audit.py preserves this -->"
    try:
        with open("PLAN_AUDIT.md") as f:
            old = f.read()
        if marker in old:
            lines += [marker + old.split(marker, 1)[1]]
    except OSError:
        pass
    with open("PLAN_AUDIT.md", "w") as f:
        f.write("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
