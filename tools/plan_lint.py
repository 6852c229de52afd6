"""Plan lint: build the physical plan of EVERY declared query at
sf0.001 and flag scale anti-patterns — the automated version of the
per-query plan audits in ARCHITECTURE.md/PLANS.md:

- ``cartesian``        CartesianProduct (non-broadcast product join)
- ``py-row-udf``       BatchEvalPython (row-at-a-time Python — the slow
                       path; Arrow surfaces show up as ArrowEvalPython
                       and are allowed)
- ``global-sort``      Exchange SinglePartition directly feeding a
                       Sort/Window (a single-task global order — the
                       scale killer WindowExec hides)
- ``generate-pushdown`` a ``size(...)`` Filter BELOW a round-robin
                       Exchange: the optimizer's inferred generate
                       guard (plain ``explode`` ⇒ ``size(e)>0``)
                       dragged beneath an ``ensure_parallelism``
                       repartition, re-evaluating the generator input
                       in the serial pre-exchange task — the round-7
                       13.5 s q_hybrid_retrieve lesson
                       (ARCHITECTURE.md "Generate-filter pushdown vs
                       ensure_parallelism"). Fix: ``explode_outer`` +
                       null filter on the GENERATED column.

Each allowlist entry must carry a reason; an unallowed hit fails the
lint (wired into tests/test_contract_lint.py). Planning only — no
query is executed, though operators that train driver-side models at
build time (PQ codebooks, BPE merges, KMeans) do run their bounded
sample jobs.

Usage: python tools/plan_lint.py   (prints a report, exit 1 on violations)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

#: name -> {rule: reason}. A reason is REQUIRED — an allowlist entry
#: without a why is just a muted alarm.
ALLOW: dict[str, dict[str, str]] = {
    "q_cross_join_count": {
        "cartesian": "the declared operator IS a cross join (§2.3 standard "
        "suite); counts only, never materialized wide"
    },
    "q_jaccard_pairs": {
        "cartesian": "documented no-block opt-out path exercising the "
        "verifier on its own (dedup_approx.py:245); production callers "
        "go through LSH blocking"
    },
    "q_embedding_near_dups": {
        "cartesian": "brute-force baseline the ANN variants are "
        "recall-pinned against; the scale path is "
        "q_embedding_near_dups_ann"
    },
    "q_embedding_cosine_topk": {
        "cartesian": "brute-force cosine baseline (bounded query side); "
        "scale path is q_ann_lsh_topk / q_ivf_ann_topk / q_pq_ann_topk"
    },
    "q_udtf_split": {
        "py-row-udf": "the declared surface IS the Python UDTF "
        "integration demo, oracle-proven vs pure SQL (§2.10)"
    },
    "q_compaction_execute": {
        "global-sort": "the packing window runs over the snapshot "
        "MANIFEST (one row per file — metadata, not data; 5 rows on "
        "the fixture, bounded by file count at any scale), the same "
        "grain every table format's compactor plans at"
    },
}


_NODE_RE = re.compile(r"^(?P<prefix>[\s:+\-]*)(?:\*\(\d+\)\s*)?(?P<op>\w+)")


def _global_sort_hit(plan: str) -> str | None:
    """Structural global-sort detection: flag a Sort/Window node whose
    OWN subtree contains ``Exchange SinglePartition``, with any number
    of intervening WholeStageCodegen/InputAdapter/Project lines.

    The old rule only fired when the exchange sat on the very next
    line, which real plans rarely satisfy — a silent false negative in
    a gate. The structural test walks the FIRST-CHILD SPINE below the
    Sort/Window (EnsureRequirements inserts the distribution-providing
    Exchange directly beneath the node that requires it, modulo
    wrapper nodes) and decides at the first non-wrapper node: an
    ``Exchange SinglePartition`` there means the sort itself runs in
    one task; anything else (hash/range exchange, aggregate, join,
    scan) means it doesn't. Scanning the WHOLE subtree instead would
    false-positive on every single-partition exchange that feeds a
    legitimate one-row global aggregate deeper in the tree (e.g. the
    corpus-size count inside tf-idf).
    """
    nodes = _parse_nodes(plan)
    pass_through = {
        "WholeStageCodegen", "InputAdapter", "ColumnarToRow", "Project",
        "AQEShuffleRead", "ShuffleQueryStage", "Sort",  # Window sits on Sort
    }
    for i, (indent, op, text) in enumerate(nodes):
        if op != "Sort" and not op.startswith("Window"):
            continue
        spine_indent = indent
        for child_indent, child_op, child_text in nodes[i + 1 :]:
            if child_indent <= indent:
                break  # left the Sort/Window subtree entirely
            if child_indent <= spine_indent:
                break  # a sibling branch, not the first-child spine
            spine_indent = child_indent
            if child_op in pass_through:
                continue
            if "Exchange SinglePartition" in child_text:
                return text[:100]
            break  # first real node is not a single-partition exchange
    return None


def _parse_nodes(plan: str) -> list[tuple[int, str, str]]:
    """(indent, op, stripped line) per plan-tree node line."""
    nodes = []
    for line in plan.splitlines():
        m = _NODE_RE.match(line)
        if m and m.group("op"):
            nodes.append((len(m.group("prefix")), m.group("op"), line.strip()))
    return nodes


def generate_pushdown_hit(plan: str) -> str | None:
    """Flag an inferred generate guard pushed below a round-robin
    exchange: any ``Filter`` containing ``size(`` in the subtree of an
    ``Exchange RoundRobinPartitioning`` node. A plain ``explode(e)``
    makes Catalyst infer ``size(e) > 0 AND isnotnull(e)`` and push it
    through a round-robin repartition to the scan side, so the
    generator-input expression (tokenize/gram concat — the exact work
    the repartition exists to parallelize) is evaluated in the serial
    pre-exchange task. Hash/range exchanges are exempt: a filter below
    those was pushed past a SEMANTIC shuffle, which is the optimizer
    doing its job.
    """
    nodes = _parse_nodes(plan)
    for i, (indent, op, text) in enumerate(nodes):
        if op != "Exchange" or "RoundRobinPartitioning" not in text:
            continue
        for child_indent, child_op, child_text in nodes[i + 1 :]:
            if child_indent <= indent:
                break  # left the exchange's subtree
            if child_op == "Filter" and "size(" in child_text:
                return child_text[:120]
    return None


def lint(dfs: dict | None = None, max_workers: int = 8) -> int:
    """``dfs``: optional prebuilt name -> DataFrame dict (the test
    suite's shared ``built_queries`` fixture) so the lint doesn't pay a
    second full-registry construction pass; built here when absent.
    Physical planning is fanned over a small driver thread pool — each
    ``executedPlan()`` call is independent JVM work."""
    from concurrent.futures import ThreadPoolExecutor

    from scrappy_spark.plans import registry
    from scrappy_spark.session import get_spark

    spark = get_spark("plan_lint")
    violations: list[tuple[str, str, str]] = []
    allowed_hits: list[tuple[str, str]] = []

    def plan_of(item):
        name, spec = item
        try:
            df = dfs[name] if dfs is not None and name in dfs else spec.fn(spark, SF_DIR)
            return name, df._jdf.queryExecution().executedPlan().toString(), None
        except Exception as exc:  # a query that cannot even plan is its own bug
            return name, None, str(exc).splitlines()[0][:120]

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        planned = list(pool.map(plan_of, registry.all_specs().items()))

    for name, plan, err in planned:
        if err is not None:
            violations.append((name, "plan-error", err))
            continue
        hits: list[tuple[str, str]] = []
        if "CartesianProduct" in plan:
            hits.append(("cartesian", "CartesianProduct in plan"))
        if re.search(r"\bBatchEvalPython\b", plan):
            hits.append(("py-row-udf", "BatchEvalPython (row-at-a-time) in plan"))
        gs = _global_sort_hit(plan)
        if gs is not None:
            hits.append(("global-sort", gs))
        gp = generate_pushdown_hit(plan)
        if gp is not None:
            hits.append(("generate-pushdown", gp))
        for rule, detail in hits:
            if rule in ALLOW.get(name, {}):
                allowed_hits.append((name, rule))
            else:
                violations.append((name, rule, detail))
    print(f"linted {len(registry.all_specs())} query plans")
    for name, rule in allowed_hits:
        print(f"  allowed  {name}: {rule} — {ALLOW[name][rule][:60]}…")
    for name, rule, detail in violations:
        print(f"  VIOLATION {name}: {rule} — {detail}")
    if not violations:
        print("0 violations")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(lint())
