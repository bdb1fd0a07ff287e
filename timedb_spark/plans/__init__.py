"""Plan inspection + assertion helpers (SURVEY §6 — scale hygiene as tests).

At 100 TB the difference between a good and a bad run is plan shape:
filters reaching the parquet scan, small sides broadcast, whole-stage
codegen spans covering the hot path, no stray cartesian products. These
helpers turn those properties into pytest assertions so a regression in
plan shape fails CI, not the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text of the optimized physical plan."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def partition_filters(df: DataFrame) -> list[str]:
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — the column-pruning witness."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def count_ops(df: DataFrame, op: str) -> int:
    """Count physical nodes of a type via their detail headers ``(id) Op`` —
    each node appears exactly once there (the tree rendering would double-
    count)."""
    return len(re.findall(rf"^\(\d+\) {re.escape(op)}\b", formatted_plan(df), re.MULTILINE))


def num_shuffles(df: DataFrame) -> int:
    return count_ops(df, "Exchange")  # BroadcastExchange headers don't match


def wholestage_codegen_ids(df: DataFrame) -> set[str]:
    return set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df)))


# -- assertions --------------------------------------------------------------


def assert_pushed_filter(df: DataFrame, *fragments: str) -> None:
    """Each fragment must appear in some pushed (data or partition) filter."""
    hay = " ; ".join(pushed_filters(df) + partition_filters(df))
    missing = [f for f in fragments if f.lower() not in hay.lower()]
    assert not missing, f"filters not pushed to scan: {missing}\nplan filters: {hay}"


def assert_column_pruned(df: DataFrame, table_cols: dict[str, int]) -> None:
    """Every scan must read at most the stated number of columns
    (``{schema_fragment: max_cols}`` keyed by a column name identifying the
    scan)."""
    schemas = read_schemas(df)
    for frag, max_cols in table_cols.items():
        for s in schemas:
            if frag in s:
                n = s.count(":")
                assert n <= max_cols, f"scan containing {frag!r} reads {n} cols (> {max_cols}): {s}"
                break
        else:
            raise AssertionError(f"no scan with column {frag!r}; schemas: {schemas}")


def assert_broadcast_joins(df: DataFrame, at_least: int) -> None:
    n = count_ops(df, "BroadcastHashJoin")
    assert n >= at_least, f"expected >= {at_least} broadcast joins, plan has {n}"


def assert_no_cartesian(df: DataFrame) -> None:
    assert count_ops(df, "CartesianProduct") == 0, "plan contains a CartesianProduct"


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    got = num_shuffles(df)
    assert got <= n, f"plan has {got} shuffle Exchanges (> {n})"


#: A plan-tree node line is (zero or more 3-char child-continuation blocks,
#: each "   " or ":  ") followed by the arrow "+-" or ":-". Anchoring the
#: depth at this PREFIX — instead of searching the whole line — keeps an
#: expression literal containing "+-" or ":-" on the node line (e.g. a
#: filter on (x + -1)) from mis-computing tree depth (ADVICE r12).
_TREE_ARROW = re.compile(r"^((?: {3}|: {2})*)[+:]-")


def _tree_depth(line: str) -> int | None:
    """Column of the tree arrow for a plan node line, else None."""
    m = _TREE_ARROW.match(line)
    return len(m.group(1)) if m else None


def assert_no_broadcast_over_raw_explode(df: DataFrame) -> None:
    """No BroadcastExchange may build a RAW explode-derived relation.

    Catalyst estimates a post-``explode`` frame at its PRE-explode scan
    size, so the static planner broadcasts sides that are actually linear
    in the data (and AQE cannot demote a statically-chosen broadcast) —
    at 10× sf0.1 that was a ~128 MB driver hash-relation build, at 100 TB
    a driver OOM (found by tools/scaleprobe.py, r12). A ``Generate`` BELOW
    a size-collapsing node (aggregate, top-k, or another join) is fine —
    the collapsed output is genuinely small; only an unbroken
    Generate→BroadcastExchange path is the bug. Fix at the call site with
    ``.hint("merge")`` on the explode-derived side."""
    lines = executed_plan(df).splitlines()
    offenders: list[str] = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        depth = _tree_depth(line)
        if depth is None:
            continue
        blocked: int | None = None  # indent below which a collapsing node shields
        for j in range(i + 1, len(lines)):
            dj = _tree_depth(lines[j])
            if dj is None:
                continue
            if dj <= depth:
                break
            if blocked is not None and dj > blocked:
                continue
            blocked = None
            # ONLY genuinely size-collapsing nodes shield: aggregates and
            # top-k. A JOIN does NOT — its output is at least as large as
            # its probe side, so a broadcast of a join-over-raw-explode is
            # still the driver-OOM class (r12 review finding: shielding on
            # joins made exactly that shape a false negative).
            if any(c in lines[j] for c in (
                "HashAggregate", "SortAggregate", "ObjectHashAggregate",
                "TakeOrderedAndProject",
            )):
                blocked = dj
                continue
            if "Generate" in lines[j]:
                offenders.append(line.strip()[:120])
                break
    assert not offenders, (
        "BroadcastExchange builds a raw explode-derived side "
        f"(driver-OOM class at scale): {offenders}"
    )


def assert_no_sort_aggregate_over_raw_scan(df: DataFrame) -> None:
    """No SortAggregate may consume a RAW file scan.

    A SortAggregate whose subtree reaches a parquet scan with no
    intervening hash aggregate sorts the ENTIRE table stream on both
    sides of its exchange — the r13 profile_table finding (a multi-
    distinct agg's Expand(6×) fed string-min/max buffers straight off the
    scan: 8–12 s at sf0.1 vs 1.1 s restructured). A SortAggregate over an
    already-hash-collapsed frame (e.g. the 1-row min/max fold of a
    per-column ``distinct()``) is fine — its input is the collapsed set,
    not the table. Same tree walk + shield mechanism as
    :func:`assert_no_broadcast_over_raw_explode`.

    Known limitation (ADVICE r13): the walk reads the rendered plan text,
    and subtrees hidden behind ``ReusedExchange`` / ``InMemoryTableScan``
    nodes do not re-render their scan lines — a SortAggregate over a
    cached/reused raw scan can therefore pass undetected (false negative,
    never a false positive). Acceptable for a CI tripwire; plans that lean
    on caching should be audited with the cache disabled."""
    lines = executed_plan(df).splitlines()
    offenders: list[str] = []
    for i, line in enumerate(lines):
        if "SortAggregate" not in line:
            continue
        if "SortAggregate(key=[]" in line:
            # Keyless (global) aggregate: requiredChildOrdering is empty
            # when there are no grouping keys, so Spark inserts NO Sort —
            # it is a per-partition fold that merely carries an immutable
            # buffer (e.g. string min/max). The hazard this audit exists
            # for (a full-table sort around the exchange) cannot occur.
            continue
        depth = _tree_depth(line)
        if depth is None:
            continue
        blocked: int | None = None  # indent below which a hash collapse shields
        for j in range(i + 1, len(lines)):
            dj = _tree_depth(lines[j])
            if dj is None:
                continue
            if dj <= depth:
                break
            if blocked is not None and dj > blocked:
                continue
            blocked = None
            if "HashAggregate" in lines[j]:  # incl. ObjectHashAggregate
                blocked = dj
                continue
            if "Scan parquet" in lines[j] or "FileScan" in lines[j]:
                offenders.append(line.strip()[:120])
                break
    assert not offenders, (
        "SortAggregate consumes a raw file scan (full-table sort; "
        f"the r13 profile_table class): {offenders}"
    )
