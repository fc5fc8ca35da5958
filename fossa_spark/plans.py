"""Plan auditing: programmatic assertions about physical plans.

`.explain()` is for eyeballs; these helpers make plan properties testable —
"the filter reached the scan", "this join broadcast", "no shuffle happened"
become assertions that fail a build instead of a code-review comment. Used
by tests/test_plans.py on the flagship queries.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    formatted: str
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    join_nodes: list[str] = field(default_factory=list)
    exchanges: int = 0
    has_wscg: bool = False

    def scans_only_columns(self, *cols: str) -> bool:
        """True if every parquet scan reads a subset of the given columns."""
        allowed = set(cols)
        for schema in self.read_schemas:
            read = set(re.findall(r"(\w+):", schema))
            if not read <= allowed:
                return False
        return True


def audit(df: DataFrame) -> PlanAudit:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
        df.explain()  # simple mode: WSCG stages appear as leading "*(n)"
    text = buf.getvalue()
    return PlanAudit(
        formatted=text,
        # greedy to line end: filter lists contain nested brackets (In(...))
        pushed_filters=re.findall(r"PushedFilters: \[(.*)\]", text),
        read_schemas=re.findall(r"ReadSchema: struct<(.*?)>", text),
        join_nodes=re.findall(r"\b(\w*Join\w*)\b", text),
        exchanges=len(re.findall(r"\bExchange\b", text)),
        has_wscg=bool(re.search(r"\*\(\d+\)", text)),
    )


def assert_broadcast_join(df: DataFrame) -> PlanAudit:
    a = audit(df)
    assert any("Broadcast" in j for j in a.join_nodes), (
        f"expected a broadcast join, got joins={a.join_nodes}\n{a.formatted[:2000]}"
    )
    return a


def assert_filters_pushed(df: DataFrame, *fragments: str) -> PlanAudit:
    a = audit(df)
    joined = ";".join(a.pushed_filters)
    for frag in fragments:
        assert frag in joined, (
            f"filter fragment {frag!r} not pushed; pushed={a.pushed_filters}"
        )
    return a


def _parse_tree(formatted: str) -> list[tuple[int, str, int]]:
    """The formatted explain's tree section as (depth, node_name, node_id)
    in preorder.  Depth comes from the 3-char-per-level indentation Spark
    prints (``+- `` / ``:- `` / ``:  `` / three spaces)."""
    lines = formatted.splitlines()
    try:
        start = next(i for i, ln in enumerate(lines) if "== Physical Plan ==" in ln)
    except StopIteration:
        return []
    out: list[tuple[int, str, int]] = []
    for ln in lines[start + 1:]:
        if not ln.strip():
            break
        m = re.match(r"^([ :+|-]*)\*?\s*(\w[\w]*)\b.*\((\d+)\)\s*$", ln)
        if m is None:
            continue
        out.append((len(m.group(1)) // 3, m.group(2), int(m.group(3))))
    return out


def _detail(formatted: str, node_id: int) -> str:
    """The per-node detail block for ``(node_id) Name``."""
    m = re.search(
        rf"^\({node_id}\) \w.*?\n(.*?)(?=^\(\d+\) |\Z)", formatted, re.S | re.M
    )
    return m.group(1) if m else ""


def _subtree(tree: list[tuple[int, str, int]], idx: int) -> list[tuple[int, str, int]]:
    d = tree[idx][0]
    out = [tree[idx]]
    for row in tree[idx + 1:]:
        if row[0] <= d:
            break
        out.append(row)
    return out


_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")


_ROW_PRESERVING = (
    "BroadcastExchange", "ReusedExchange", "Exchange", "AQEShuffleRead",
    "Sort", "Project", "Filter", "WholeStageCodegen", "InputAdapter",
    "ColumnarToRow",
)


def _is_scalar_subtree(tree_part, formatted: str) -> bool:
    """True if the subtree provably produces O(1) rows: walking down
    through row-count-preserving wrappers, the first real operator is a
    zero-grouping-key aggregate (``Keys: []``) — the global-scalar
    shape."""
    for depth, name, nid in tree_part:
        if name in _AGG_NODES and "Keys: []" in _detail(formatted, nid):
            return True
        if name not in _ROW_PRESERVING:
            return False
    return False


def scale_smells(df: DataFrame) -> list[str]:
    """Lint a plan for the anti-patterns that are invisible at test scale
    and fatal at 100 TB — the checklist tests/test_plans.py asserts
    query-by-query, packaged as a reusable pre-flight: run it on any
    DataFrame before pointing the plan at a big cluster.

    Returns a list of human-readable findings (empty = no smells):

    - ``cartesian``: CartesianProduct, or BroadcastNestedLoopJoin whose
      BUILD side is not provably O(1) rows — pair work grows as
      |A|×|B|; usually a missing/non-equi join condition.  A BNLJ
      against a broadcast SCALAR (the ``crossJoin(broadcast(global
      agg))`` pattern this codebase uses to attach corpus totals) is
      |A|×1 — row-linear, not flagged.
    - ``corpus-window``: a Window whose partition spec is empty — every
      row flows through ONE task no matter how many executors exist
      (the q_win_corr bucket-carry decomposition exists because of this).
    - ``single-partition-exchange``: Exchange SinglePartition whose
      child is NOT a partial global aggregate — a corpus-wide
      serialization point.  The partial→final global-agg shape
      (HashAggregate ``Keys: []`` partials under the exchange) moves one
      row per upstream partition, bounded by the cluster not the data,
      and is not flagged.

    A finding is a WARNING, not an error: a single-partition window over
    a provably tiny relation (e.g. rrf_fuse's union of top-N lists) is
    legitimate — the caller, who knows the cardinality, decides.  The
    value is that the decision becomes explicit instead of discovered in
    a 3-task stage on the cluster."""
    a = audit(df)
    text = a.formatted
    tree = _parse_tree(text)
    by_id = {nid: i for i, (_, _, nid) in enumerate(tree)}
    smells: list[str] = []

    if re.search(r"\bCartesianProduct\b", text):
        smells.append(
            "cartesian: CartesianProduct in plan — |A|x|B| pair work; "
            "check the join condition is an equi-join"
        )
    for i, (depth, name, nid) in enumerate(tree):
        if name != "BroadcastNestedLoopJoin":
            continue
        kids = [j for j, row in enumerate(tree[i + 1:], i + 1)
                if row[0] == depth + 1][:2]
        # build side from the tree line's BuildLeft/BuildRight marker
        line = re.search(rf"^.*BroadcastNestedLoopJoin\b.*\({nid}\)\s*$",
                         text, re.M)
        build_right = "BuildLeft" not in (line.group(0) if line else "")
        build_idx = kids[1] if (build_right and len(kids) > 1) else kids[0]
        if not _is_scalar_subtree(_subtree(tree, build_idx), text):
            smells.append(
                "cartesian: BroadcastNestedLoopJoin with a non-scalar "
                "build side — |A|x|B| pair work; check the join "
                "condition is an equi-join"
            )
            break

    # formatted Window details: "Arguments: [exprs], [partition], [order]"
    # with the partition list OMITTED entirely when empty — so a Window
    # whose Arguments carries only two top-level lists is unpartitioned
    # and funnels the corpus into one task
    for m in re.finditer(r"\(\d+\) Window\b", text):
        tail = text[m.end(): m.end() + 1000]
        arg = re.search(r"Arguments: (\[.*?)\n", tail, re.S)
        if arg is not None and arg.group(1).count("], [") < 2:
            smells.append(
                "corpus-window: Window with empty PARTITION BY — "
                "single-task evaluation at any cluster size"
            )
            break

    n_single = 0
    for m in re.finditer(r"^\((\d+)\) Exchange\b", text, re.M):
        nid = int(m.group(1))
        if "SinglePartition" not in _detail(text, nid):
            continue
        i = by_id.get(nid)
        child = tree[i + 1] if i is not None and i + 1 < len(tree) else None
        if child is not None and child[1] in _AGG_NODES and (
            "Keys: []" in _detail(text, child[2])
        ):
            continue  # partial→final global agg: one row per partition
        n_single += 1
    if n_single:
        smells.append(
            f"single-partition-exchange: {n_single} Exchange(SinglePartition) "
            "node(s) — corpus serializes through one task; fine only for "
            "provably small relations"
        )
    return smells
