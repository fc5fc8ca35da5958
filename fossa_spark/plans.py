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


def scale_smells(df: DataFrame) -> list[str]:
    """Lint a plan for the anti-patterns that are invisible at test scale
    and fatal at 100 TB — the checklist tests/test_plans.py asserts
    query-by-query, packaged as a reusable pre-flight: run it on any
    DataFrame before pointing the plan at a big cluster.

    Returns a list of human-readable findings (empty = no smells):

    - ``cartesian``: CartesianProduct or BroadcastNestedLoopJoin — pair
      work grows as |A|×|B|; usually a missing/non-equi join condition.
    - ``corpus-window``: a Window whose partition spec is empty — every
      row flows through ONE task no matter how many executors exist
      (the q_win_corr bucket-carry decomposition exists because of this).
    - ``single-partition-exchange``: Exchange SinglePartition feeding
      anything but a final result collect — a corpus-wide serialization
      point.

    A finding is a WARNING, not an error: a single-partition window over
    a provably tiny relation (e.g. rrf_fuse's union of top-N lists) is
    legitimate — the caller, who knows the cardinality, decides.  The
    value is that the decision becomes explicit instead of discovered in
    a 3-task stage on the cluster."""
    a = audit(df)
    text = a.formatted
    smells: list[str] = []
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if re.search(rf"\b{node}\b", text):
            smells.append(
                f"cartesian: {node} in plan — |A|x|B| pair work; "
                "check the join condition is an equi-join"
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
    n_single = len(re.findall(r"Arguments: SinglePartition", text))
    if n_single:
        smells.append(
            f"single-partition-exchange: {n_single} Exchange(SinglePartition) "
            "node(s) — corpus serializes through one task; fine only for "
            "provably small relations"
        )
    return smells
