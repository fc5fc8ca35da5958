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
