"""Property-based tests (hypothesis) for the pure-Python engine pieces and
the cents determinism contract — the SURVEY §5 gap the reference never
filled (no property tests anywhere in the reference repo).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from fossa_spark.connect import ConnectorResolver, EngineUrl

# -- the cents contract: round-trip of 2-decimal values is exact


@given(st.integers(min_value=-(10**15), max_value=10**15))
def test_cents_roundtrip_exact(cents_value):
    """Any 2-decimal money value survives double → *100 → round exactly
    (the invariant every aggregate in the oracle contract leans on)."""
    x = cents_value / 100.0  # the double the fixture files store
    assert int(round(x * 100.0)) == cents_value


@given(
    st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=200)
)
def test_cents_sum_order_independent(cents_list):
    """Integer-cents sums are permutation-invariant where double sums are
    not — the reason the engine aggregates in cents."""
    doubles = [c / 100.0 for c in cents_list]
    total_fwd = sum(int(round(x * 100.0)) for x in doubles)
    total_rev = sum(int(round(x * 100.0)) for x in reversed(doubles))
    assert total_fwd == total_rev == sum(cents_list)
    # and the final single division is deterministic
    assert total_fwd / 100.0 == total_rev / 100.0


# -- resolver templating


@given(
    st.dictionaries(
        st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True),
        st.from_regex(r"[A-Za-z0-9_/\.]{1,20}", fullmatch=True),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=50)
def test_resolver_resolves_all_placeholders(ctx):
    r = ConnectorResolver()
    template = "parquet:///base/" + "/".join("{%s}" % k for k in ctx)
    with r.context(**ctx):
        resolved = r.resolve(template)
    for v in ctx.values():
        assert v in resolved
    assert "{" not in resolved


@given(st.sampled_from(["csv", "parquet", "json", "orc", "text"]),
       st.from_regex(r"(/[A-Za-z0-9_\.]{1,12}){1,4}", fullmatch=True))
def test_engine_url_parse_total(scheme, path):
    url = EngineUrl.parse(f"{scheme}://{path}")
    assert url.scheme == scheme
    assert url.path.endswith(path.rsplit("/", 1)[-1])


# -- jaccard ratio determinism (ints → single division)


@given(st.integers(1, 10**6), st.integers(1, 10**6), st.integers(0, 10**6))
def test_jaccard_ratio_deterministic(na, nb, inter):
    inter = min(inter, na, nb)
    union = na + nb - inter
    j1 = inter / union
    j2 = inter / union
    assert j1 == j2 and 0.0 <= j1 <= 1.0 and not math.isnan(j1)
