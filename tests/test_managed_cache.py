"""managed_cache semantics (round-5 verdict task #3): eviction order,
semanticHash refresh, and an EXECUTABLE form of the invariant that was
previously only a comment — no registry query may register more than
MANAGED_CACHE_KEEP distinct plans before its first action (else a query
would evict its own working set mid-build).
"""

from __future__ import annotations

import ast
import pathlib

from pyspark.sql.utils import is_remote  # noqa: F401 (import guard only)

from python_btc_etl_spark import catalog
from python_btc_etl_spark.catalog import MANAGED_CACHE_KEEP, managed_cache

PLANS_DIR = pathlib.Path(catalog.__file__).parent / "plans"


def _reset():
    while catalog._MANAGED_CACHES:
        _, df = catalog._MANAGED_CACHES.popitem()
        try:
            df.unpersist()
        except Exception:
            pass


def _is_cached(df):
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk


def test_eviction_is_least_recently_registered_first(spark):
    _reset()
    dfs = [managed_cache(spark.range(1000 + i)) for i in range(MANAGED_CACHE_KEEP)]
    assert all(_is_cached(d) for d in dfs)
    # Two more distinct plans -> the two OLDEST registrations evict.
    extra = [
        managed_cache(spark.range(5000 + i)) for i in range(2)
    ]
    assert not _is_cached(dfs[0]) and not _is_cached(dfs[1])
    assert all(_is_cached(d) for d in dfs[2:] + extra)
    _reset()


def test_semantic_refresh_protects_reregistered_plan(spark):
    _reset()
    first = managed_cache(spark.range(777))
    for i in range(MANAGED_CACHE_KEEP - 1):
        managed_cache(spark.range(2000 + i))
    # `first` is now the eviction candidate. Re-register an EQUIVALENT
    # (freshly built) plan: semanticHash matches, recency refreshes, the
    # cache does NOT double-register it...
    again = managed_cache(spark.range(777))
    assert len(catalog._MANAGED_CACHES) == MANAGED_CACHE_KEEP
    # ...so the next distinct plan evicts the now-oldest OTHER entry,
    # not the refreshed one.
    managed_cache(spark.range(9999))
    assert _is_cached(first) and _is_cached(again)
    _reset()


def _call_counts():
    """Static transitive count of managed_cache registrations per
    top-level function in plans/*.py: direct calls plus calls through
    same-module helper functions (one call graph, memoized). A cached
    helper invoked twice registers the SAME semanticHash twice — which
    occupies one slot — but the static count is the safe upper bound."""
    counts: dict[str, int] = {}
    for path in sorted(PLANS_DIR.glob("*.py")):
        tree = ast.parse(path.read_text())
        fns = {
            n.name: n for n in tree.body if isinstance(n, ast.FunctionDef)
        }

        def direct_and_calls(fn):
            direct, called = 0, set()
            for node in ast.walk(fn):
                if isinstance(node, ast.Call):
                    f = node.func
                    name = f.id if isinstance(f, ast.Name) else getattr(f, "attr", None)
                    if name == "managed_cache":
                        direct += 1
                    elif name in fns:
                        called.add(name)
            return direct, called

        memo: dict[str, int] = {}

        def total(name, seen=()):
            if name in memo:
                return memo[name]
            if name in seen:  # recursion guard
                return 0
            d, called = direct_and_calls(fns[name])
            memo[name] = d + sum(total(c, seen + (name,)) for c in called)
            return memo[name]

        for name in fns:
            counts[f"{path.stem}.{name}"] = total(name)
    return counts


def test_no_query_exceeds_keep_bound_statically():
    counts = _call_counts()
    offenders = {
        k: v for k, v in counts.items() if v > MANAGED_CACHE_KEEP
    }
    assert not offenders, offenders
    # The bound is meant to leave headroom; record the current max so a
    # future query creeping toward the cliff fails loudly here first.
    assert max(counts.values()) <= MANAGED_CACHE_KEEP // 2, max(
        (v, k) for k, v in counts.items()
    )
