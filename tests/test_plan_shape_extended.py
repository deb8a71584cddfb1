"""Physical-plan shape assertions for the extended operator family
(merge upsert, deterministic sampling, fuzzy match, multiset set ops)."""

from __future__ import annotations

from .test_plan_shape import explained


def test_merge_upsert_single_full_outer_join(spark):
    """MERGE must be exactly one full-outer (sort-merge) join on the key —
    no nested loops, no second pass over the target."""
    plan = explained(spark, "merge_upsert_orders")
    assert "FullOuter" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_deterministic_sample_no_preagg_shuffle(spark):
    """The hash-sample filter must evaluate inside the scan stage; the
    only exchange is the final group-by — one shuffle total."""
    plan = explained(spark, "deterministic_sample")
    assert plan.count("hashpartitioning(") == 1, plan
    assert "Filter" in plan, plan


def test_fuzzy_match_runs_on_distinct_domain(spark):
    """Edit distance must run on the DISTINCT name domain: both join
    inputs carry an aggregate (the distinct), so the quadratic term is
    64², not row-count²."""
    plan = explained(spark, "fuzzy_name_match")
    assert plan.count("HashAggregate") >= 2, plan


def test_fuzzy_match_blocked_equi_join(spark):
    """The length-band blocking key must plan as a hash EQUI-join —
    never a BroadcastNestedLoopJoin / cartesian product, whose O(D²)
    pair count is unbounded on a real name domain."""
    plan = explained(spark, "fuzzy_name_match")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_setops_multiset_planned_as_aggregates(spark):
    """INTERSECT ALL / EXCEPT ALL must lower to joins/aggregates with
    multiplicity bookkeeping — never a cartesian row-matcher."""
    plan = explained(spark, "setops_multiset")
    assert "CartesianProduct" not in plan, plan


def test_window_distribution_single_sort_per_partition(spark):
    """ntile/percent_rank/cume_dist share ONE window spec — the plan must
    contain a single Window operator (one partition+sort), not three."""
    import re

    plan = explained(spark, "window_distribution")
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1, plan


def test_shuffle_hash_hint_respected(spark):
    """hint('shuffle_hash') must produce a ShuffledHashJoin — no sort of
    either side; a silent fallback to SortMergeJoin re-introduces the
    fact-side sort the hint exists to avoid."""
    plan = explained(spark, "hinted_shuffle_hash_join")
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pack_documents_two_phase_prefix_sum(spark):
    """The per-doc running sum must be a window PARTITIONED by block
    (parallel), never one global unpartitioned window over every doc —
    the single-partition sort that would serialize a 100 TB corpus. The
    only global window allowed is the per-BLOCK offset (O(n_blocks)
    rows), and the block offsets join back via broadcast."""
    import re

    plan = explained(spark, "pack_documents_ctx")
    # Formatted explain lists each Window's partition spec in its
    # Arguments line: the per-doc running sum must carry [blk#N].
    assert re.search(r"Arguments: \[sum\(n_tokens[^\n]*\[blk#\d+L?\]", plan), plan
    assert "BroadcastHashJoin" in plan, plan


def test_decontam_candidates_via_broadcast_equi_join(spark):
    """Contamination candidates must come from a hash equi-join on the
    n-gram with the (small) benchmark side broadcast — never a nested
    loop over the corpus."""
    plan = explained(spark, "decontam_ngram_overlap")
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
