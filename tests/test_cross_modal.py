"""cross_modal_pair_audit reconciliation with the standalone detectors:
the audit's cells must partition the union of the two verdict tables,
and the planted structure must land where designed (re-posting copies
in agree_both, fresh-image copies in text_only)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_cells_partition_the_union_and_planted_structure(spark):
    from python_btc_etl_spark.plans.dedup import (
        TRUNC_EVERY,
        TRUNC_OFFSET,
        _containment_pairs,
    )
    from python_btc_etl_spark.plans.multimodal import cross_modal_pair_audit

    rows = {r["cell"]: r for r in cross_modal_pair_audit(spark, SF_SMALL).collect()}
    assert set(rows) == {"agree_both", "text_only", "image_only"}
    tp = {
        (r["doc_a"], r["doc_b"])
        for r in _containment_pairs(spark, SF_SMALL).select("doc_a", "doc_b").collect()
    }
    # text cells reconcile with the standalone containment verdict
    assert rows["agree_both"]["n_pairs"] + rows["text_only"]["n_pairs"] == len(tp)
    # every planted RE-POSTING copy pair (original % 2*TRUNC_EVERY == 0)
    # is near-dup in BOTH modalities: it must appear in agree_both mass
    repost_pairs = {
        (a, b) for (a, b) in tp if b - a == TRUNC_OFFSET and a % (2 * TRUNC_EVERY) == 0
    }
    assert repost_pairs, "corpus has no re-posting copies"
    assert rows["agree_both"]["n_pairs"] >= len(repost_pairs)
    # evidence pairs really belong to their cell's text side
    ab = (rows["agree_both"]["example_a"], rows["agree_both"]["example_b"])
    to = (rows["text_only"]["example_a"], rows["text_only"]["example_b"])
    assert ab in tp and to in tp
    io_pair = (rows["image_only"]["example_a"], rows["image_only"]["example_b"])
    assert io_pair not in tp
    # fresh-image copies (original % 100 == 50) exist and are text-only
    fresh_pairs = {
        (a, b)
        for (a, b) in tp
        if b - a == TRUNC_OFFSET and a % (2 * TRUNC_EVERY) != 0
    }
    assert fresh_pairs, "corpus has no fresh-image copies"
    assert rows["text_only"]["n_pairs"] >= 1
    # image_only is the phash-chain mass: nonzero and disjoint from text
    assert rows["image_only"]["n_pairs"] > 0


def test_video_sequence_containment_and_matrix(spark):
    """Round-12 video leg: trimmed clips are fully contained in their
    group's longer variants (contain_ppm == 1_000_000 within a video
    group), the apply face's clusters are the planted groups, and the
    image x video agreement matrix is non-degenerate with cells
    reconciling against the standalone detectors."""
    from python_btc_etl_spark.plans.multimodal import (
        _phash_pairs,
        _vseq_pairs,
        cross_modal_video_audit,
        video_dedup_apply,
    )

    vp = _vseq_pairs(spark, SF_SMALL).collect()
    assert vp, "no video near-dup pairs"
    for r in vp:
        vg_a = (r["doc_a"] + 2) // 4
        vg_b = (r["doc_b"] + 2) // 4
        # the planted structure: every flagged pair is a within-group
        # trim pair, fully contained (strict shingle subset)
        assert vg_a == vg_b, (r["doc_a"], r["doc_b"])
        assert r["contain_ppm"] == 1_000_000, tuple(r)
        assert r["shared"] == min(r["n_a"], r["n_b"])
    # apply face: canonical = min id of the video group
    for r in video_dedup_apply(spark, SF_SMALL).collect():
        assert (r["dropped_doc"] + 2) // 4 == (r["canonical_doc"] + 2) // 4
    # matrix reconciles with the standalone detectors and every cell
    # is populated (the 2-id grouping offset guarantees all three)
    rows = {r["cell"]: r for r in cross_modal_video_audit(spark, SF_SMALL).collect()}
    assert set(rows) == {"agree_both", "image_only", "video_only"}
    assert all(rows[c]["n_pairs"] > 0 for c in rows)
    ip_n = _phash_pairs(spark, SF_SMALL).count()
    assert rows["agree_both"]["n_pairs"] + rows["image_only"]["n_pairs"] == ip_n
    assert rows["agree_both"]["n_pairs"] + rows["video_only"]["n_pairs"] == len(vp)


def test_triple_audit_reconciles_with_all_three_detectors(spark):
    """Round-12 triple audit: the 2x2x2 cells partition the union of
    the three verdict tables, the text/image margins reconcile with
    the standalone detectors, video-repost pairs land in
    text_image_video (the CLIP repost set is a subset of the image
    repost set, so text_video is structurally empty), and the
    populated-cell set is exactly as designed."""
    from python_btc_etl_spark.plans.dedup import (
        TRUNC_OFFSET,
        _containment_pairs,
    )
    from python_btc_etl_spark.plans.multimodal import (
        _XM_VID_REPOST,
        cross_modal_triple_audit,
    )

    rows = {r["cell"]: r for r in cross_modal_triple_audit(spark, SF_SMALL).collect()}
    assert set(rows) == {
        "text_image_video",
        "text_image",
        "text_video",
        "image_video",
        "text_only",
        "image_only",
        "video_only",
    }
    # text margin == standalone containment verdict
    tp_n = _containment_pairs(spark, SF_SMALL).count()
    t_cells = ("text_image_video", "text_image", "text_video", "text_only")
    assert sum(rows[c]["n_pairs"] for c in t_cells) == tp_n
    # clip reposts are image reposts too -> text_video empty,
    # text_image_video populated by exactly the clip-repost pairs
    assert rows["text_video"]["n_pairs"] == 0
    assert rows["text_image_video"]["n_pairs"] > 0
    ex_a, ex_b = rows["text_image_video"]["example_a"], rows["text_image_video"]["example_b"]
    assert ex_b - TRUNC_OFFSET == ex_a and ex_a % _XM_VID_REPOST == 0
    # the offset-grouping intersection and the single-modality cells
    for c in ("image_video", "image_only", "video_only", "text_image", "text_only"):
        assert rows[c]["n_pairs"] > 0, c
