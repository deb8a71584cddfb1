"""Round-13 quad audit: its t/i/v marginals must equal the committed
triple audit cell-for-cell (the judge's done-criterion for the audio
leg), and the audio dimension must be genuinely populated."""

from __future__ import annotations

from tests.conftest import SF_SMALL

# quad cells folding (over the audio dimension) into each triple cell
_FOLD = {
    "text_image_video": ("tiva", "tiv"),
    "text_image": ("tia", "ti"),
    "text_video": ("tva", "tv"),
    "image_video": ("iva", "iv"),
    "text_only": ("ta", "t"),
    "image_only": ("ia", "i"),
    "video_only": ("va", "v"),
}


def test_quad_marginals_match_triple(spark):
    from python_btc_etl_spark.plans.multimodal import (
        cross_modal_quad_audit,
        cross_modal_triple_audit,
    )

    quad = {
        r["cell"]: int(r["n_pairs"])
        for r in cross_modal_quad_audit(spark, SF_SMALL).collect()
    }
    triple = {
        r["cell"]: int(r["n_pairs"])
        for r in cross_modal_triple_audit(spark, SF_SMALL).collect()
    }
    assert set(quad) == {
        c for cells in _FOLD.values() for c in cells
    } | {"a"}, sorted(quad)
    for tcell, qcells in _FOLD.items():
        assert triple[tcell] == sum(quad[c] for c in qcells), (
            tcell,
            qcells,
            triple[tcell],
            {c: quad[c] for c in qcells},
        )
    # the audio leg is non-trivial: audio-bearing cells are populated,
    # including at least one MIXED (audio agreeing with another
    # modality) cell — otherwise the matrix gained nothing
    audio_cells = [c for c in quad if "a" in c]
    mixed_audio = [c for c in audio_cells if len(c) > 1]
    assert sum(quad[c] for c in audio_cells) > 0
    assert sum(quad[c] for c in mixed_audio) > 0, quad
