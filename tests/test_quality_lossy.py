"""Quality-bound harness for the lossy decode knobs
(scripts/quality_lossy_decode.py, VERDICT r3 weak #6): on the tiny config
the int8-state path must be near-lossless and the harness must produce
every bound the flagship TPU run records."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_quality_lossy_decode_tiny():
    from quality_lossy_decode import main

    r = main(["--tiny", "--batch", "4", "--steps", "32"])

    g = r["state_int8_greedy"]
    assert g["token_agreement"] == 1.0 and g["rows_identical"] == 1.0

    f = r["state_int8_forced"]
    assert f["argmax_flip_rate"] == 0.0
    # quantization noise stays tiny relative to the logit scale
    assert f["logit_delta_max"] < 0.05 * f["logit_scale_mean_abs"], f
    assert np.isfinite(f["logit_delta_mean"])

    (a,) = [v for k, v in r.items() if k.startswith("approx_topk")]
    assert a["candidate_recall_mean"] > 0.9
    assert a["tv_distance_mean"] < 0.05
