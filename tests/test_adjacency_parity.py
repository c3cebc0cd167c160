"""Adjacency parity vs the REFERENCE'S OWN CODE (VERDICT r1 item 10).

The recorded values below were produced by compiling the reference's
unmodified matching stack (_homography.cpp + _util.cpp) into a headless
harness (tools/ref_oracle/) and running it on the bundled map sequence at
init_size=700 with pan::config defaults — the reference's panorama::test
inspection output (/root/reference/src/classes/_panorama.cpp:572-609)
reproduced exactly. Regenerate with:  bash tools/ref_oracle/build_and_run.sh

Our raw ratio-test counts are not absolutely comparable (the TPU SIFT
keeps a fixed top-1024-by-response keypoint capacity; the reference
keeps all ~8000), so raw counts are gated on rank correlation; the
accepted pair SET and the geometric overlap weights must match directly.
"""

import glob

import numpy as np
import pytest

# tools/ref_oracle output, map @ init_size=700 (reference defaults)
REF_RAW = np.array([
    [0, 1626, 110, 2117, 1007, 112],
    [0, 0, 2601, 996, 2309, 1304],
    [0, 0, 0, 123, 1300, 2815],
    [0, 0, 0, 0, 1732, 100],
    [0, 0, 0, 0, 0, 2274],
    [0, 0, 0, 0, 0, 0]], float)
REF_WEIGHTS = np.array([
    [0, .4419, 0, .5690, .2666, 0],
    [0, 0, .5625, .2571, .5744, .3340],
    [0, 0, 0, 0, .3219, .6098],
    [0, 0, 0, 0, .4712, 0],
    [0, 0, 0, 0, 0, .5333],
    [0, 0, 0, 0, 0, 0]])


@pytest.mark.slow
def test_map_adjacency_matches_reference_oracle():
    from simplepanorama_tpu.pipeline import diagnose
    from simplepanorama_tpu.config import Config
    paths = sorted(glob.glob("/root/reference/results/map/budapest*.jpg"))
    d = diagnose(paths, Config())

    ours_w = d["adjacency"]
    ours_raw = d["raw_match_counts"]

    # 1. identical accepted pair set
    ref_pairs = {tuple(p) for p in zip(*np.nonzero(REF_WEIGHTS))}
    our_pairs = {tuple(int(v) for v in p)
                 for p in zip(*np.nonzero(ours_w))}
    assert our_pairs == ref_pairs, (our_pairs, ref_pairs)

    # 2. overlap weights (pure homography geometry) within 3 points
    diff = np.abs(ours_w - REF_WEIGHTS)[REF_WEIGHTS > 0]
    assert diff.max() < 0.03, f"max weight diff {diff.max():.4f}"

    # 3. raw ratio-test counts rank-correlate despite the keypoint cap
    iu = np.triu_indices(6, 1)
    a, b = ours_raw[iu], REF_RAW[iu]
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    rho = np.corrcoef(ra, rb)[0, 1]
    assert rho > 0.9, f"raw-count rank correlation {rho:.3f}"

    # 4. focal estimate vs the reference's own focal_from_hom on the same
    # input (oracle prints 2889.78 — large because the map scene is
    # near-planar, which ill-conditions Szeliski-Shum; BA refines it).
    # The keypoint cap shifts the RANSAC homographies slightly, so gate
    # at +-25% of the recorded reference value.
    assert abs(d["focal_estimate"] - 2889.78) / 2889.78 < 0.25, \
        d["focal_estimate"]
