"""Bundle-adjustment parity vs the reference's own compiled BA stack.

tests/data/ba_oracle.json holds per-camera R/K dumped by
tools/ref_oracle/ba_oracle.cpp — the reference's _stitch.cpp +
_bundle_adjust_*.cpp compiled unmodified and driven exactly like
panorama::stitch_panorama (/root/reference/src/classes/_panorama.cpp:
440-520). Multiple recorded runs per sequence measure the reference's
OWN convergence spread (its RANSAC seeds from std::random_device; on
`map` the spread is large — focals 2087..2972, relative rotations up to
~5.7 deg between runs — because a narrow-FOV chain only weakly
constrains focal). The north-star acceptance bar is rotation/focal
agreement WITHIN that spread (BASELINE.md), gated here as:

  * per-camera focal inside the reference's observed min/max envelope,
    widened by half the spread + 3% (the spread estimate itself comes
    from only a few runs);
  * pairwise RELATIVE rotations (gauge-free) within 1.5x the max
    inter-run oracle deviation + 1 degree of ANY oracle run;
  * internal focal consistency within max(3%, 1.5x the reference's own
    internal spread).
"""

import json
import pathlib

import numpy as np
import pytest

from simplepanorama_tpu.config import Config
from simplepanorama_tpu.io import ImageSet
from simplepanorama_tpu import stitcher

_FIX = json.loads(
    (pathlib.Path(__file__).parent / "data" / "ba_oracle.json").read_text())

_SEQ_GLOBS = {
    "map": "/root/reference/results/map/budapest*.jpg",
    "brocken": "/root/reference/results/brocken/resized*.jpg",
}


def _rel_rots(Rs):
    out = {}
    for i in range(len(Rs)):
        for j in range(i + 1, len(Rs)):
            out[(i, j)] = Rs[i] @ Rs[j].T
    return out


def _ang_deg(A, B):
    c = (np.trace(A @ B.T) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def _oracle_spread(runs):
    """(focal_lo, focal_hi, max inter-run rel-rot angle in degrees)."""
    focs = [np.array(r["K"])[:, 0] for r in runs]
    lo = min(f.min() for f in focs)
    hi = max(f.max() for f in focs)
    max_ang = 0.0
    rels = [_rel_rots([np.array(R).reshape(3, 3) for R in r["R"]])
            for r in runs]
    for a in range(len(runs)):
        for b in range(a + 1, len(runs)):
            for k in rels[a]:
                max_ang = max(max_ang, _ang_deg(rels[a][k], rels[b][k]))
    return lo, hi, max_ang


def _run_ours(seq):
    import glob
    paths = sorted(glob.glob(_SEQ_GLOBS[seq]))
    cfg = Config()  # reference defaults: init 700, 1500 RANSAC, lambda .05
    res, params, _ = stitcher.run_pipeline(ImageSet(paths), cfg)
    return res


@pytest.mark.slow
@pytest.mark.parametrize("seq", ["map", "brocken"])
def test_ba_rotation_focal_parity(seq):
    runs = _FIX[seq]
    n_ref = len(runs[0]["K"])
    lo, hi, max_ang = _oracle_spread(runs)
    spread = hi - lo
    f_lo = lo - 0.5 * spread - 0.03 * lo
    f_hi = hi + 0.5 * spread + 0.03 * hi
    ang_bound = 1.5 * max_ang + 1.0

    res = _run_ours(seq)
    assert len(res.nodes) == n_ref, \
        f"connected {len(res.nodes)} of {n_ref}"
    # map component-local back to the oracle's global image order
    our_f = np.zeros(n_ref)
    our_R = [None] * n_ref
    for l, g in enumerate(res.nodes):
        our_f[g] = res.K[l, 0, 0]
        our_R[g] = res.rot[l]

    # focal envelope
    assert our_f.min() >= f_lo and our_f.max() <= f_hi, \
        f"our focals {np.round(our_f, 1)} outside [{f_lo:.0f}, {f_hi:.0f}]"
    # internal consistency: cameras of one solution agree with each other
    # at least as tightly as the reference's own runs do (brocken's
    # reference runs spread ~3.5% internally; map's ~0.5%)
    ref_internal = max(
        (f.max() - f.min()) / f.mean()
        for f in (np.array(r["K"])[:, 0] for r in runs))
    internal = (our_f.max() - our_f.min()) / our_f.mean()
    # floor 0.03: the ref_internal estimate comes from only 2-3 recorded
    # runs whose own inter-run spread dwarfs it (brocken rel-rot varies
    # ~15 deg between reference runs); measured ours: map .003,
    # brocken .026
    bound = max(0.03, 1.5 * ref_internal)
    assert internal < bound, \
        f"internal focal spread {internal:.4f} > {bound:.4f}"

    # gauge-free rotation parity: best oracle run must be within bound
    ours_rel = _rel_rots(our_R)
    best = np.inf
    for r in runs:
        rels = _rel_rots([np.array(R).reshape(3, 3) for R in r["R"]])
        worst = max(_ang_deg(ours_rel[k], rels[k]) for k in ours_rel)
        best = min(best, worst)
    assert best <= ang_bound, \
        f"max rel-rot deviation {best:.2f} deg > bound {ang_bound:.2f}"
