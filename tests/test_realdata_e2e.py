"""BASELINE config[3] end-to-end: measured-capture path through root
`test.py --test test_realdata`.

The reference drives hard-coded `.mat` captures through `load_realdata` and
the model (`/root/reference/test.py:171-202`, `utils/loadrealdata.py:6-15`);
no real capture is mounted here, so a synthetic `measured_data`-shaped
fixture (key ``data_new``, (h, w, t) layout) exercises the identical code
path — for both the heatmap pipeline and the NlosPoseSformer variant
(round-3 VERDICT #7).
"""

import os
import runpy
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two tiny-model compiles on the CI host

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_fixture(path: str, h: int = 32, w: int = 32, t: int = 64) -> None:
    """An ellipsoid-shell transient: per-pixel photon arrivals clustered at
    the round-trip time of a wall-parallel scattering blob, plus shot-noise
    floor — the gross shape of a measured_data capture."""
    from scipy.io import savemat

    rng = np.random.RandomState(42)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    cy, cx = h / 2.0, w / 2.0
    r2 = ((ys - cy) / h) ** 2 + ((xs - cx) / w) ** 2
    arrival = t * (0.3 + 0.8 * r2)  # hyperbolic-ish wavefront
    ts = np.arange(t, dtype=np.float64)[None, None, :]
    shell = np.exp(-0.5 * ((ts - arrival[..., None]) / 2.0) ** 2)
    data = shell + 0.05 * rng.rand(h, w, t)
    savemat(path, {"data_new": data.astype(np.float64)})


def _run_cli(argv):
    old = sys.argv
    sys.argv = [os.path.join(REPO, "test.py")] + argv
    try:
        runpy.run_path(sys.argv[0], run_name="__main__")
    finally:
        sys.argv = old


@pytest.mark.parametrize("variant", ["nlospose", "sformer"])
def test_realdata_mode_end_to_end(tmp_path, variant):
    mat = str(tmp_path / "capture.mat")
    # load_realdata: (h, w, t) -> (t, w, h), temporal pair-avg, /2 all axes
    # => (16, 16, 16) matching the tiny(16) config.
    _write_fixture(mat, h=32, w=32, t=64)
    out = str(tmp_path / "results")

    _run_cli([
        "--test", "test_realdata", "--variant", variant,
        "--data", mat, "--size", "16",
        "--model", str(tmp_path / "nonexistent_ckpt"),
        "--out", out,
    ])

    joints_dir = os.path.join(out, "joints")
    txts = [f for f in os.listdir(joints_dir) if f.endswith(".txt")]
    assert txts, f"no joints artifacts written for {variant}"
    joints = np.loadtxt(os.path.join(joints_dir, txts[0]))
    assert joints.shape == (24, 3)
    assert np.isfinite(joints).all()
