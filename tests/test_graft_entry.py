"""Driver entry-point contract tests (tiny shapes, CPU)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core CI host


def test_entry_contract():
    os.environ["HP_ENTRY_SIZE"] = "16"
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    preds, heatmaps = out
    assert preds.shape == (1, 72)
    assert heatmaps.shape[:2] == (1, 24)
    assert np.isfinite(np.asarray(preds)).all()
