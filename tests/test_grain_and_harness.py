"""Grain pipeline + evaluation harness tests (CPU)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core CI host

from hiddenpose_tpu.config import default_config

SIZE = 16
CFG = default_config().tiny(SIZE)


def test_grain_loader_batches():
    from hiddenpose_tpu.data.dataset import SyntheticSource
    from hiddenpose_tpu.data.grain_pipeline import make_grain_loader

    src = SyntheticSource(CFG, length=6)
    loader = make_grain_loader(src, batch_size=2, num_workers=0, num_epochs=1)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["meas"].shape == (2, 1, SIZE, SIZE, SIZE)
    assert b["joints"].shape == (2, 72)
    assert b["joints_vis"].shape == (2, 72)

    # deterministic given the seed
    loader2 = make_grain_loader(src, batch_size=2, num_workers=0, num_epochs=1)
    b2 = next(iter(loader2))
    np.testing.assert_array_equal(b["meas"], b2["meas"])


def test_eval_harness_metrics():
    import jax

    from hiddenpose_tpu.data.dataset import SyntheticSource
    from hiddenpose_tpu.eval.harness import evaluate
    from hiddenpose_tpu.models.nlospose import build_nlospose
    from hiddenpose_tpu.train.optim import make_optimizer
    from hiddenpose_tpu.train.state import TrainState

    import jax.numpy as jnp

    model, lct = build_nlospose(CFG.model)
    src = SyntheticSource(CFG, length=4)
    meas = jnp.asarray(src[0]["meas"][None])
    variables = jax.jit(
        lambda r, m: model.init(r, m, lct, train=False)
    )(jax.random.PRNGKey(0), meas)
    tx = make_optimizer(CFG.train)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    res = evaluate(model, state, lct, src, batch_size=2, num_workers=1)
    assert res["n_samples"] == 4
    assert np.isfinite(res["mpjpe"])
    assert np.isfinite(res["pa_mpjpe"])
    assert 0.0 <= res["pck"] <= 1.0
