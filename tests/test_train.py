"""Training-stack tests: schedule semantics, train step convergence-ish
behaviour, checkpoint round-trip, resume."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core CI host

import jax
import jax.numpy as jnp

from hiddenpose_tpu.config import default_config
from hiddenpose_tpu.data.synthetic import make_batch
from hiddenpose_tpu.models.nlospose import build_nlospose
from hiddenpose_tpu.train import checkpoint as ckpt
from hiddenpose_tpu.train.optim import make_optimizer, multistep_lr
from hiddenpose_tpu.train.state import TrainState
from hiddenpose_tpu.train.step import make_eval_step, make_train_step

SIZE = 16
CFG = default_config().tiny(SIZE)


def test_multistep_lr_reference_semantics():
    # Reference: MultiStepLR([2,4,13], 0.2) stepped BEFORE each epoch
    # (train.py:140-141,193): epoch 0 -> 1e-3, epoch 1.. -> 2e-4,
    # epoch 3.. -> 4e-5, epoch 12.. -> 8e-6.
    sched = multistep_lr(1e-3, (2, 4, 13), 0.2, steps_per_epoch=10,
                         step_before_epoch=True)
    get = lambda epoch: float(sched(epoch * 10))
    np.testing.assert_allclose(get(0), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(get(1), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(get(2), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(get(3), 4e-5, rtol=1e-6)
    np.testing.assert_allclose(get(11), 4e-5, rtol=1e-6)
    np.testing.assert_allclose(get(12), 8e-6, rtol=1e-6)

    sched2 = multistep_lr(1e-3, (2,), 0.2, steps_per_epoch=10,
                          step_before_epoch=False)
    np.testing.assert_allclose(float(sched2(10)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched2(20)), 2e-4, rtol=1e-6)


def _tiny_state_and_batch():
    model, lct = build_nlospose(CFG.model)
    batch = make_batch(
        [0, 1], time_size=SIZE, image_size=SIZE, grid=SIZE,
        heatmap_size=SIZE // 2, bin_len=CFG.model.bin_len,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(
        jax.random.PRNGKey(0), batch["meas"][:1], lct, train=False
    )
    tx = make_optimizer(CFG.train, steps_per_epoch=1)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    return model, lct, state, batch


@pytest.fixture(scope="module")
def setup():
    return _tiny_state_and_batch()


def test_train_step_runs_and_reduces_loss(setup):
    model, lct, state, batch = setup
    step = make_train_step(model, donate=False)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch, lct)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 3
    # params actually moved
    # (loss may be non-monotonic over 3 steps; just require change)
    assert losses[0] != losses[-1]


def test_batch_stats_update_in_train_mode(setup):
    model, lct, state, batch = setup
    step = make_train_step(model, donate=False)
    new_state, _ = step(state, batch, lct)
    before = jax.tree.leaves(state.batch_stats)
    after = jax.tree.leaves(new_state.batch_stats)
    changed = any(
        float(jnp.abs(a - b).max()) > 0 for a, b in zip(before, after)
    )
    assert changed, "BatchNorm running stats did not update"


def test_eval_step_outputs(setup):
    model, lct, state, batch = setup
    eval_step = make_eval_step(model)
    out = eval_step(state, batch, lct)
    assert out["pred_joints"].shape == (2, 72)
    assert np.isfinite(float(out["joint_loss"]))


def test_checkpoint_roundtrip(tmp_path, setup):
    model, lct, state, batch = setup
    path = ckpt.save_checkpoint(str(tmp_path), state, epoch=3, global_iter=42)
    assert os.path.exists(path)

    # Restore into a fresh state; params must match bitwise.
    tx = make_optimizer(CFG.train, steps_per_epoch=1)
    variables = model.init(
        jax.random.PRNGKey(123), batch["meas"][:1], lct, train=False
    )
    fresh = TrainState.create(variables["params"], variables["batch_stats"], tx)
    restored, epoch, giter = ckpt.restore_checkpoint(path, fresh)
    assert (epoch, giter) == (3, 42)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    assert ckpt.latest_checkpoint(str(tmp_path)).endswith("epoch_3")


def test_train_loop_aborts_on_nonfinite_loss(tmp_path):
    """Trainer-level failure detection: a poisoned batch stops the loop
    instead of corrupting the optimizer state."""
    import dataclasses

    from hiddenpose_tpu.data.dataset import SyntheticSource
    from hiddenpose_tpu.train.loop import train

    class PoisonedSource(SyntheticSource):
        def __getitem__(self, index):
            item = dict(super().__getitem__(index))
            item["meas"] = np.full_like(item["meas"], np.nan)
            return item

    cfg = dataclasses.replace(
        CFG,
        log_dir=str(tmp_path / "log"),
        train=dataclasses.replace(CFG.train, end_epoch=1, batch_size=2),
    )
    src = PoisonedSource(cfg, length=4)
    result = train(
        cfg, source=src, workdir=str(tmp_path / "ckpt"),
        max_steps_per_epoch=3, use_mesh=False, log_every=1,
    )
    # aborted inside epoch 0 before completing it
    assert result.epochs_run == 0
    assert not np.isfinite(float(result.last_metrics["loss"]))
