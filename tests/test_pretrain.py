"""Pretrained + frozen autoencoder path (VERDICT round-1 missing #1).

Reference semantics under test: `models/NlosPose.py:34-40` (substitute a
pretrained UNet3d when cfg.MODEL.PRETRAIN_AUTOENCODER) and
`unet/unet3d.py:107-118` (freeze_layer — frozen leaves must be bit-identical
after a train step while the rest of the model still updates)."""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core CI host

import jax
import jax.numpy as jnp

from hiddenpose_tpu.config import default_config
from hiddenpose_tpu.data.synthetic import make_batch
from hiddenpose_tpu.models.nlospose import build_nlospose
from hiddenpose_tpu.train.optim import make_optimizer
from hiddenpose_tpu.train.pretrain import (
    freeze_autoencoder,
    load_pretrained_autoencoder,
    save_autoencoder,
)
from hiddenpose_tpu.train.state import TrainState
from hiddenpose_tpu.train.step import make_train_step

SIZE = 16
CFG = default_config().tiny(SIZE)


@pytest.fixture(scope="module")
def setup():
    model, lct = build_nlospose(CFG.model)
    batch = make_batch(
        [0, 1], time_size=SIZE, image_size=SIZE, grid=SIZE,
        heatmap_size=SIZE // 2, bin_len=CFG.model.bin_len,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(
        jax.random.PRNGKey(0), batch["meas"][:1], lct, train=False
    )
    return model, lct, variables, batch


def test_autoencoder_load_roundtrip(tmp_path, setup):
    model, lct, variables, batch = setup
    # "Pretrained" weights = the current ones perturbed, so a successful
    # load is distinguishable from a no-op.
    perturbed = jax.tree.map(
        lambda x: np.asarray(x) + 1.0, dict(variables["params"]["autoencoder"])
    )
    path = save_autoencoder(str(tmp_path / "unet_ckpt"), perturbed)

    loaded = load_pretrained_autoencoder(path, variables)
    for a, b in zip(
        jax.tree.leaves(loaded["params"]["autoencoder"]),
        jax.tree.leaves(perturbed),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Non-autoencoder scopes untouched.
    for k in variables["params"]:
        if k == "autoencoder":
            continue
        for a, b in zip(
            jax.tree.leaves(loaded["params"][k]),
            jax.tree.leaves(variables["params"][k]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frozen_autoencoder_leaves_bit_identical_after_step(setup):
    model, lct, variables, batch = setup
    tx = make_optimizer(CFG.train, steps_per_epoch=1)
    tx = freeze_autoencoder(tx, variables["params"])
    state = TrainState.create(
        variables["params"], variables["batch_stats"], tx
    )
    step = make_train_step(model, donate=False)
    new_state, metrics = step(state, batch, lct)
    assert np.isfinite(float(metrics["loss"]))

    # Frozen subtree: bit-identical.
    for a, b in zip(
        jax.tree.leaves(state.params["autoencoder"]),
        jax.tree.leaves(new_state.params["autoencoder"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The rest of the model must still have moved.
    moved = any(
        float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()) > 0
        for k in state.params
        if k != "autoencoder"
        for a, b in zip(
            jax.tree.leaves(state.params[k]),
            jax.tree.leaves(new_state.params[k]),
        )
    )
    assert moved, "non-frozen parameters did not update"


def test_train_loop_consumes_pretrain_flag(tmp_path, setup):
    """End-to-end: the config knob actually loads + freezes (the round-1
    dead-flag bug)."""
    from hiddenpose_tpu.data.dataset import SyntheticSource
    from hiddenpose_tpu.train.loop import train

    model, lct, variables, batch = setup
    path = save_autoencoder(
        str(tmp_path / "unet_ckpt"), variables["params"]["autoencoder"]
    )
    cfg = dataclasses.replace(
        CFG,
        log_dir=str(tmp_path / "log"),
        model=dataclasses.replace(
            CFG.model,
            pretrain_autoencoder=True,
            pretrain_autoencoder_path=path,
        ),
        train=dataclasses.replace(CFG.train, end_epoch=1, batch_size=2),
    )
    result = train(
        cfg, source=SyntheticSource(cfg, length=2),
        workdir=str(tmp_path / "ckpt"), max_steps_per_epoch=1,
        use_mesh=False, log_every=1,
    )
    assert result.epochs_run == 1
    # Autoencoder stayed at the pretrained values through a real step.
    for a, b in zip(
        jax.tree.leaves(result.state.params["autoencoder"]),
        jax.tree.leaves(variables["params"]["autoencoder"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
