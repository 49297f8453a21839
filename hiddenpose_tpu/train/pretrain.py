"""Pretrained + frozen autoencoder support.

Re-design of `/root/reference/models/NlosPose.py:34-40` (when
``cfg.MODEL.PRETRAIN_AUTOENCODER`` the whole pretrained UNet3d is
``torch.load``-ed and substituted for the fresh one) together with
``freeze_layer`` (`/root/reference/unet/unet3d.py:107-118` — sets
``requires_grad=False`` on every parameter of the module).

TPU-native equivalents:
* the pretrained weights are an Orbax checkpoint of the ``autoencoder``
  params subtree, grafted into the freshly-initialised variables pytree
  (pure function — no module surgery);
* freezing is an ``optax.multi_transform`` whose 'frozen' branch is
  ``optax.set_to_zero()`` — gradients still flow *through* the autoencoder
  to upstream stages (as they do in the reference: requires_grad=False
  stops the leaf update, not the chain rule), but its parameters never
  move and carry no Adam moments.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import optax

AUTOENCODER_SCOPE = "autoencoder"


def save_autoencoder(directory: str, params: Any) -> str:
    """Export the autoencoder params subtree as its own Orbax checkpoint.

    `params` may be the full NlosPose params dict (the subtree is pulled
    out) or an already-extracted autoencoder subtree.
    """
    import orbax.checkpoint as ocp

    subtree = params.get(AUTOENCODER_SCOPE, params)
    path = os.path.abspath(directory)
    payload = jax.tree.map(np.asarray, dict(subtree))
    ocp.PyTreeCheckpointer().save(path, payload, force=True)
    return path


def load_pretrained_autoencoder(path: str, variables: dict) -> dict:
    """Return a new variables pytree with params['autoencoder'] replaced by
    the checkpointed weights (shapes validated against the template).

    Mirrors `models/NlosPose.py:36-38`: the pretrained module replaces the
    fresh one wholesale.
    """
    import orbax.checkpoint as ocp

    params = dict(variables["params"])
    if AUTOENCODER_SCOPE not in params:
        raise KeyError(
            f"variables has no '{AUTOENCODER_SCOPE}' scope; got "
            f"{sorted(params)}"
        )
    template = jax.tree.map(np.asarray, dict(params[AUTOENCODER_SCOPE]))
    restored = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(path), item=template
    )
    params[AUTOENCODER_SCOPE] = restored
    out = dict(variables)
    out["params"] = params
    return out


def autoencoder_freeze_labels(params: Any) -> Any:
    """Per-leaf 'frozen'/'train' labels for optax.multi_transform."""
    return {
        k: jax.tree.map(
            lambda _: "frozen" if k == AUTOENCODER_SCOPE else "train", v
        )
        for k, v in params.items()
    }


def freeze_autoencoder(
    tx: optax.GradientTransformation, params: Any
) -> optax.GradientTransformation:
    """Wrap an optimizer so the autoencoder subtree never updates."""
    labels = autoencoder_freeze_labels(params)
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels
    )
