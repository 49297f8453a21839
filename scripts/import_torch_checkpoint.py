"""Import a released PyTorch-reference checkpoint into an Orbax checkpoint.

Usage:
    python scripts/import_torch_checkpoint.py \
        --checkpoint /path/to/HiddenPose.pth --out ./checkpoints/imported

The ``.pth`` holds ``{model_state_dict, optimizer_state_dict, lr_scheduler,
epoch}`` (`/root/reference/test.py:133-136`).  Only the model weights are
imported (the torch Adam moments have no meaning for a fresh optax chain);
the result restores through ``hiddenpose_tpu.train.checkpoint`` for both
``test.py`` (MPJPE parity eval) and ``train.py --resume`` (fine-tuning).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="reference .pth file")
    ap.add_argument("--out", required=True, help="output checkpoint directory")
    ap.add_argument("--name", default="imported", help="checkpoint name")
    args = ap.parse_args(argv)

    import torch

    from hiddenpose_tpu.config import Config
    from hiddenpose_tpu.models.nlospose import build_nlospose
    from hiddenpose_tpu.train.checkpoint import save_checkpoint
    from hiddenpose_tpu.train.optim import make_optimizer
    from hiddenpose_tpu.train.state import TrainState
    from hiddenpose_tpu.utils.torch_import import convert_state_dict

    payload = torch.load(args.checkpoint, map_location="cpu")
    sd = payload.get("model_state_dict", payload)
    epoch = int(payload.get("epoch", 0)) if isinstance(payload, dict) else 0
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    tree = convert_state_dict(sd)

    cfg = Config().preset_t128()
    model, _ = build_nlospose(cfg.model)
    tx = make_optimizer(cfg.train)
    state = TrainState.create(tree["params"], tree["batch_stats"], tx)
    path = save_checkpoint(args.out, state, epoch=epoch, name=args.name)
    print(f"imported {len(sd)} tensors -> {path} (epoch {epoch})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
