from hiddenpose_tpu.train.optim import make_optimizer, multistep_lr  # noqa: F401
from hiddenpose_tpu.train.state import TrainState  # noqa: F401
from hiddenpose_tpu.train.step import (  # noqa: F401
    make_eval_step,
    make_forward,
    make_train_step,
)
from hiddenpose_tpu.train.pretrain import (  # noqa: F401
    freeze_autoencoder,
    load_pretrained_autoencoder,
    save_autoencoder,
)
