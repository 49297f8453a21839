from hiddenpose_tpu.eval.metrics import mpjpe, pa_mpjpe, pck  # noqa: F401
