from hiddenpose_tpu.utils.logging import MetricWriter, create_logger  # noqa: F401
