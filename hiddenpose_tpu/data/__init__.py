from hiddenpose_tpu.data.dataset import (  # noqa: F401
    DataPipeline,
    NlosFlatSource,
    NlosPoseSource,
    SyntheticSource,
    collate,
)
from hiddenpose_tpu.data.preprocess import (  # noqa: F401
    load_fk_measurement,
    load_realdata,
    map_joints_to_heatmap,
    preprocess_measurement,
)
from hiddenpose_tpu.data.synthetic import make_batch, make_sample  # noqa: F401
