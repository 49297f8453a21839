from hiddenpose_tpu.models.blocks import (  # noqa: F401
    FeatureExtraction,
    ResConv3D,
)
from hiddenpose_tpu.models.nlospose import NlosPose, build_nlospose  # noqa: F401
from hiddenpose_tpu.models.posenet3d import (  # noqa: F401
    DeconvHead,
    PoseNet3D,
    get_pose_net_50,
)
from hiddenpose_tpu.models.unet3d import UNet3d  # noqa: F401
from hiddenpose_tpu.models.deepvoxels import (  # noqa: F401
    DeepVoxels,
    build_deepvoxels,
)
