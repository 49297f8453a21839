from hiddenpose_tpu.ops.lct import (  # noqa: F401
    LCTParams,
    lct_apply,
    lct_apply_bdthw,
    make_lct_params,
)
from hiddenpose_tpu.ops.psf import (  # noqa: F401
    define_psf,
    filter_laplacian,
    resampling_operator,
    wiener_inverse_psf,
)
