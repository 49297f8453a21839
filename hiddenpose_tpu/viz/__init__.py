from hiddenpose_tpu.viz.visualizer import (  # noqa: F401
    SMPL_BONES,
    SMPL_JOINT_NAMES,
    joints_log,
    plot_volume_html,
    threeviews_log,
    vis_3view,
    volume_log,
)
