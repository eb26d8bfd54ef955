from .synthetic import (  # noqa: F401
    Box, SyntheticScene, make_scene, render_stereo_pair, make_sbs_video_frames,
)
