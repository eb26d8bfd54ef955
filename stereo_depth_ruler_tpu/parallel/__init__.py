"""Multi-chip scale-out: device mesh + sharded pipeline steps."""

from .mesh import DISP_AXIS, FRAME_AXIS, TILE_AXIS, make_mesh
from .sharded import pipeline_step_sharded, sgbm_sharded

__all__ = ["make_mesh", "FRAME_AXIS", "TILE_AXIS", "DISP_AXIS",
           "sgbm_sharded", "pipeline_step_sharded"]
