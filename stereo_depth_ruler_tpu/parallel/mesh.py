"""Device mesh construction for the stereo engine.

The reference is single-process, single-thread (SURVEY.md §2.10); this
module defines the scale-out axes the TPU framework shards over:

- ``frame`` — data parallelism over video frames (the batch axis of the
  pipeline; maps the reference's frame loop, stereo_displayer.cpp:145-198);
- ``tile`` — spatial parallelism over image rows of the cost volume
  (TP/SP-analog; SGBM path aggregation needs halo exchange across tiles);
- ``disp`` — disparity-range parallelism over the D axis (EP-analog;
  WTA needs an argmin reduction across shards).

Meshes are created over ICI-connected devices; on multi-host slices
``jax.distributed.initialize`` + the same helpers apply unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "FRAME_AXIS", "TILE_AXIS", "DISP_AXIS"]

FRAME_AXIS = "frame"
TILE_AXIS = "tile"
DISP_AXIS = "disp"


def make_mesh(frame: int = 1, tile: int = 1, disp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes (frame, tile, disp); total must divide the device
    count. Axis order puts ``frame`` outermost (DCN-friendly: frames are
    independent) and ``disp`` innermost (ICI-heavy argmin reductions)."""
    devices = list(devices if devices is not None else jax.devices())
    n = frame * tile * disp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(frame, tile, disp)
    return Mesh(dev, (FRAME_AXIS, TILE_AXIS, DISP_AXIS))
