"""Incremental reconstruction core.

Host Python orchestrates the inherently sequential incremental loop
(scheduling, bookkeeping); every batched geometric computation — RANSAC,
triangulation, reprojection filtering, bundle adjustment — dispatches to the
device through the estimators/, geometry/ and optim/ layers.
"""

from monocularsfm_tpu.reconstruction.scene_graph import SceneGraph
from monocularsfm_tpu.reconstruction.register_graph import RegisterGraph
from monocularsfm_tpu.reconstruction.map_state import Map
from monocularsfm_tpu.reconstruction.map_builder import MapBuilder

__all__ = ["SceneGraph", "RegisterGraph", "Map", "MapBuilder"]
