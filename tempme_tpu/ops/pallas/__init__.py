"""Pallas TPU kernels (fused attention core, walk->edge scatter-max)."""
from . import kernels
from .kernels import enabled, fused_attend, walk_to_edge_max

__all__ = ["kernels", "enabled", "fused_attend", "walk_to_edge_max"]
