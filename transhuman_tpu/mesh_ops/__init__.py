"""Mesh extraction from density grids + PLY export (the reference's
PyMCubes + trimesh stage, if_mesh_renderer.py:98-113)."""

from .marching import marching_tetrahedra  # noqa: F401
from .ply import save_ply  # noqa: F401
