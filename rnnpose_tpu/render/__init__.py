"""Rendering: mesh IO, rasterization, splatting, shading, fragmentation."""
from .mesh import TriMesh, load_mesh, load_obj, load_ply, normalize_mesh, pad_mesh, decimate_mesh, simplify_mesh  # noqa: F401
from .raster import Fragments, rasterize, interpolate_attributes, render_mesh_attributes  # noqa: F401
from .splat import splat_depth, splat_mask  # noqa: F401
from .shading import compute_vertex_normals, headlight_shade  # noqa: F401
