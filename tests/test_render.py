import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnnpose_tpu.geometry import projective as proj
from rnnpose_tpu.render import mesh as mesh_lib
from rnnpose_tpu.render.raster import (
    Fragments,
    interpolate_attributes,
    rasterize,
    render_mesh_attributes,
)
from rnnpose_tpu.render.splat import splat_depth, splat_mask

K = jnp.asarray([[100.0, 100.0, 32.0, 32.0]])
H = W = 64


def make_square(z=1.0, half=0.2):
    """Two triangles forming a square centered on the optical axis at depth z."""
    v = np.array(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]],
        np.float32,
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return v, f


def pad_faces(f, n=128):
    out = np.zeros((n, 3), np.int32)
    out[: len(f)] = f
    return out


def test_rasterize_square_analytic():
    v, f = make_square(z=1.0, half=0.2)
    frags = rasterize(jnp.asarray(v)[None], jnp.asarray(pad_faces(f)), K, H, W)
    mask = np.asarray(frags.face_id >= 0)[0]
    # square spans x,y in [-0.2, 0.2] at z=1 -> pixels [12, 52) around center 32
    ys, xs = np.nonzero(mask)
    assert abs(xs.min() - 12) <= 1 and abs(xs.max() - 51) <= 1
    assert abs(ys.min() - 12) <= 1 and abs(ys.max() - 51) <= 1
    z = np.asarray(frags.zbuf)[0][mask]
    np.testing.assert_allclose(z, np.full_like(z, 1.0), atol=1e-4)


def test_rasterize_depth_ordering():
    """A nearer triangle must win the z-buffer."""
    v1, f1 = make_square(z=2.0, half=0.3)
    v2, f2 = make_square(z=1.0, half=0.1)
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + 4])
    frags = rasterize(jnp.asarray(v)[None], jnp.asarray(pad_faces(f)), K, H, W)
    zb = np.asarray(frags.zbuf)[0]
    # far square: +-0.3/2.0 * 100 = +-15px -> cols 17..47; near: +-10px -> 22..42
    assert abs(zb[32, 32] - 1.0) < 1e-3  # center: near square wins
    assert abs(zb[32, 20] - 2.0) < 1e-3  # annulus: far square only


def test_rasterize_barycentric_interpolation():
    """Linear attribute over a planar square must interpolate linearly."""
    v, f = make_square(z=1.0, half=0.2)
    attrs = jnp.asarray(v[:, :1] * 10.0)[None]  # attribute = 10 * x
    am, depth, mask = render_mesh_attributes(
        jnp.asarray(v)[None], jnp.asarray(pad_faces(f)), K, attrs, H, W
    )
    m = np.asarray(mask[0]) > 0
    a = np.asarray(am)[0, :, :, 0]
    # At pixel (x_px, y), x_world = (x_px + 0.5 - 32) / 100; attr = 10 * x_world
    g = proj.coords_grid(H, W)
    expected = 10.0 * (np.asarray(g[..., 0]) + 0.5 - 32.0) / 100.0
    np.testing.assert_allclose(a[m], expected[m], atol=2e-2)


def test_rasterize_empty_when_behind():
    v, f = make_square(z=-1.0)
    frags = rasterize(jnp.asarray(v)[None], jnp.asarray(pad_faces(f)), K, H, W)
    assert int((frags.face_id >= 0).sum()) == 0


def test_rasterize_batch(rng):
    v, f = make_square()
    v2 = v + np.array([0.3, 0.0, 0.0], np.float32)
    verts = jnp.asarray(np.stack([v, v2]))
    frags = rasterize(verts, jnp.asarray(pad_faces(f)), jnp.tile(K, (2, 1)), H, W)
    m0 = np.asarray(frags.face_id[0] >= 0)
    m1 = np.asarray(frags.face_id[1] >= 0)
    assert m0.sum() > 0 and m1.sum() > 0
    ys0, xs0 = np.nonzero(m0)
    ys1, xs1 = np.nonzero(m1)
    assert xs1.mean() > xs0.mean() + 20  # shifted square


def test_attribute_gradient_flows():
    v, f = make_square()
    attrs = jnp.ones((1, 4, 2))

    def loss(a):
        am, _, _ = render_mesh_attributes(
            jnp.asarray(v)[None], jnp.asarray(pad_faces(f)), K, a, H, W
        )
        return jnp.sum(am**2)

    g = jax.grad(loss)(attrs)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_rasterize_jits():
    v, f = make_square()
    fn = jax.jit(
        lambda verts: rasterize(verts, jnp.asarray(pad_faces(f)), K, H, W).zbuf
    )
    z = fn(jnp.asarray(v)[None])
    assert z.shape == (1, H, W)


def test_splat_depth_square(rng):
    pts = rng.uniform(-0.2, 0.2, (1, 500, 3)).astype(np.float32)
    pts[..., 2] = 1.0
    d = splat_depth(jnp.asarray(pts), K, H, W, radius=1)
    m = np.asarray(d) > 0
    assert m.sum() > 400
    np.testing.assert_allclose(np.asarray(d)[m], 1.0, atol=1e-5)


def test_splat_mask_keeps_min_depth(rng):
    pts = np.array([[[0.0, 0.0, 2.0], [0.0, 0.0, 1.0]]], np.float32)
    d = splat_depth(jnp.asarray(pts), K, H, W, radius=0)
    assert abs(float(d[0, 32, 32]) - 1.0) < 1e-5


# ------------------------------------------------------------------ mesh io
def test_obj_roundtrip(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    m = mesh_lib.load_mesh(str(p))
    assert m.verts.shape == (3, 3)
    np.testing.assert_array_equal(m.faces, [[0, 1, 2]])


def test_obj_quad_triangulated(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    m = mesh_lib.load_mesh(str(p))
    assert m.faces.shape == (2, 3)


def test_ply_ascii(tmp_path):
    p = tmp_path / "tri.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\nend_header\n"
        "0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n"
    )
    m = mesh_lib.load_mesh(str(p))
    assert m.verts.shape == (3, 3)
    np.testing.assert_array_equal(m.faces, [[0, 1, 2]])


def test_ply_binary(tmp_path):
    import struct

    p = tmp_path / "b.ply"
    header = (
        "ply\nformat binary_little_endian 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "element face 1\nproperty list uchar int vertex_indices\nend_header\n"
    )
    body = b""
    for i, v in enumerate([(0, 0, 0), (1, 0, 0), (0, 1, 0)]):
        body += struct.pack("<fffBBB", *v, 255, 128, 0)
    body += struct.pack("<Biii", 3, 0, 1, 2)
    p.write_bytes(header.encode() + body)
    m = mesh_lib.load_mesh(str(p))
    assert m.verts.shape == (3, 3)
    np.testing.assert_allclose(m.vert_colors[0], [1.0, 128 / 255, 0.0], atol=1e-6)
    np.testing.assert_array_equal(m.faces, [[0, 1, 2]])


def test_normalize_mesh():
    v = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0], [0, 0, 2]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    m, center, scale = mesh_lib.normalize_mesh(mesh_lib.TriMesh(v, f, np.ones_like(v)))
    np.testing.assert_allclose(center, [1, 1, 1])
    np.testing.assert_allclose(scale, np.sqrt(12), rtol=1e-6)
    ext = m.verts.max(0) - m.verts.min(0)
    np.testing.assert_allclose(np.linalg.norm(ext), 1.0, rtol=1e-5)


def test_pad_mesh():
    v = np.ones((3, 3), np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    m = mesh_lib.pad_mesh(mesh_lib.TriMesh(v, f, v.copy()), 10, 8)
    assert m.verts.shape == (10, 3) and m.faces.shape == (8, 3)
    assert m.num_verts == 3 and m.num_faces == 1
    # padded faces are degenerate -> culled by rasterize's default face_valid
    assert (m.faces[1:] == 0).all()


def test_simplify_mesh_budgets_and_geometry():
    """Vertex clustering must hit the budget and stay on the surface."""
    from rnnpose_tpu.data.synthetic import make_icosphere

    m = make_icosphere(subdivisions=4, radius=0.1)  # 2562 v / 5120 f
    s = mesh_lib.simplify_mesh(m, max_verts=512, max_faces=1024)
    assert s.num_verts <= 512 and s.num_faces <= 1024
    # Uses most of the budget (binary search on resolution).
    assert s.num_faces > 512
    # Cluster vertices stay near the unit sphere surface.
    r = np.linalg.norm(s.verts[: s.num_verts], axis=-1)
    np.testing.assert_allclose(r, 0.1, atol=0.004)
    # No degenerate or duplicate faces.
    f = s.faces[: s.num_faces]
    assert (f[:, 0] != f[:, 1]).all() and (f[:, 1] != f[:, 2]).all()
    assert len(np.unique(np.sort(f, 1), axis=0)) == s.num_faces


def test_simplify_mesh_no_interior_holes():
    """Golden render check (VERDICT r1 #4): the simplified mesh's rendered
    mask must have zero interior holes, unlike random face deletion."""
    from scipy import ndimage

    from rnnpose_tpu.data.synthetic import make_icosphere

    m = make_icosphere(subdivisions=4, radius=0.25)
    s = mesh_lib.simplify_mesh(m, max_verts=512, max_faces=1024)
    s = mesh_lib.pad_mesh(s, 512, 1024)
    v = s.verts + np.array([0.0, 0.0, 1.0], np.float32)  # in front of camera
    frags = rasterize(jnp.asarray(v)[None], jnp.asarray(s.faces), K, H, W)
    mask = np.asarray(frags.face_id >= 0)[0]
    assert mask.sum() > 500  # sphere covers a real area
    filled = ndimage.binary_fill_holes(mask)
    n_holes = int(filled.sum() - mask.sum())
    assert n_holes == 0, f"{n_holes} interior hole pixels in simplified render"
    # Control: random face deletion at the same budget DOES leave holes.
    d = mesh_lib.decimate_mesh(make_icosphere(4, 0.25), 1024)
    d = mesh_lib.pad_mesh(d, d.num_verts, 1024)
    vd = d.verts + np.array([0.0, 0.0, 1.0], np.float32)
    frags_d = rasterize(jnp.asarray(vd)[None], jnp.asarray(d.faces), K, H, W)
    mask_d = np.asarray(frags_d.face_id >= 0)[0]
    holes_d = int(ndimage.binary_fill_holes(mask_d).sum() - mask_d.sum())
    assert holes_d > 0  # documents why simplify_mesh replaced decimate_mesh


def test_orient_faces_outward():
    """Randomly flipped sphere faces -> consistent outward winding."""
    from rnnpose_tpu.data.synthetic import make_icosphere

    m = make_icosphere(subdivisions=2, radius=0.1)
    rs = np.random.RandomState(0)
    f = m.faces.copy()
    flipped = rs.rand(len(f)) < 0.5
    f[flipped] = f[flipped][:, [0, 2, 1]]
    broken = mesh_lib.TriMesh(m.verts, f, m.vert_colors)
    fixed = mesh_lib.orient_faces_outward(broken)
    p0 = fixed.verts[fixed.faces[:, 0]]
    p1 = fixed.verts[fixed.faces[:, 1]]
    p2 = fixed.verts[fixed.faces[:, 2]]
    n = np.cross(p1 - p0, p2 - p0)
    cent = (p0 + p1 + p2) / 3.0
    # Sphere: every outward normal points away from the origin.
    assert (np.einsum("fi,fi->f", n, cent) > 0).all()
    # Simplified meshes stay orientable too.
    s = mesh_lib.simplify_mesh(m, 128, 256)
    s = mesh_lib.orient_faces_outward(s)
    p0, p1, p2 = (s.verts[s.faces[:, i]] for i in range(3))
    n = np.cross(p1 - p0, p2 - p0)
    cent = (p0 + p1 + p2) / 3.0
    assert (np.einsum("fi,fi->f", n, cent) > 0).mean() > 0.97
