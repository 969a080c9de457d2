"""Native TSDF fusion: build, integrate synthetic RGB-D, verify surface."""
import numpy as np
import pytest

from nerfloc_tpu.data.synthetic import look_at_pose, render_box_view


@pytest.fixture(scope="module")
def tsdf_mod():
    pytest.importorskip("ctypes")
    try:
        from nerfloc_tpu.native.tsdf import TSDFVolume
    except Exception as e:  # g++ missing etc.
        pytest.skip(f"native build unavailable: {e}")
    return TSDFVolume


def test_tsdf_box_fusion(tsdf_mod):
    TSDFVolume = tsdf_mod
    H, W = 60, 80
    f = 0.9 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    views = []
    for ang in np.linspace(0, 2 * np.pi, 8, endpoint=False):
        eye = np.array([0.2 * np.cos(ang), 0.0, 0.2 * np.sin(ang)])
        tgt = np.array([2.0 * np.cos(ang), 0.0, 2.0 * np.sin(ang)])
        c2w = look_at_pose(eye, tgt)
        rgb, depth = render_box_view(c2w, K, H, W)
        views.append((rgb, depth, c2w))

    bounds = TSDFVolume.frustum_bounds(
        [v[1] for v in views], [K] * len(views), [v[2] for v in views])
    vol = TSDFVolume(bounds, voxel_size=0.08)
    for rgb, depth, c2w in views:
        vol.integrate(rgb, depth, K, c2w)

    xyz, rgb = vol.get_point_cloud(thresh=0.3)
    assert len(xyz) > 200
    # surface points lie near the box walls |coord|_inf ~= 2
    m = np.abs(xyz).max(axis=1)
    assert (np.abs(m - 2.0) < 0.2).mean() > 0.8
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0

    # colors approximate the analytic texture at the surface points
    from nerfloc_tpu.data.synthetic import texture
    tex = texture(xyz.astype(np.float64))
    close = np.abs(tex - rgb).mean()
    assert close < 0.25


def test_tsdf_weights_accumulate(tsdf_mod):
    TSDFVolume = tsdf_mod
    H, W = 40, 40
    K = np.array([[40.0, 0, 20.0], [0, 40.0, 20.0], [0, 0, 1.0]])
    depth = np.full((H, W), 2.0, np.float32)
    c2w = np.eye(4)
    vol = TSDFVolume(np.array([[-1, 1], [-1, 1], [0.5, 3.0]]), 0.05)
    vol.integrate(None, depth, K, c2w)
    xyz1, _ = vol.get_point_cloud(0.2)
    vol.integrate(None, depth, K, c2w)
    xyz2, _ = vol.get_point_cloud(0.2)
    assert len(xyz1) > 0
    # re-integrating the same frame must not move the surface
    assert len(xyz2) == len(xyz1)
    z = xyz1[:, 2]
    assert (np.abs(z - 2.0) < 0.12).mean() > 0.9


def test_tsdf_mesh_extraction(tsdf_mod):
    TSDFVolume = tsdf_mod
    H, W = 40, 40
    K = np.array([[40.0, 0, 20.0], [0, 40.0, 20.0], [0, 0, 1.0]])
    depth = np.full((H, W), 2.013, np.float32)
    vol = TSDFVolume(np.array([[-1, 1], [-1, 1], [1.0, 3.0]]), 0.05)
    vol.integrate(None, depth, K, np.eye(4))
    tris = vol.get_mesh()
    assert len(tris) > 50
    # all triangle vertices lie near the z=2.013 plane
    z = tris[..., 2].reshape(-1)
    assert (np.abs(z - 2.013) < 0.1).mean() > 0.95
    # triangles have non-degenerate area
    a = tris[:, 1] - tris[:, 0]
    b = tris[:, 2] - tris[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(a, b), axis=1)
    assert (area > 0).mean() > 0.9
