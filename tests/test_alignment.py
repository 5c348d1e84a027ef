import numpy as np
import jax.numpy as jnp
import pytest

from multiviewstitch_tpu.core.transforms import rotation_between
from multiviewstitch_tpu.models import parts as P
from multiviewstitch_tpu.models.parts import (load_parts, save_parts,
                                              part_recog,
                                              nearest_neighbor_indices)
from multiviewstitch_tpu.models.template_body import (make_template,
                                                      pose_template)
from multiviewstitch_tpu.solvers.alignment import (remove_ground,
                                                   init_alignment,
                                                   local_alignment, align)
from multiviewstitch_tpu.solvers.pca import pivots, plane_fit
from multiviewstitch_tpu.ops.mesh_normals import vertex_normals


@pytest.fixture(scope="module")
def template():
    return make_template()


def add_ground(verts, faces, y=0.0, size=0.7, grid=30):
    # a small dense patch under the body (like the reference's scans): the
    # body must stay the PCA-dominant structure for ground detection
    """Append a ground plane mesh below the body."""
    g = np.linspace(-size, size, grid)
    xx, zz = np.meshgrid(g, g)
    gverts = np.stack([xx.ravel(), np.full(grid * grid, y), zz.ravel()],
                      -1).astype(np.float32)
    gfaces = []
    for i in range(grid - 1):
        for j in range(grid - 1):
            a = i * grid + j
            gfaces.append([a, a + 1, a + grid])
            gfaces.append([a + 1, a + grid + 1, a + grid])
    gfaces = np.asarray(gfaces, np.int32) + len(verts)
    return (np.concatenate([verts, gverts]),
            np.concatenate([faces, gfaces]))


def test_rotation_between():
    a = jnp.asarray([1.0, 0, 0])
    b = jnp.asarray([0.0, 1.0, 0])
    R = np.asarray(rotation_between(a, b))
    np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-6)
    # parallel + antiparallel
    Ri = np.asarray(rotation_between(a, a))
    np.testing.assert_allclose(Ri, np.eye(3), atol=1e-6)
    Ra = np.asarray(rotation_between(a, -a))
    np.testing.assert_allclose(Ra @ np.array([1, 0, 0]), [-1, 0, 0],
                               atol=1e-5)
    np.testing.assert_allclose(Ra @ Ra.T, np.eye(3), atol=1e-5)


def test_template_generator(template):
    verts, faces, labels = template
    assert len(verts) > 500
    assert labels.min() >= 0 and labels.max() <= 15
    # all 16 parts present
    assert len(np.unique(labels)) == 16
    # body is ~1.8 m tall, centered at x~0
    assert 1.6 < verts[:, 1].max() - verts[:, 1].min() < 2.0
    assert abs(verts[:, 0].mean()) < 0.05
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_parts_file_roundtrip(tmp_path, template):
    verts, faces, labels = template
    p = str(tmp_path / "parts")
    save_parts(p, labels)
    l2 = load_parts(p, len(verts))
    np.testing.assert_array_equal(l2, labels)


def test_part_recog_transfers_labels(template):
    verts, faces, labels = template
    # scan = noisy copy of the template
    rng = np.random.default_rng(0)
    scan = verts + rng.normal(size=verts.shape).astype(np.float32) * 0.005
    out = part_recog(verts, labels, scan)
    assert (out == labels).mean() > 0.95


def test_nn_indices_exact():
    rng = np.random.default_rng(1)
    ref = rng.normal(size=(500, 3)).astype(np.float32)
    q = ref[[3, 77, 401]] + 1e-4
    idx = nearest_neighbor_indices(q, ref)
    np.testing.assert_array_equal(idx, [3, 77, 401])


def test_plane_fit():
    rng = np.random.default_rng(2)
    # points on plane z = 0.5 (n=(0,0,1), d=-0.5 in n.x+d=0 form up to sign)
    pts = np.zeros((100, 3), np.float32)
    pts[:, :2] = rng.normal(size=(100, 2))
    pts[:, 2] = 0.5
    n, d = plane_fit(jnp.asarray(pts))
    n = np.asarray(n)
    resid = np.abs(pts @ n + float(d))
    assert resid.max() < 1e-4


def test_remove_ground(template):
    verts, faces, labels = template
    v2, f2 = add_ground(verts, faces, y=verts[:, 1].min() - 0.02)
    res = remove_ground(v2, None, f2, dist_thres=0.7)
    # ground gone: remaining points are the body (all above ~0)
    assert res.points[:, 1].min() > -0.05
    assert len(res.points) > 0.6 * len(verts)
    # ground ray points downward (toward the removed ground)
    assert res.ground_ray[1] < 0 or abs(res.ground_ray[1]) > 0.9


def test_init_alignment_recovers_pose(template):
    verts, faces, labels = template
    # scan = template rotated (about y), scaled, translated
    ang = np.radians(30)
    R_gt = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                     [-np.sin(ang), 0, np.cos(ang)]])
    s_gt = 1.2
    t_gt = np.array([0.3, -0.2, 0.5])
    tgt = (s_gt * (R_gt @ verts.T).T + t_gt).astype(np.float32)
    ground_ray = R_gt @ np.array([0.0, -1.0, 0.0])  # body axis 0 = vertical
    view_ray = R_gt @ np.array([0.0, 0.0, 1.0])
    s, R, t = init_alignment(verts, tgt, ground_ray, view_ray)
    out = s * (R @ verts.T).T + t
    err = np.linalg.norm(out - tgt, axis=1)
    # PCA init is approximate; it must land in the right neighborhood
    assert np.median(err) < 0.15 * s_gt
    assert abs(s - s_gt) / s_gt < 0.1


def test_local_alignment_fixes_limb_pose(template):
    verts, faces, labels = template
    # scan: same body with arms rotated down 25 deg
    tgt = pose_template(verts, labels, arm_angle_deg=25.0)
    src = verts.copy()
    nrm = np.asarray(vertex_normals(jnp.asarray(verts), jnp.asarray(faces)))
    out, _ = local_alignment(src, nrm, labels, tgt, labels)
    arm = np.isin(labels, (P.LEFT_UPPER_ARM, P.LEFT_LOWER_ARM, P.LEFT_HAND))
    before = np.linalg.norm(src[arm] - tgt[arm], axis=1).mean()
    after = np.linalg.norm(out[arm] - tgt[arm], axis=1).mean()
    assert after < 0.5 * before
    # non-limb parts untouched
    trunk = labels == P.TRUNCUS
    np.testing.assert_allclose(out[trunk], src[trunk])


def test_full_align_pipeline(template):
    verts, faces, labels = template
    # scan: posed copy + ground plane, mild similarity offset
    posed = pose_template(verts, labels, arm_angle_deg=20.0)
    s_gt, t_gt = 1.1, np.array([0.2, 0.05, -0.1])
    scan_v = (s_gt * posed + t_gt).astype(np.float32)
    scan_v, scan_f = add_ground(scan_v, faces,
                                y=scan_v[:, 1].min() - 0.02)
    res = align(verts, None, labels, scan_v, None, scan_f,
                view_ray=np.array([0.0, 0.0, 1.0]))
    # aligned template must be close to the posed scan body
    gt_body = (s_gt * posed + t_gt)
    err = np.linalg.norm(res.src - gt_body, axis=1)
    assert np.median(err) < 0.12
