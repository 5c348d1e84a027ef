import numpy as np
import jax.numpy as jnp

from multiviewstitch_tpu.ops.simplify import simplify_mesh
from multiviewstitch_tpu.pipeline.fixtures import uv_sphere
from multiviewstitch_tpu.models.template_body import make_template
from multiviewstitch_tpu.models import parts as P
from multiviewstitch_tpu.models.parts import load_shoulder_joints
from multiviewstitch_tpu.ops.mesh_normals import vertex_normals
from multiviewstitch_tpu.solvers.alignment import align_by_shoulder
from multiviewstitch_tpu.utils.profiling import device_time, compiled_flops


def test_simplify_sphere_keeps_shape():
    v, f = uv_sphere(24, 32, radius=1.0)
    v2, f2 = simplify_mesh(v, f, ratio=0.4)
    assert len(v2) <= 0.5 * len(v)
    assert len(f2) > 50
    r = np.linalg.norm(v2, axis=1)
    # collapsed vertices stay near the sphere (midpoint placement shrinks
    # chords slightly)
    assert (np.abs(r - 1.0) < 0.1).mean() > 0.95
    assert f2.min() >= 0 and f2.max() < len(v2)


def test_simplify_preserves_topology_validity():
    v, f = uv_sphere(12, 16)
    v2, f2 = simplify_mesh(v, f, ratio=0.3)
    # no degenerate faces
    assert ((f2[:, 0] != f2[:, 1]) & (f2[:, 1] != f2[:, 2]) &
            (f2[:, 0] != f2[:, 2])).all()


def test_align_by_shoulder_moves_arms(tmp_path):
    verts, faces, labels = make_template()
    nrm = np.asarray(vertex_normals(jnp.asarray(verts), jnp.asarray(faces)))
    # annotate shoulders: nearest template vertices to the joint locations
    lsh = np.argsort(np.linalg.norm(verts - [0.17, 1.40, 0.0], axis=1))[:5]
    rsh = np.argsort(np.linalg.norm(verts - [-0.17, 1.40, 0.0], axis=1))[:5]
    # shoulder file round trip (LoadShoulderJoints parity)
    p = str(tmp_path / "ShoulderJoint")
    with open(p, "w") as f:
        f.write("Left=" + ";".join(map(str, lsh)) + "\n")
        f.write("Right=" + ";".join(map(str, rsh)) + "\n")
    sj = load_shoulder_joints(p)
    assert sj["Left"] == list(lsh)

    # scan = template shifted: arms should move, trunk should not
    tgt = verts + np.array([0.0, 0.05, 0.1], np.float32)
    out = align_by_shoulder(verts, nrm, labels, tgt, labels,
                            [sj["Left"], sj["Right"]])
    arm = np.isin(labels, (P.LEFT_UPPER_ARM, P.LEFT_LOWER_ARM, P.LEFT_HAND))
    trunk = labels == P.TRUNCUS
    assert np.abs(out[arm] - verts[arm]).max() > 1e-3
    np.testing.assert_allclose(out[trunk], verts[trunk])


def test_profiling_helpers():
    import jax.numpy as jnp
    f = lambda x: (x * 2).sum()
    t = device_time(jnp.vectorize(f), jnp.ones(100), reps=2)
    assert t >= 0
    fl = compiled_flops(lambda x: x @ x, jnp.ones((32, 32)))
    assert fl is None or fl > 0
