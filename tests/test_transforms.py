import numpy as np
import jax.numpy as jnp

from multiviewstitch_tpu.core import transforms as T


def rand_similarity(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return T.Similarity(jnp.asarray(rng.uniform(0.5, 2.0), dtype),
                        jnp.asarray(Q, dtype),
                        jnp.asarray(rng.normal(size=3), dtype))


def test_apply_inverse_roundtrip():
    S = rand_similarity(0)
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(50, 3)),
                      jnp.float32)
    out = T.apply_points(S, pts)
    back = T.apply_points(T.inverse(S), out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_compose_matches_sequential_apply():
    A, B = rand_similarity(2), rand_similarity(3)
    pts = jnp.asarray(np.random.default_rng(4).normal(size=(20, 3)),
                      jnp.float32)
    seq = T.apply_points(A, T.apply_points(B, pts))
    comp = T.apply_points(T.compose(A, B), pts)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(seq), atol=1e-5)


def test_chain_matches_reference_loop():
    # reference left-compose loop (Processor.cpp:819-823): after solving edge
    # k->k+1 transform T_k, all accumulated transforms get left-composed.
    K = 4
    edges = [rand_similarity(10 + k) for k in range(K)]
    s = jnp.stack([e.s for e in edges])
    R = jnp.stack([e.R for e in edges])
    t = jnp.stack([e.t for e in edges])
    chained = T.chain(T.Similarity(s, R, t))
    assert chained.s.shape == (K + 1,)

    # loop emulation: cumulative transform of frame k into frame K
    for k in range(K + 1):
        acc = T.Similarity(jnp.asarray(1.0), jnp.eye(3), jnp.zeros(3))
        for j in range(k, K):
            acc = T.compose(edges[j], acc)
        pts = jnp.asarray(np.random.default_rng(k).normal(size=(5, 3)),
                          jnp.float32)
        np.testing.assert_allclose(
            np.asarray(T.apply_points(chained[k], pts)),
            np.asarray(T.apply_points(acc, pts)), atol=1e-4)


def test_rotation_about_axis():
    R = T.rotation_about_axis(jnp.asarray([0.0, 0.0, 1.0]),
                              jnp.asarray(np.pi / 2))
    out = np.asarray(R) @ np.array([1.0, 0, 0])
    np.testing.assert_allclose(out, [0, 1, 0], atol=1e-6)
    # orthonormality for arbitrary axis
    ax = np.array([1.0, 2.0, -0.5])
    ax /= np.linalg.norm(ax)
    R2 = np.asarray(T.rotation_about_axis(jnp.asarray(ax), jnp.asarray(0.7)))
    np.testing.assert_allclose(R2 @ R2.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R2), 1.0, atol=1e-6)
    np.testing.assert_allclose(R2 @ ax, ax, atol=1e-6)


def test_matrix_form():
    S = rand_similarity(7)
    M = np.asarray(S.matrix())
    pts = np.random.default_rng(8).normal(size=(10, 3)).astype(np.float32)
    hom = (M @ np.concatenate([pts, np.ones((10, 1))], 1).T).T[:, :3]
    np.testing.assert_allclose(
        hom, np.asarray(T.apply_points(S, jnp.asarray(pts))), atol=1e-5)
