"""Facet and vertex normal computation as jitted segment-sums.

Re-design of Mesh::CalFacetNormal/CalVtxNormal (PlyObj.cpp:139-243): the
reference builds vertex->facet adjacency lists and averages unit facet
normals per vertex (area-unweighted). Here it's two scatter-adds over the
face list — no adjacency structure needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def facet_normals(vertices, faces, normalize: bool = True):
    """Per-face normals [F,3] from cross products (PlyObj.cpp:139-168)."""
    p0 = vertices[faces[:, 0]]
    p1 = vertices[faces[:, 1]]
    p2 = vertices[faces[:, 2]]
    n = jnp.cross(p1 - p0, p2 - p0)
    if normalize:
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return n


@partial(jax.jit, static_argnames=("num_vertices",))
def vertex_normals(vertices, faces, face_mask=None, *, num_vertices=None):
    """Area-unweighted average of adjacent unit facet normals per vertex,
    matching Mesh::CalVtxNormal (PlyObj.cpp:170-243). faces may be padded;
    pass face_mask to exclude padding."""
    nv = num_vertices or vertices.shape[0]
    fn = facet_normals(vertices, faces)
    if face_mask is not None:
        fn = jnp.where(face_mask[:, None], fn, 0.0)
    acc = jnp.zeros((nv, 3), vertices.dtype)
    cnt = jnp.zeros((nv,), vertices.dtype)
    one = jnp.ones(faces.shape[0], vertices.dtype)
    if face_mask is not None:
        one = jnp.where(face_mask, one, 0.0)
    for k in range(3):
        acc = acc.at[faces[:, k]].add(fn, mode="drop")
        cnt = cnt.at[faces[:, k]].add(one, mode="drop")
    n = acc / jnp.maximum(cnt[:, None], 1.0)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
