"""Solvers: rigid/non-rigid alignment, RANSAC estimators, BA, graph utils."""

from .srt import (estimate_scale, kabsch_rt, estimate_srt,
                  estimate_srt_ransac, remove_outliers, residual_error)
from .essential import remove_outliers_essential, rays_from_pixels
from .ba import (BAProblem, BAState, make_problem, solve_ba, gn_step,
                 reprojection_rmse, rodrigues)
from .pose_graph import build_data, refine_pose_graph
from .deformation import (Deformer, ARAPProblem, arap_solve,
                          uniform_sampling, knn_graph, find_correspondences,
                          smooth_displacements, mesh_edges,
                          cotangent_weights)
from .alignment import (remove_ground, init_alignment, local_alignment,
                        align, align_by_shoulder, AlignOutput)
from .pca import barycenter, aabb, pivots, extent_along, plane_fit
from .unionfind import (UnionFind, retain_largest_component,
                        largest_point_component)

__all__ = [
    "estimate_scale", "kabsch_rt", "estimate_srt", "estimate_srt_ransac",
    "remove_outliers", "residual_error",
    "remove_outliers_essential", "rays_from_pixels",
    "BAProblem", "BAState", "make_problem", "solve_ba", "gn_step",
    "reprojection_rmse", "rodrigues",
    "build_data", "refine_pose_graph",
    "Deformer", "ARAPProblem", "arap_solve", "uniform_sampling",
    "knn_graph", "find_correspondences", "smooth_displacements",
    "mesh_edges", "cotangent_weights",
    "remove_ground", "init_alignment", "local_alignment", "align",
    "align_by_shoulder", "AlignOutput",
    "barycenter", "aabb", "pivots", "extent_along", "plane_fit",
    "UnionFind", "retain_largest_component", "largest_point_component",
]
