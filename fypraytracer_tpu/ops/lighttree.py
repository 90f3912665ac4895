"""Light-tree importance descent + PMF replay — backend-generic.

Vectorized re-implementation of the reference device traversal:
  * ``cluster_importance`` — LightTree.cuh:91-117 (energy · cos(clamped
    angle) / dist², with θ_u from the cone enveloping the cluster AABB as
    seen from the shading point, ConeBounds.cuh:47-87);
  * ``pick_light`` — PickLight_TLAS/BLAS (LightTree.cu:4-154): binary
    descent weighted by child importances with random-number *remapping*
    (rand is rescaled into the chosen branch instead of redrawn), identical
    probability clamps (1e-6), leaf returns global triangle id + pmf;
  * ``emitter_pmf`` — ComputeDirectEmitterPMF (LightTree.cu:193-276), but
    replayed bottom-up through parent links in O(depth) instead of the
    reference's linear leaf scans (a precomputed emitter→leaf table,
    SURVEY.md §7 step 5).

Loops are fixed-length (``max_depth`` static meta) with masked updates, so
the same code runs eagerly in NumPy (oracle) and staged under jit.
"""

from __future__ import annotations

import numpy as np

from fypraytracer_tpu.core.mathutils import _xp, dot3, normalize
from fypraytracer_tpu.scene.types import LightTreeArrays

_P_CLAMP = 1e-6           # LightTree.cu:58
_RAND_CLAMP = 0.9999999   # LightTree.cu:23


def _cos_theta_u(box_lo, box_hi, point):
    """cos of the half-angle of the cone from ``point`` enveloping the
    AABB (ConeBounds.cuh:47-87): min over corners of cos(axis, corner)."""
    xp = _xp(point)
    centroid = 0.5 * (box_lo + box_hi)
    axis = normalize(centroid - point)
    min_cos = None
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                corner = xp.stack([
                    xp.where(cx == 0, box_lo[..., 0], box_hi[..., 0]),
                    xp.where(cy == 0, box_lo[..., 1], box_hi[..., 1]),
                    xp.where(cz == 0, box_lo[..., 2], box_hi[..., 2]),
                ], axis=-1)
                d = normalize(corner - point)
                c = xp.clip(dot3(axis, d, keepdims=False), -1.0, 1.0)
                min_cos = c if min_cos is None else xp.minimum(min_cos, c)
    return min_cos


def cluster_importance(lt: LightTreeArrays, node_idx, point):
    """ComputeClusterImportance (LightTree.cuh:91-117), transcendental-free.

    The reference computes ``cos(clamp(θ − θ_o − θ_u, 0, θ_e))`` through
    acos/cos (three transcendentals per node visit); here the same value
    is produced with angle-sum identities entirely in (cos, sin) space —
    all angles live in [0, π] so sines are non-negative and the clamp
    cases reduce to cosine comparisons:

      a = θ_o + θ_u:  cos_a/sin_a by angle sum;  a > π  ⟺  sin_a < 0.
      clamp-low  (θ ≤ a):        value 1.
      clamp-high (θ ≥ a + θ_e):  value cos θ_e;  impossible when a+θ_e ≥ π.
      else:                      value cos(θ − a) by angle difference.

    node_idx: (...,) i32 (assumed valid); point: (..., 3).
    """
    xp = _xp(point)
    box_lo = lt.box_lo[node_idx]
    box_hi = lt.box_hi[node_idx]
    cos_u = _cos_theta_u(box_lo, box_hi, point)
    sin_u = xp.sqrt(xp.maximum(1.0 - cos_u * cos_u, 0.0))

    centroid = 0.5 * (box_lo + box_hi)
    d = point - centroid
    dist2 = xp.maximum(dot3(d, d, keepdims=False), 1e-12)
    d = normalize(d)

    cos_t = xp.clip(dot3(lt.axis[node_idx], d, keepdims=False), -1.0, 1.0)
    sin_t = xp.sqrt(xp.maximum(1.0 - cos_t * cos_t, 0.0))

    cos_o = xp.cos(lt.theta_o)[node_idx]
    sin_o = xp.sin(lt.theta_o)[node_idx]
    cos_e = xp.cos(lt.theta_e)[node_idx]
    sin_e = xp.sin(lt.theta_e)[node_idx]

    cos_a = cos_o * cos_u - sin_o * sin_u          # cos(θ_o + θ_u)
    sin_a = sin_o * cos_u + cos_o * sin_u          # sin(θ_o + θ_u)

    # cos(θ − a), sin terms ≥ 0 on [0, π]
    cos_diff = cos_t * cos_a + sin_t * xp.abs(sin_a)

    a_gt_pi = sin_a < 0.0
    clamp_low = a_gt_pi | (cos_t >= cos_a)
    # a + θ_e ≥ π  ⟺  a > π, or θ_e ≥ π − a  ⟺  cos θ_e ≤ −cos_a
    b_ge_pi = a_gt_pi | (cos_e <= -cos_a)
    cos_b = cos_a * cos_e - sin_a * sin_e          # cos(a + θ_e)
    clamp_high = (~b_ge_pi) & (cos_t <= cos_b)

    val = xp.where(clamp_low, 1.0, xp.where(clamp_high, cos_e, cos_diff))
    return lt.energy[node_idx] * val / dist2


def _child_probs(lt: LightTreeArrays, parent_idx, point):
    """p(left | parent) with the reference's guards (LightTree.cu:41-58)."""
    xp = _xp(point)
    li = xp.maximum(lt.left[parent_idx], 0)
    ri = xp.maximum(lt.right[parent_idx], 0)
    i_l = cluster_importance(lt, li, point)
    i_r = cluster_importance(lt, ri, point)
    s = i_l + i_r
    p_left = xp.where(s > 0.0, i_l / xp.where(s > 0.0, s, 1.0), 0.5)
    return xp.clip(p_left, _P_CLAMP, 1.0 - _P_CLAMP)


def pick_light(lt: LightTreeArrays, point, rand):
    """Importance descent (PickLight, LightTree.cu:4-154).

    Args: point (B, 3); rand (B,) uniform in [0,1].
    Returns (tri, pmf): global triangle ids (B,) i32 (-1 if tree empty)
    and selection pmf (B,).
    """
    xp = _xp(point)
    idx = xp.zeros(point.shape[:-1], np.int32)
    pmf = xp.ones(point.shape[:-1], dtype=point.dtype)
    rand = xp.clip(rand, 0.0, _RAND_CLAMP)

    for _ in range(lt.max_depth):
        at_leaf = lt.left[idx] < 0
        p_left = _child_probs(lt, idx, point)
        go_left = rand < p_left
        new_pmf = pmf * xp.where(go_left, p_left, 1.0 - p_left)
        new_rand = xp.where(go_left, rand / p_left, (rand - p_left) / (1.0 - p_left))
        new_idx = xp.where(go_left, lt.left[idx], lt.right[idx])
        idx = xp.where(at_leaf, idx, new_idx)
        pmf = xp.where(at_leaf, pmf, new_pmf)
        rand = xp.where(at_leaf, rand, xp.clip(new_rand, 0.0, _RAND_CLAMP))

    # empty placeholder trees store tri = -1 at the root, so misses fall out
    return lt.tri[idx], pmf


def emitter_pmf(lt: LightTreeArrays, tri_ids, point):
    """Probability the descent would pick ``tri_ids`` from ``point``
    (ComputeDirectEmitterPMF, LightTree.cu:193-276), replayed bottom-up.

    tri_ids: (B,) global triangle ids; returns (B,) pmf (0 for triangles
    not in the tree).
    """
    xp = _xp(point)
    leaf = lt.leaf_of_tri[xp.maximum(tri_ids, 0)]
    in_tree = (tri_ids >= 0) & (leaf >= 0)
    idx = xp.maximum(leaf, 0)
    pmf = xp.ones(point.shape[:-1], dtype=point.dtype)

    for _ in range(lt.max_depth):
        par = lt.parent[idx]
        valid = par >= 0
        par_c = xp.maximum(par, 0)
        p_left = _child_probs(lt, par_c, point)
        went_left = lt.left[par_c] == idx
        step = xp.where(went_left, p_left, 1.0 - p_left)
        pmf = pmf * xp.where(valid, step, 1.0)
        idx = xp.where(valid, par_c, idx)

    return xp.where(in_tree, pmf, 0.0)
