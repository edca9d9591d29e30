"""Host-side SAH BVH builder producing flat, pointer-free device arrays.

Reimplements the reference build (bvh.h:79-155) — full-sweep surface-area
-heuristic splits over every centroid candidate on every axis, compared
against the no-split cost ``tri_count * node_area`` — but with an
O(n log n) sorted prefix-scan sweep per node instead of the reference's
O(n^2) candidate x scan loop.  The candidate set and cost function are
identical (every distinct centroid value, cost = left_cnt*left_area +
right_cnt*right_area with "area" = HALF surface area, aabb.h:34-39), so the
chosen splits match the reference's; only tie-breaking among equal-cost
splits may differ.

The output is exactly the serialized scene format the reference GPU already
consumes (shader.h:76-79): a flat node array (aabb lb/rt, left/right child
indices, tri_start/tri_end leaf ranges; leaf iff left == right == -1) plus
the triangle permutation ``tri_idx``.  Build is offline host work (numpy);
traversal is the hot path and lives in ``ops/intersect.intersect_bvh`` and
the Pallas kernels.

An optional native C++ builder (``native/bvh_builder.cc``) accelerates
builds for OBJ-scale scenes; this module transparently uses it when the
shared library has been compiled, with numpy as the always-available
fallback.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .scene import Scene


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FlatBVH:
    """Flat BVH arrays (device-ready). Leaf iff left == right == -1."""
    lb: jnp.ndarray         # (M, 3) node box lower corner
    rt: jnp.ndarray         # (M, 3) node box upper corner
    left: jnp.ndarray       # (M,) int32 child index or -1
    right: jnp.ndarray      # (M,) int32
    tri_start: jnp.ndarray  # (M,) int32 inclusive range into tri_idx
    tri_end: jnp.ndarray    # (M,) int32 inclusive
    tri_idx: jnp.ndarray    # (T,) int32 permutation of triangle ids
    max_leaf: int           # static: max triangles in any leaf
    depth: int              # static: max tree depth (root = 1)

    def tree_flatten(self):
        return (
            (self.lb, self.rt, self.left, self.right,
             self.tri_start, self.tri_end, self.tri_idx),
            (self.max_leaf, self.depth),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, max_leaf=aux[0], depth=aux[1])

    @property
    def num_nodes(self) -> int:
        return int(self.left.shape[0])

    def stack_size(self) -> int:
        """Safe per-ray traversal stack capacity (DFS holds <= depth+1)."""
        return self.depth + 2


def _half_area(lb: np.ndarray, rt: np.ndarray) -> np.ndarray:
    """Half surface area of boxes, 0 for invalid boxes (aabb.h:34-39)."""
    d = rt - lb
    a = d[..., 0] * d[..., 1] + d[..., 0] * d[..., 2] + d[..., 1] * d[..., 2]
    valid = np.all(lb <= rt, axis=-1)
    return np.where(valid, a, 0.0)


def _best_split(centroids, tri_lb, tri_rt, idx):
    """Full-sweep SAH over one node's triangle set.

    Returns (axis, pos, cost) of the cheapest split, or (-1, 0, inf) if no
    candidate splits both sides non-empty — the same contract as
    BVH::find_best_axis (bvh.h:48-78), computed via sorted prefix scans.
    """
    m = idx.shape[0]
    best_axis, best_pos, best_cost = -1, 0.0, np.inf
    for axis in range(3):
        c = centroids[idx, axis]
        order = np.argsort(c, kind="stable")
        cs = c[order]
        lb_s = tri_lb[idx][order]
        rt_s = tri_rt[idx][order]

        # Prefix (left side) and suffix (right side) merged boxes.
        pre_lb = np.minimum.accumulate(lb_s, axis=0)
        pre_rt = np.maximum.accumulate(rt_s, axis=0)
        suf_lb = np.minimum.accumulate(lb_s[::-1], axis=0)[::-1]
        suf_rt = np.maximum.accumulate(rt_s[::-1], axis=0)[::-1]

        # Candidate split at sorted position k means pos = cs[k] and
        # left = {c < pos} = the first k sorted entries; only positions
        # where the value strictly increases are distinct candidates.
        ks = np.nonzero(cs[1:] > cs[:-1])[0] + 1  # k in [1, m-1]
        if ks.size == 0:
            continue
        left_area = _half_area(pre_lb[ks - 1], pre_rt[ks - 1])
        right_area = _half_area(suf_lb[ks], suf_rt[ks])
        costs = ks * left_area + (m - ks) * right_area
        j = int(np.argmin(costs))
        if costs[j] < best_cost:
            best_cost = float(costs[j])
            best_axis = axis
            best_pos = float(cs[ks[j]])
    return best_axis, best_pos, best_cost


def build_bvh(scene: Scene, use_native: Optional[bool] = None) -> FlatBVH:
    """Build the SAH BVH for a scene's (unpadded) triangles.

    Node appending order: children are allocated contiguously
    (left = len(nodes), right = left + 1) exactly as bvh.h:142-152, so node
    counts obey M <= 2*T.
    """
    n = scene.num_tris
    v1, v2, v3 = scene.host_verts()
    tri_lb = np.minimum(np.minimum(v1, v2), v3)
    tri_rt = np.maximum(np.maximum(v1, v2), v3)
    centroids = (v1 + v2 + v3) / 3.0

    if use_native is None or use_native:
        try:
            from .utils import native as _native
            out = _native.build_bvh(tri_lb, tri_rt, centroids)
        except Exception:
            if use_native:
                raise
            out = None
        if out is not None:
            return _finalize(*out)

    tri_idx = np.arange(n, dtype=np.int32)
    # Node storage, grown by appends: [lb, rt, left, right, start, end]
    nodes_lb, nodes_rt = [], []
    nodes_l, nodes_r, nodes_s, nodes_e = [], [], [], []

    def push_node(start, end):
        nodes_lb.append(None)
        nodes_rt.append(None)
        nodes_l.append(-1)
        nodes_r.append(-1)
        nodes_s.append(start)
        nodes_e.append(end)
        return len(nodes_l) - 1

    push_node(0, n - 1)
    stack = [0]
    while stack:
        ni = stack.pop()
        s, e = nodes_s[ni], nodes_e[ni]
        rng = tri_idx[s : e + 1]
        node_lb = tri_lb[rng].min(axis=0)
        node_rt = tri_rt[rng].max(axis=0)
        nodes_lb[ni], nodes_rt[ni] = node_lb, node_rt

        m = e - s + 1
        axis, pos, cost = _best_split(centroids, tri_lb, tri_rt, rng)
        nosplit = m * float(_half_area(node_lb, node_rt))
        if axis == -1 or cost > nosplit:
            continue  # leaf

        is_left = centroids[rng, axis] < pos
        left_cnt = int(is_left.sum())
        if left_cnt == 0 or left_cnt == m:
            continue  # degenerate split -> leaf (bvh.h:137-140)
        # Stable partition (reference uses a two-pointer swap, bvh.h:124-135;
        # any permutation that separates the halves yields the same tree).
        tri_idx[s : e + 1] = np.concatenate([rng[is_left], rng[~is_left]])

        li = push_node(s, s + left_cnt - 1)
        ri = push_node(s + left_cnt, e)
        nodes_l[ni], nodes_r[ni] = li, ri
        stack.append(li)
        stack.append(ri)

    lb = np.stack(nodes_lb).astype(np.float32)
    rt = np.stack(nodes_rt).astype(np.float32)
    return _finalize(
        lb, rt,
        np.asarray(nodes_l, np.int32), np.asarray(nodes_r, np.int32),
        np.asarray(nodes_s, np.int32), np.asarray(nodes_e, np.int32),
        tri_idx,
    )


def _finalize(lb, rt, left, right, start, end, tri_idx) -> FlatBVH:
    leaf = left == -1
    max_leaf = int((end[leaf] - start[leaf] + 1).max())
    depth = _tree_depth(left, right)
    bvh = FlatBVH(
        lb=jnp.asarray(lb), rt=jnp.asarray(rt),
        left=jnp.asarray(left), right=jnp.asarray(right),
        tri_start=jnp.asarray(start), tri_end=jnp.asarray(end),
        tri_idx=jnp.asarray(tri_idx),
        max_leaf=max_leaf, depth=depth,
    )
    # Host copies for downstream host-side consumers (clusters.py): a
    # device->host fetch through the accelerator transport costs orders of
    # magnitude more than the arrays are worth.  Not a pytree child.
    object.__setattr__(bvh, "_host", (
        np.asarray(lb), np.asarray(rt), np.asarray(left),
        np.asarray(right), np.asarray(start), np.asarray(end),
        np.asarray(tri_idx)))
    return bvh


def _tree_depth(left: np.ndarray, right: np.ndarray) -> int:
    depth = 0
    stack = [(0, 1)]
    while stack:
        ni, d = stack.pop()
        depth = max(depth, d)
        if left[ni] != -1:
            stack.append((int(left[ni]), d + 1))
            stack.append((int(right[ni]), d + 1))
    return depth


def print_tree(bvh: FlatBVH, node: int = 0, depth: int = 0,
               label: str = "root") -> str:
    """Debug tree dump (analog of BVH::print, bvh.h:243-260)."""
    if node == -1:
        return ""
    lb = np.asarray(bvh.lb[node])
    rt = np.asarray(bvh.rt[node])
    leaf = int(bvh.left[node]) == -1
    line = (
        f"{node}:\t" + " | " * depth + (" +-" if depth else "")
        + f"{tuple(lb)} {tuple(rt)}"
        + (" leaf," if leaf else "")
        + f" tri: {int(bvh.tri_start[node])} -> {int(bvh.tri_end[node])}"
        + f" ({label})\n"
    )
    if not leaf:
        line += print_tree(bvh, int(bvh.left[node]), depth + 1, "left")
        line += print_tree(bvh, int(bvh.right[node]), depth + 1, "right")
    return line
