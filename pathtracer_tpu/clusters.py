"""Triangle clusters: the TPU-native large-scene acceleration structure.

The reference's hot path is per-ray BVH traversal with a private stack
(bvh.h:156-183 on the CPU, shader.h:153-193 per SIMT thread).  A private
stack per ray means every node fetch and every leaf-vertex load is a wide
gather — the slowest memory primitive on a TPU — so a faithful translation
runs four orders of magnitude below the machine's capability (measured in
round 1).  This module re-architects the acceleration structure for a
vector machine:

  * The SAH BVH (bvh.py, same tree as the reference) is CUT at subtrees of
    at most ``max_tris`` triangles.  Each cut subtree becomes a CLUSTER:
    an AABB plus a contiguous range of triangles.  Clusters inherit the
    SAH tree's spatial quality and are emitted in DFS order, so nearby
    clusters are nearby in index space.
  * Triangle data is PACKED cluster-contiguously into one flat array in
    Möller–Trumbore-ready form [v1, e1, e2], so the device kernel reads
    triangles with *sequential scalar loads*, never gathers.
  * Culling granularity becomes (ray-tile x cluster) instead of
    (ray x node): a whole tile of rays tests a cluster's AABB densely on
    the VPU, and descends into its triangles only if SOME ray wants it —
    the vector analog of SIMT ballot, at a granularity the VPU is actually
    good at.  See ops/pallas/cluster_kernel.py for the traversal itself.

The cluster cut is equivalent to a BVH whose internal levels below the cut
are flattened into leaves: every triangle is in exactly one cluster, and a
ray that misses every cluster AABB provably misses the scene.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import FlatBVH, build_bvh
from .scene import Scene

DEFAULT_CLUSTER_TRIS = 64   # cut size; swept on hardware (see bench_bvh.py)
PACK_PAD = 8                # inner-loop unroll width the kernel may overrun by


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ClusterSet:
    """Device-ready cluster arrays.

    tri_data: (P, 9) f32 packed [v1, e1=v2-v1, e2=v3-v1] rows in cluster
        order; the tail is PACK_PAD degenerate rows (zeros) so the kernel's
        unrolled inner loop may safely overrun any cluster's range.
    tid_map: (P,) i32 original scene triangle index per packed row
        (-1 on padding rows).
    start:   (C,) i32 packed row offset of each cluster.
    count:   (C,) i32 triangle count of each cluster.
    bounds:  (C, 8) f32 [lb(3), rt(3), pad, pad] cluster AABBs.
    num_clusters / max_count: static Python ints.
    """

    tri_data: jnp.ndarray
    tid_map: jnp.ndarray
    start: jnp.ndarray
    count: jnp.ndarray
    bounds: jnp.ndarray
    num_clusters: int
    max_count: int

    def tree_flatten(self):
        return (
            (self.tri_data, self.tid_map, self.start, self.count,
             self.bounds),
            (self.num_clusters, self.max_count),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, num_clusters=aux[0], max_count=aux[1])

    @property
    def centers(self) -> jnp.ndarray:
        """(C, 3) cluster AABB centers (for front-to-back visit ordering)."""
        return 0.5 * (self.bounds[:, 0:3] + self.bounds[:, 3:6])

    @property
    def scene_bounds(self):
        """(lb, rt) of the whole scene (union of cluster boxes)."""
        return (self.bounds[:, 0:3].min(axis=0),
                self.bounds[:, 3:6].max(axis=0))


def build_clusters(
    scene: Scene,
    bvh: Optional[FlatBVH] = None,
    max_tris: int = DEFAULT_CLUSTER_TRIS,
) -> ClusterSet:
    """Cut the scene's SAH BVH into clusters of at most ``max_tris``.

    DFS from the root; a node is emitted as a cluster when its triangle
    range fits, otherwise both children are visited.  (A leaf larger than
    ``max_tris`` is still emitted whole — the builder's SAH termination
    makes such leaves rare; ``max_count`` reports the realized bound.)
    """
    if bvh is None:
        bvh = build_bvh(scene)
    n = scene.num_tris
    host = getattr(bvh, "_host", None)
    if host is not None:  # builder-attached host copies (no device fetch)
        lb_arr, rt_arr, left, right, s_arr, e_arr, tri_idx = host
    else:
        left = np.asarray(bvh.left)
        right = np.asarray(bvh.right)
        s_arr = np.asarray(bvh.tri_start)
        e_arr = np.asarray(bvh.tri_end)
        lb_arr = np.asarray(bvh.lb)
        rt_arr = np.asarray(bvh.rt)
        tri_idx = np.asarray(bvh.tri_idx)

    ranges = []  # (start, end, node) inclusive, in DFS order
    stack = [0]
    while stack:
        ni = stack.pop()
        cnt = int(e_arr[ni]) - int(s_arr[ni]) + 1
        if left[ni] == -1 or cnt <= max_tris:
            ranges.append((int(s_arr[ni]), int(e_arr[ni]), ni))
        else:
            # push right first so the left child is processed first (DFS)
            stack.append(int(right[ni]))
            stack.append(int(left[ni]))

    C = len(ranges)
    v1, v2, v3 = scene.host_verts()

    starts = np.zeros(C, np.int32)
    counts = np.zeros(C, np.int32)
    bounds = np.zeros((C, 8), np.float32)
    tid_chunks = []
    pos = 0
    for ci, (s, e, ni) in enumerate(ranges):
        ids = tri_idx[s : e + 1]
        starts[ci] = pos
        counts[ci] = ids.size
        bounds[ci, 0:3] = lb_arr[ni]
        bounds[ci, 3:6] = rt_arr[ni]
        tid_chunks.append(ids)
        pos += ids.size
    assert pos == n, (pos, n)

    tid_map = np.concatenate(
        tid_chunks + [np.full(PACK_PAD, -1, np.int32)]).astype(np.int32)
    order = tid_map[:n]
    tri_data = np.zeros((n + PACK_PAD, 9), np.float32)
    tri_data[:n, 0:3] = v1[order]
    tri_data[:n, 3:6] = v2[order] - v1[order]
    tri_data[:n, 6:9] = v3[order] - v1[order]

    return ClusterSet(
        tri_data=jnp.asarray(tri_data),
        tid_map=jnp.asarray(tid_map),
        start=jnp.asarray(starts),
        count=jnp.asarray(counts),
        bounds=jnp.asarray(bounds),
        num_clusters=C,
        max_count=int(counts.max()) if C else 0,
    )
