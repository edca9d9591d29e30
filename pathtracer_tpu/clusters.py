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


# ---------------------------------------------------------------------------
# Two-level beam acceleration structure (ops/pallas/beam_kernel.py)
# ---------------------------------------------------------------------------

BEAM_CTRIS = 8         # triangles per cluster (padded exactly to this;
                       # swept on v5e: 8 > 16 > 32 at 256-tri superclusters)
BEAM_SC_TRIS = 128     # supercluster cut size (auto-doubled until the
                       # supercluster count fits the kernel cap)
BEAM_BLOCK = 8         # kernel tri-block width; BEAM_CTRIS % BEAM_BLOCK == 0
MAX_BEAM_MATERIALS = 64   # above this the builder inlines materials into
                          # the packed triangle rows (beam_kernel reads
                          # color/pack per-tri instead of a table loop)
MAX_SC_CLUSTERS = 2040    # per-supercluster cluster cap: one positional
                          # bit-plane chunk (16x128 slots, 8-aligned)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BeamAccel:
    """Device arrays for the scalar-scheduled beam kernel.

    The SAH BVH (same tree as the reference, bvh.h:79-155) is cut twice:
    at <= sc_tris into S SUPERCLUSTERS, and each supercluster's subtree at
    <= ctris into CLUSTERS.  Clusters are padded to exactly ``ctris``
    packed triangle rows (degenerate padding rows are rejected by the
    |det| < EPS test, triangle.h:25-44), so cluster c owns rows
    [c*ctris, (c+1)*ctris) — the scalar scheduler emits plain cluster ids
    as work units, no offset tables needed.

    tri_cols: (P, 16) f32 rows [v1(3), e1(3), e2(3), mat_id, N(3), pad(3)]
        where N = e1 x e2 (unnormalized geometric normal, triangle.h:45-49)
        and mat_id indexes ``mats``.
    tid_map:  (P,) i32 original triangle id per row (-1 padding).
    cl_bounds: (C, 8) f32 [lb(3), rt(3), pad(2)] cluster AABBs.
    sc_bounds: (S, 8) f32 supercluster AABBs.
    sc_first/sc_ncl: (S,) i32 first cluster id / cluster count.
    sc_order: (8, S) i32 per-octant front-to-back supercluster visit order
        (ascending projection of the box center on the octant diagonal).
    mats: (M, 8) f32 packed material table [color(3), rough, flags, pad(3)]
        with color = emit_color for EMIT else albedo, flags 2/1/0 for
        EMIT/SPECULAR/DIFFUSE (the trace_kernel packing).
    """

    tri_cols: jnp.ndarray
    tid_map: jnp.ndarray
    cl_bounds: jnp.ndarray
    sc_bounds: jnp.ndarray
    sc_first: jnp.ndarray
    sc_ncl: jnp.ndarray
    sc_order: jnp.ndarray
    mats: jnp.ndarray
    num_clusters: int
    num_superclusters: int
    num_materials: int
    ctris: int
    mats_inline: bool = False

    def tree_flatten(self):
        return (
            (self.tri_cols, self.tid_map, self.cl_bounds, self.sc_bounds,
             self.sc_first, self.sc_ncl, self.sc_order, self.mats),
            (self.num_clusters, self.num_superclusters, self.num_materials,
             self.ctris, self.mats_inline),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, num_clusters=aux[0], num_superclusters=aux[1],
                   num_materials=aux[2], ctris=aux[3],
                   mats_inline=aux[4] if len(aux) > 4 else False)

    @property
    def scene_bounds(self):
        return (self.sc_bounds[:, 0:3].min(axis=0),
                self.sc_bounds[:, 3:6].max(axis=0))


def build_beam_accel(
    scene: Scene,
    bvh: Optional[FlatBVH] = None,
    ctris: int = BEAM_CTRIS,
    sc_tris: Optional[int] = None,
) -> BeamAccel:
    """Cut the SAH BVH into (supercluster, cluster) levels for the beam
    kernel.  Leaves bigger than the cut sizes (rare; SAH termination) are
    split by centroid median so the padding invariant holds.

    ``sc_tris=None`` auto-sizes the supercluster cut: starting from
    BEAM_SC_TRIS it doubles until the supercluster count fits the
    kernel's supercluster capacity (1008) — this keeps the structure
    size-unbounded (100k+ triangles) without a third hierarchy level;
    the cluster level is unbounded by construction (the kernel sweeps
    clusters through positional bit-plane chunks)."""
    from . import materials as mat

    assert ctris % 4 == 0 and (ctris % PACK_PAD == 0 or ctris == 4)
    if bvh is None:
        bvh = build_bvh(scene)
    host = getattr(bvh, "_host", None)
    if host is not None:
        lb_arr, rt_arr, left, right, s_arr, e_arr, tri_idx = host
    else:
        left = np.asarray(bvh.left)
        right = np.asarray(bvh.right)
        s_arr = np.asarray(bvh.tri_start)
        e_arr = np.asarray(bvh.tri_end)
        lb_arr = np.asarray(bvh.lb)
        rt_arr = np.asarray(bvh.rt)
        tri_idx = np.asarray(bvh.tri_idx)

    v1, v2, v3 = scene.host_verts()
    cent = (v1 + v2 + v3) / 3.0

    def cut(node, limit):
        """Subtree ranges of <= limit tris, DFS order: [(s, e, node)]."""
        out = []
        stack = [node]
        while stack:
            ni = stack.pop()
            cnt = int(e_arr[ni]) - int(s_arr[ni]) + 1
            if left[ni] == -1 or cnt <= limit:
                out.append((int(s_arr[ni]), int(e_arr[ni]), ni))
            else:
                stack.append(int(right[ni]))
                stack.append(int(left[ni]))
        return out

    def split_range(ids, limit):
        """Split an oversized leaf range by centroid median (longest
        axis) until every chunk fits ``limit``."""
        if ids.size <= limit:
            return [ids]
        c = cent[ids]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        order = np.argsort(c[:, axis], kind="stable")
        half = ids.size // 2
        return (split_range(ids[order[:half]], limit)
                + split_range(ids[order[half:]], limit))

    # Supercluster ranges, then cluster ranges within each.  The
    # The supercluster cut auto-coarsens until it fits the kernel's
    # MAX_BEAM_SC (1008 since round 4: a ~100k-tri scene keeps a fine
    # ~256-tri first-level cut instead of coarsening to 2048-tri
    # superclusters whose clusters flood the positional sweep).
    if sc_tris is None:
        from .ops.pallas.beam_kernel import MAX_BEAM_SC
        sc_tris = BEAM_SC_TRIS
        while len(cut(0, sc_tris)) > MAX_BEAM_SC:
            sc_tris *= 2
    sc_ranges = cut(0, sc_tris)
    sc_first, sc_ncl, sc_bounds = [], [], []
    cl_tid_chunks, cl_bounds = [], []
    for (s, e, ni) in sc_ranges:
        sc_first.append(len(cl_tid_chunks))
        if left[ni] == -1 and e - s + 1 > sc_tris:
            chunks = split_range(tri_idx[s : e + 1].copy(), ctris)
        else:
            chunks = []
            for (cs, ce, cn) in cut(ni, ctris):
                ids = tri_idx[cs : ce + 1].copy()
                chunks.extend(split_range(ids, ctris))
        lo = np.full(3, np.inf)
        hi = np.full(3, -np.inf)
        for ids in chunks:
            pts = np.concatenate([v1[ids], v2[ids], v3[ids]], axis=0)
            clo, chi = pts.min(0), pts.max(0)
            cl_tid_chunks.append(ids)
            cl_bounds.append(np.concatenate([clo, chi, [0, 0]]))
            lo = np.minimum(lo, clo)
            hi = np.maximum(hi, chi)
        sc_ncl.append(len(cl_tid_chunks) - sc_first[-1])
        sc_bounds.append(np.concatenate([lo, hi, [0, 0]]))

    C = len(cl_tid_chunks)
    S = len(sc_ranges)
    assert sum(len(ids) for ids in cl_tid_chunks) == scene.num_tris
    if max(sc_ncl) > MAX_SC_CLUSTERS:
        raise ValueError(
            f"a supercluster holds {max(sc_ncl)} clusters "
            f"(> {MAX_SC_CLUSTERS}, one positional bit-plane chunk); "
            f"raise ctris (scene has {scene.num_tris} tris at "
            f"ctris={ctris}, sc_tris={sc_tris})")

    # Material dedup -> packed table (trace_kernel._packed_table rules).
    mtype, albedo, emit, rough = scene.host_materials()
    if np.any((mtype != mat.EMIT) & (np.abs(emit).sum(-1) > 0)):
        raise ValueError(
            "scene has a non-EMIT material with nonzero emission; the "
            "packed beam kernel cannot represent it — use backend='brute'")
    keys = {}
    mat_id = np.zeros(scene.num_tris, np.int32)
    rows = []
    for i in range(scene.num_tris):
        key = (int(mtype[i]), tuple(np.round(albedo[i], 7)),
               tuple(np.round(emit[i], 7)), round(float(rough[i]), 7))
        if key not in keys:
            color = emit[i] if mtype[i] == mat.EMIT else albedo[i]
            flag = (2.0 if mtype[i] == mat.EMIT
                    else 1.0 if mtype[i] == mat.SPECULAR else 0.0)
            keys[key] = len(rows)
            rows.append(np.concatenate(
                [color, [rough[i], flag, 0, 0, 0]]).astype(np.float32))
        mat_id[i] = keys[key]
    M = len(rows)
    mat_rows = np.stack(rows)
    # Scenes with more unique materials than the kernel's shade-table
    # loop can afford switch to INLINE materials: color lands in triangle
    # columns 13:16 and column 9 packs flags*8 + roughness (flags in
    # {0,1,2}, roughness in [0,1] — exactly recoverable); the kernel then
    # selects material data in the run engine instead of looping the
    # table.  This removes the old 64-material cliff entirely.
    mats_inline = M > MAX_BEAM_MATERIALS

    # Packed triangle rows, cluster-padded to exactly ctris.
    # one extra all-degenerate SENTINEL cluster (id C): the kernel's
    # pair-unrolled run loop pads odd-length run lists with it; its rows
    # are rejected by the |det| < EPS test.
    P = (C + 1) * ctris
    tri_cols = np.zeros((P, 16), np.float32)
    tid_map = np.full(P, -1, np.int32)
    for ci, ids in enumerate(cl_tid_chunks):
        r0 = ci * ctris
        n = ids.size
        tri_cols[r0 : r0 + n, 0:3] = v1[ids]
        e1 = v2[ids] - v1[ids]
        e2 = v3[ids] - v1[ids]
        tri_cols[r0 : r0 + n, 3:6] = e1
        tri_cols[r0 : r0 + n, 6:9] = e2
        if mats_inline:
            mr = mat_rows[mat_id[ids]]
            tri_cols[r0 : r0 + n, 9] = mr[:, 4] * 8.0 + mr[:, 3]
            tri_cols[r0 : r0 + n, 13:16] = mr[:, 0:3]
        else:
            tri_cols[r0 : r0 + n, 9] = mat_id[ids]
        tri_cols[r0 : r0 + n, 10:13] = np.cross(e1, e2)
        tid_map[r0 : r0 + n] = ids

    # Pad both bounds arrays to an 8-multiple with INVERTED never-hit
    # boxes (lb=+INF > rt=-INF -> tmin > tmax in any slab test): the
    # kernel sweeps boxes in 8-aligned groups and may read past the ends.
    def pad8(arr):
        arr = np.asarray(arr, np.float32).reshape(-1, 8)
        padrow = np.array([[3e38, 3e38, 3e38, -3e38, -3e38, -3e38, 0, 0]],
                          np.float32)
        k = (-len(arr)) % 8 + 8
        return np.concatenate([arr, np.repeat(padrow, k, 0)], axis=0)

    cl_bounds = pad8(cl_bounds)

    # Per-octant front-to-back supercluster orders.
    sc_bounds = np.asarray(sc_bounds, np.float32)
    centers = 0.5 * (sc_bounds[:, 0:3] + sc_bounds[:, 3:6])
    order = np.zeros((8, S), np.int32)
    for o in range(8):
        sign = np.array([1 if o & 1 else -1, 1 if o & 2 else -1,
                         1 if o & 4 else -1], np.float32)
        order[o] = np.argsort(centers @ sign, kind="stable")

    return BeamAccel(
        tri_cols=jnp.asarray(tri_cols),
        tid_map=jnp.asarray(tid_map),
        cl_bounds=jnp.asarray(cl_bounds),
        sc_bounds=jnp.asarray(pad8(sc_bounds)),
        sc_first=jnp.asarray(np.asarray(sc_first, np.int32)),
        sc_ncl=jnp.asarray(np.asarray(sc_ncl, np.int32)),
        sc_order=jnp.asarray(order),
        mats=jnp.asarray(mat_rows[:MAX_BEAM_MATERIALS]),
        num_clusters=C,
        num_superclusters=S,
        num_materials=min(M, MAX_BEAM_MATERIALS),
        ctris=ctris,
        mats_inline=mats_inline,
    )
