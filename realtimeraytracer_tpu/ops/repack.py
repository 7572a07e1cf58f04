"""Build-time SAH re-packing of the sorted triangle order into tight
32-triangle subcluster groups for the v9 quarter kernel.

The traversal kernels chop the BVH-sorted triangle order into consecutive
32-triangle subclusters (pallas_backend.pack_clusters_np).  Those cuts are
arbitrary: a subcluster straddling a spatial break carries a fat AABB that
passes the cull for rays that need none of its triangles.  Measured at
1080p/100k (r5 probe 090): the v9 kernel tests 19.7 subclusters/tile while
the per-ray-exact set is ~8 — and simply re-aligning the cuts removes a
third of the gap.

This module re-partitions the SORTED order (order is preserved — only the
cut points move) into consecutive groups of size [min_size, 32] by dynamic
programming, minimizing the summed AABB half-areas of the groups.  The
objective self-balances: splitting adds interior surface (cost), while
fusing spatially separated runs inflates the union box (cost); `lam` adds
a per-group penalty (in units of the median full-window area) discouraging
gratuitous splits whose pad lanes dilute 32-lane visits.  Groups smaller
than 32 pad to the 32-lane boundary with degenerate triangles collapsed to
their group's AABB center: zero area (no intersection can pass) and no box
inflation.

Because padding only SHIFTS positions, sorted_id = slot_id - pads_before
(group(slot)) — a per-group offset table the kernel reads from SMEM, so
v9 emits ids in the ORIGINAL sorted space and no consumer changes.

Measured (v5e, 1080p/100k primaries, min_size=28 lam=1.0): 19.7 -> 14.2
subclusters/tile, 50.0 -> 40.7 ms, bit-identical t checksum.  The v8
kernel visits whole 128-lane panels, where the ~3.5% pad dilution cancels
the tighter boxes (area-shadow occlusion measured 82.6 -> 85.5 ms), so v8
keeps the pad-free panels and only v9 consumes these.

Capability parity: the quality knob of the reference driver's
PREFER_FAST_TRACE acceleration-structure build
(/root/reference/src/vulkan/raytracing/blas.cppm:115) — geometry layout
optimized offline so per-ray traversal touches less of it.
"""

from __future__ import annotations

import numpy as np

GROUP = 32


def repack_slots_np(tmin: np.ndarray, tmax: np.ndarray,
                    min_size: int = 28, lam: float = 1.0):
    """DP re-partition of the sorted order into [min_size, 32]-sized
    consecutive groups minimizing summed AABB half-areas.

    tmin/tmax: (T, 3) per-triangle AABBs in sorted order.
    Returns (slots, n_groups): slots (n_groups*32,) int64 maps repacked
    slot -> sorted index, -1 for pad slots.  Relative order is preserved.
    """
    t = tmin.shape[0]
    if t == 0:
        return np.zeros((0,), np.int64), 0
    # hsa[s][i] = half-surface-area of the AABB of tris [i, i+s)
    hsa = np.full((GROUP + 1, t), np.inf)
    wmin = tmin.astype(np.float64).copy()
    wmax = tmax.astype(np.float64).copy()
    d = wmax - wmin
    hsa[1, :] = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
    for s in range(2, GROUP + 1):
        wmin = np.minimum(wmin[:-1], tmin[s - 1:])
        wmax = np.maximum(wmax[:-1], tmax[s - 1:])
        d = wmax - wmin
        hsa[s, :t - s + 1] = (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                              + d[:, 2] * d[:, 0])
    full = hsa[GROUP, :t - GROUP + 1]
    lam_abs = lam * (np.median(full) if full.size else 0.0)

    cost = np.full(t + 1, np.inf)
    choice = np.zeros(t + 1, np.int32)
    cost[0] = 0.0
    sizes = range(min_size, GROUP + 1)
    for e in range(1, t + 1):
        best = np.inf
        bs = 0
        for s in sizes:
            if s <= e:
                c = cost[e - s] + hsa[s, e - s]
                if c < best:
                    best = c
                    bs = s
        if e < min_size:           # only reachable as the very first group
            best = hsa[e, 0]
            bs = e
        cost[e] = best + lam_abs
        choice[e] = bs

    groups = []
    e = t
    while e > 0:
        s = int(choice[e])
        groups.append((e - s, e))
        e -= s
    groups.reverse()
    slots = np.full(len(groups) * GROUP, -1, np.int64)
    for gi, (s, e) in enumerate(groups):
        slots[gi * GROUP: gi * GROUP + (e - s)] = np.arange(s, e)
    return slots, len(groups)


def build_q_panels_np(v0s: np.ndarray, v1s: np.ndarray, v2s: np.ndarray,
                      min_size: int = 28, lam: float = 1.0):
    """Repacked v9 coefficient panels + cull AABBs + id-offset table.

    v0s/v1s/v2s: (T, 3) sorted triangle vertices.  Returns (coeff,
    cl_min, cl_max, group_off, slots): the pack_clusters_np layout over
    the repacked order, plus group_off (CBn*4,) int32 = number of pad
    slots before each 32-lane group, so sorted_id = slot_id -
    group_off[slot // 32].  Pad groups past the last real group carry the
    total pad count (they can never win a visit).  slots (ng*32,) int64
    maps repacked slot -> sorted id (-1 for pad lanes) — consumers align
    per-triangle side tables (e.g. ops/alpha_mask.py) to the panels.
    """
    from realtimeraytracer_tpu.render.pallas_backend import (
        CB,
        pack_clusters_np,
    )

    tmin = np.minimum(np.minimum(v0s, v1s), v2s)
    tmax = np.maximum(np.maximum(v0s, v1s), v2s)
    slots, ng = repack_slots_np(tmin, tmax, min_size, lam)
    pad = slots < 0
    idx = np.where(pad, 0, slots)
    rv0 = v0s[idx].astype(np.float32)
    rv1 = v1s[idx].astype(np.float32)
    rv2 = v2s[idx].astype(np.float32)
    # Degenerate pads at their group's AABB center: zero area (the
    # Baldwin-Weber denominator vanishes, no hit can pass) and inside the
    # group box (no cull inflation).
    g = np.arange(len(slots)) // GROUP
    gmin = np.full((ng, 3), np.inf)
    gmax = np.full((ng, 3), -np.inf)
    if (~pad).any():
        np.minimum.at(gmin, g[~pad], tmin[slots[~pad]])
        np.maximum.at(gmax, g[~pad], tmax[slots[~pad]])
    if pad.any():
        c = (((gmin + gmax) * 0.5)[g[pad]]).astype(np.float32)
        rv0[pad] = c
        rv1[pad] = c
        rv2[pad] = c
    coeff, cl_min, cl_max = pack_clusters_np(rv0, rv1, rv2)

    # pads-before-group: slot - group_off[slot // 32] = sorted id.
    pads_in_group = np.bincount(g[pad], minlength=ng)
    group_off = np.zeros(ng, np.int64)
    group_off[1:] = np.cumsum(pads_in_group)[:-1]
    total_groups = coeff.shape[0] * (CB // GROUP)
    if total_groups > ng:
        group_off = np.concatenate([
            group_off,
            np.full(total_groups - ng, int(pads_in_group.sum()), np.int64),
        ])
    return coeff, cl_min, cl_max, group_off.astype(np.int32), slots
