"""Aligned segment layout: 128-aligned block spans for real workloads.

The row-aligned matvec fast path (ops/blocks.py) needs every LD block to
start at a multiple of 128 with exclusive 128-row extents. Real loads are
contiguous genome windows but arbitrary lengths, and different cohorts
have different block boundaries. This module relays out the problem:

  * segment the genome at the union of all cohorts' block boundaries (and
    missing-run edges), so every cohort's block is a whole number of
    segments;
  * pad each segment up to a multiple of 128 layout slots (inert pads:
    zero eigenvector rows in the blocks, beta=0/SE=1 and an annotation
    sentinel in the per-SNP arrays — same machinery as mesh padding,
    parallel/padding.py);
  * blocks then occupy contiguous, 128-aligned, multiple-of-128-length
    layout spans in every cohort, so the fast path applies to all of them.

Numerics are exactly preserved: eigendecompositions are untouched, the
inserted rows are zero, and the original variant order is restored at
output time via the layout map. Worst-case inflation is 127 slots per
segment (~13% for 1000-SNP blocks).
"""
import numpy as np

from vilma_tpu.ops import blocks as blocks_mod
from vilma_tpu.ops import lowrank


def _block_ranges(ld):
    """Extract (start, stop, kept_indices, factor) per block from a
    PackedLD. Blocks may have HOLES (variants inside the genomic window
    that this cohort dropped — denylisted, mismatched, or missing
    sumstats): only ascending order and pairwise-disjoint [min, max+1)
    intervals are required. Returns None when intervals interleave (an
    arbitrary extract-file ordering), in which case alignment is
    skipped."""
    out = []
    for bk in ld.buckets:
        perm = np.asarray(bk.perm)
        u = np.asarray(bk.u)
        s = np.asarray(bk.s)
        d = np.asarray(bk.d)
        for b in range(perm.shape[0]):
            ix = perm[b][perm[b] < ld.n]
            if ix.size == 0:
                continue
            if ix.size > 1 and not np.all(np.diff(ix) > 0):
                return None
            r = int(np.sum(np.abs(u[b]).sum(axis=0) > 0))
            r = max(r, 1)
            f = lowrank.LowRankFactor(
                u=np.ascontiguousarray(u[b, :ix.size, :r]),
                s=s[b, :r].copy(), d=d[b, :ix.size].copy(),
                rank=int(np.sum(s[b, :r] > 0)) if s[b, :r].size else 0)
            out.append((int(ix[0]), int(ix[-1]) + 1, ix.copy(), f))
    out.sort(key=lambda t: t[0])
    for (a0, b0, _, _), (a1, _, _, _) in zip(out, out[1:]):
        if a1 < b0:
            return None        # interleaved intervals
    return out


def compute_layout(lds, n):
    """Build the genome->layout map.

    Returns (layout_map [n] int32, L, ok). ok=False when any cohort has
    non-contiguous blocks (caller should skip alignment)."""
    boundaries = {0, n}
    ranges_per_ld = []
    for ld in lds:
        ranges = _block_ranges(ld)
        if ranges is None:
            return None, None, False
        ranges_per_ld.append(ranges)
        for a, b, _, _ in ranges:
            boundaries.add(a)
            boundaries.add(b)
    cuts = np.array(sorted(boundaries), dtype=np.int64)
    layout_map = np.empty(n, dtype=np.int32)
    pos = 0
    for a, b in zip(cuts[:-1], cuts[1:]):
        seg = b - a
        layout_map[a:b] = pos + np.arange(seg)
        pos += int(-(-seg // 128) * 128)    # pad segment to multiple of 128
    return layout_map, pos, True


def relayout_ld(ld, layout_map, L, dtype=None):
    """Rebuild a PackedLD in layout coordinates (zero rows at pads)."""
    if dtype is None:
        dtype = np.asarray(ld.buckets[0].u).dtype if ld.buckets else np.float64
    ranges = _block_ranges(ld)
    factors, indices = [], []
    for a, b, ix, f in ranges:
        # the factor's kept rows scatter to their layout slots; holes
        # (dropped variants inside the window) and pads stay zero rows,
        # which is exactly the "missing for this cohort" semantics
        new_ix = layout_map[ix]
        span_start = int(layout_map[a])
        span_len = int(new_ix[-1]) + 1 - span_start
        span_len = int(-(-span_len // 128) * 128)
        u_span = np.zeros((span_len, f.u.shape[1]), dtype=f.u.dtype)
        d_span = np.zeros(span_len, dtype=f.d.dtype)
        rel = new_ix - span_start
        u_span[rel] = f.u
        d_span[rel] = f.d
        factors.append(lowrank.LowRankFactor(u=u_span, s=f.s, d=d_span,
                                             rank=f.rank))
        indices.append(np.arange(span_start, span_start + span_len,
                                 dtype=np.int32))
    out = blocks_mod.pack(factors, indices, L, dtype=dtype)
    if not out.row_aligned:
        raise AssertionError('aligned relayout failed to produce a '
                             'row-aligned PackedLD')
    return out


def relayout_rows(arr, layout_map, L, fill=0.0):
    """Scatter [P, n] (or [n]) genome-order rows into layout order."""
    arr = np.asarray(arr)
    if arr.ndim == 1:
        out = np.full(L, fill, dtype=arr.dtype)
        out[layout_map] = arr
        return out
    out = np.full(arr.shape[:-1] + (L,), fill, dtype=arr.dtype)
    out[..., layout_map] = arr
    return out


def relayout_annotations(one_hot, layout_map, L):
    """One-hot [n, A] -> [L, A] with all-zero rows at pads (the engine
    treats zero rows as the pad sentinel)."""
    one_hot = np.asarray(one_hot)
    out = np.zeros((L, one_hot.shape[1]), dtype=one_hot.dtype)
    out[layout_map] = one_hot
    return out
