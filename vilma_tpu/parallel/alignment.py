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


def _block_list(ld):
    """Per-block (kept_indices, bucket_idx, block_idx) for a PackedLD in
    MANIFEST order (by the packed `seq` offsets), with no ordering
    requirements on the indices. Touches only the (small) perm/seq
    arrays, never the factor payloads."""
    out = []
    for bi, bk in enumerate(ld.buckets):
        perm = np.asarray(bk.perm)
        seq = np.asarray(bk.seq)
        for b in range(perm.shape[0]):
            keep = perm[b] < ld.n
            ix = perm[b][keep]
            if ix.size == 0:
                continue
            out.append((int(seq[b][keep][0]), ix.copy(), bi, b))
    out.sort(key=lambda t: t[0])
    return [(ix, bi, b) for _, ix, bi, b in out]


def _block_intervals(ld):
    """Per-block (start, stop, kept_indices, bucket_idx, block_idx) for a
    PackedLD, sorted by start. Blocks may have HOLES (variants inside the
    genomic window that this cohort dropped — denylisted, mismatched, or
    missing sumstats): only ascending order and pairwise-disjoint
    [min, max+1) intervals are required. Returns None when intervals
    interleave (an arbitrary extract-file ordering) — `compute_layout`
    then takes the virtual-order route instead. Touches only the (small)
    perm arrays, never the factor payloads."""
    out = []
    for ix, bi, b in _block_list(ld):
        if ix.size > 1 and not np.all(np.diff(ix) > 0):
            return None
        out.append((int(ix[0]), int(ix[-1]) + 1, ix, bi, b))
    out.sort(key=lambda t: t[0])
    for (a0, b0, _, _, _), (a1, _, _, _, _) in zip(out, out[1:]):
        if a1 < b0:
            return None        # interleaved intervals
    return out


def topological_merge(chains, n):
    """Merge per-cohort total orders into one global 'virtual genome'
    order.

    chains: one sequence of variant indices per cohort — that cohort's
    covered variants in manifest order (blocks in schema order, rows in
    .var order). Each chain reflects the underlying genomic order, so a
    consistent merge exists whenever the schemas agree on the relative
    order of shared variants; the merge makes every cohort's blocks
    ascending, non-interleaved runs regardless of how the user's extract
    file permuted the variant list.

    Returns vpos [n] int32 (variant -> virtual position), or None when
    the chains genuinely conflict (no order satisfies all schemas —
    e.g. two panels built on different genome orders). Variants covered
    by no chain slot in smallest-index-first; after each emission the
    freshly-unlocked successors run depth-first, so chains come out as
    contiguous runs instead of interleaving with unrelated chains."""
    import heapq
    pairs = []
    for ch in chains:
        ch = np.asarray(ch, dtype=np.int64)
        if ch.size > 1:
            pairs.append(np.stack([ch[:-1], ch[1:]], axis=1))
    if pairs:
        # dedup: cohorts sharing a schema contribute identical edges,
        # which must count once in the indegrees
        edges = np.unique(np.concatenate(pairs, axis=0), axis=0)
    else:
        edges = np.empty((0, 2), dtype=np.int64)
    indeg = np.zeros(n, dtype=np.int64)
    np.add.at(indeg, edges[:, 1], 1)
    order_p = np.argsort(edges[:, 0], kind='stable')
    se = edges[order_p]
    starts = np.searchsorted(se[:, 0], np.arange(n + 1))
    succ = se[:, 1]
    heap = np.flatnonzero(indeg == 0).tolist()
    heapq.heapify(heap)
    vpos = np.full(n, -1, dtype=np.int64)
    pos = 0
    run = []
    while run or heap:
        v = run.pop() if run else heapq.heappop(heap)
        vpos[v] = pos
        pos += 1
        unlocked = []
        for e in range(starts[v], starts[v + 1]):
            w = int(succ[e])
            indeg[w] -= 1
            if indeg[w] == 0:
                unlocked.append(w)
        if unlocked:
            unlocked.sort(reverse=True)
            run.extend(unlocked)
    if pos != n:
        return None        # cycle: schemas disagree on variant order
    return vpos


def _block_factor(ld, bucket_idx, block_idx, num_rows):
    """Extract one block's factor (one payload slice at a time, so
    spill-backed loads never materialize more than a block in RAM)."""
    bk = ld.buckets[bucket_idx]
    u = np.asarray(bk.u[block_idx])
    s = np.asarray(bk.s[block_idx])
    d = np.asarray(bk.d[block_idx])
    r = max(int(np.sum(np.abs(u).sum(axis=0) > 0)), 1)
    return lowrank.LowRankFactor(
        u=np.ascontiguousarray(u[:num_rows, :r]),
        s=s[:r].copy(), d=d[:num_rows].copy(),
        rank=int(np.sum(s[:r] > 0)) if s[:r].size else 0)


def _seg_pad(a, b):
    return int(-(-(b - a) // 128) * 128)


def entry_intervals(entries):
    """[(start, stop)] genomic intervals of metadata-pass entries
    (io/load.matched_schema_entries dicts), or None when any block's kept
    indices are non-ascending or intervals interleave — the same
    eligibility rule `_block_intervals` applies to loaded PackedLDs.
    Callers then take the virtual-order route (`layout_via_virtual_order`
    on the same entries) instead of giving up."""
    out = []
    for e in entries:
        ix = np.asarray(e['idx'])
        if ix.size == 0:
            continue
        if ix.size > 1 and not np.all(np.diff(ix) > 0):
            return None
        out.append((int(ix[0]), int(ix[-1]) + 1))
    out.sort()
    for (a0, b0), (a1, _) in zip(out, out[1:]):
        if a1 < b0:
            return None
    return out


def layout_via_virtual_order(block_ix_lists, n, n_shards=1):
    """Genome->layout map for ARBITRARY variant orderings.

    block_ix_lists: one list per cohort of each block's kept variant
    indices, blocks in manifest order, rows in within-block (.var)
    order. The cohorts' manifest orders merge into a virtual genome
    order (`topological_merge`), every block becomes an ascending
    interval there, the ordinary interval layout plans the (optionally
    shard-local) 128-aligned spans, and the two maps compose. Returns
    (layout_map [n] int32, L, ok); ok=False only when the schemas
    genuinely conflict on the relative order of shared variants."""
    chains = []
    for blocks_ix in block_ix_lists:
        if blocks_ix:
            chains.append(np.concatenate(
                [np.asarray(ix, dtype=np.int64) for ix in blocks_ix]))
        else:
            chains.append(np.empty(0, dtype=np.int64))
    vpos = topological_merge(chains, n)
    if vpos is None:
        return None, None, False
    interval_lists = []
    for blocks_ix in block_ix_lists:
        ivals = []
        for ix in blocks_ix:
            vix = vpos[np.asarray(ix)]
            # ascending by construction (the chain runs through them)
            ivals.append((int(vix[0]), int(vix[-1]) + 1))
        ivals.sort()
        interval_lists.append(ivals)
    layout_v, L, ok = compute_layout_from_intervals(interval_lists, n,
                                                    n_shards=n_shards)
    if not ok:
        return None, None, False
    return layout_v[vpos].astype(np.int32), L, True


def block_span(layout_map, ix):
    """(span_start, span_len, rel) of one block's layout span.

    The block's kept genome indices `ix` map to layout slots
    `layout_map[ix]`; its span is the 128-padded contiguous layout range
    starting at the first slot, and `rel` are the kept rows' offsets
    within it. Shared by `relayout_ld` and the multi-process shard-local
    loader (parallel/distributed.py) so both produce identical packings."""
    new_ix = np.asarray(layout_map)[np.asarray(ix)]
    span_start = int(new_ix[0])
    span_len = int(new_ix[-1]) + 1 - span_start
    span_len = int(-(-span_len // 128) * 128)
    return span_start, span_len, new_ix - span_start


def compute_layout(lds, n, n_shards=1):
    """Build the genome->layout map from loaded PackedLDs.

    Contiguous genome windows (the common case) plan directly from block
    intervals; arbitrary orderings — an extract file not sorted in
    genome order interleaves every block's index range — route through
    the virtual genome order (`layout_via_virtual_order`), so alignment
    (and with n_shards > 1 the collective-free shard-local layout)
    applies to ANY valid schema. Returns (layout_map [n] int32, L, ok);
    ok=False only when schemas conflict on the order of shared
    variants."""
    interval_lists = []
    for ld in lds:
        ranges = _block_intervals(ld)
        if ranges is None:
            interval_lists = None
            break
        interval_lists.append([(a, b) for a, b, _, _, _ in ranges])
    if interval_lists is not None:
        return compute_layout_from_intervals(interval_lists, n,
                                             n_shards=n_shards)
    block_ix_lists = [[ix for ix, _, _ in _block_list(ld)] for ld in lds]
    return layout_via_virtual_order(block_ix_lists, n, n_shards=n_shards)


def compute_layout_from_intervals(interval_lists, n, n_shards=1):
    """Build the genome->layout map from per-cohort block intervals.

    interval_lists: one list of (start, stop) pairs per cohort (e.g. from
    `entry_intervals` on a metadata pass — no LD payloads needed).
    Returns (layout_map [n] int32, L, ok=True).

    With n_shards > 1 the layout is additionally SHARD-LOCAL: L divides
    into n_shards equal 128-multiple spans and no LD block (of any
    cohort) straddles a span boundary, so ops/blocks.pack(n_shards=...)
    can build the collective-free shard_map matvec. Shard boundaries may
    only fall between *block-connected components* (maximal runs of
    overlapping blocks across all cohorts); components are assigned to
    shards greedily in genome order, with uncovered (LD-missing) runs
    splittable anywhere, and every shard padded to the longest shard's
    span."""
    boundaries = {0, n}
    intervals = []
    for ranges in interval_lists:
        for a, b in ranges:
            boundaries.add(a)
            boundaries.add(b)
            intervals.append((a, b))
    cuts = np.array(sorted(boundaries), dtype=np.int64)
    segs = list(zip(cuts[:-1].tolist(), cuts[1:].tolist()))
    if n_shards <= 1:
        layout_map = np.empty(n, dtype=np.int32)
        pos = 0
        for a, b in segs:
            layout_map[a:b] = pos + np.arange(b - a)
            pos += _seg_pad(a, b)
        return layout_map, pos, True

    # block-connected components: the atomic units a shard must own whole
    intervals.sort()
    comps = []
    cur = None
    for a, b in intervals:
        if cur is None or a >= cur[1]:
            if cur is not None:
                comps.append(tuple(cur))
            cur = [a, b]
        else:
            cur[1] = max(cur[1], b)
    if cur is not None:
        comps.append(tuple(cur))

    # units in genome order: ('atom', segments-of-one-component) or
    # ('gap', one uncovered segment — splittable anywhere)
    units = []
    ci = 0
    for a, b in segs:
        while ci < len(comps) and comps[ci][1] <= a:
            ci += 1
        if ci < len(comps) and comps[ci][0] <= a < comps[ci][1]:
            if units and units[-1][0] == 'atom' and units[-1][2] == ci:
                units[-1][1].append((a, b))
            else:
                units.append(('atom', [(a, b)], ci))
        else:
            units.append(('gap', [(a, b)], None))

    total = sum(_seg_pad(a, b) for a, b in segs)
    target = _seg_pad(0, -(-total // n_shards))   # per-shard goal, 128-mult
    shards = [[] for _ in range(n_shards)]      # (a, b) pieces per shard
    fills = [0] * n_shards
    s = 0
    for kind, pieces, _ in units:
        if kind == 'atom':
            usize = sum(_seg_pad(a, b) for a, b in pieces)
            if s < n_shards - 1 and fills[s] > 0 \
                    and fills[s] + usize > target:
                s += 1
            shards[s].extend(pieces)
            fills[s] += usize
            continue
        a, b = pieces[0]
        while a < b:
            if s < n_shards - 1 and fills[s] >= target:
                s += 1
            if s == n_shards - 1:
                shards[s].append((a, b))
                fills[s] += _seg_pad(a, b)
                break
            take = min(b - a, target - fills[s])   # room is a 128 multiple
            shards[s].append((a, a + take))
            fills[s] += _seg_pad(a, a + take)
            a += take
    shard_rows = max(max(fills), 128)
    layout_map = np.empty(n, dtype=np.int32)
    for s, pieces in enumerate(shards):
        pos = s * shard_rows
        for a, b in pieces:
            layout_map[a:b] = pos + np.arange(b - a)
            pos += _seg_pad(a, b)
    return layout_map, n_shards * shard_rows, True


def relayout_ld(ld, layout_map, L, dtype=None, spill=None,
                u_dtype=None, n_shards=1):
    """Rebuild a PackedLD in layout coordinates (zero rows at pads).

    spill: optional blocks.FactorSpill — relayouted factor payloads then
    stage through disk (one block in RAM at a time) and the repacked
    bucket tensors assemble into disk-backed memmaps, preserving
    --mmap's bounded-host-RAM contract through the relayout.

    n_shards: pass the compute_layout(n_shards=...) value to produce a
    shard-local PackedLD (blocks.pack docstring)."""
    if dtype is None:
        dtype = np.asarray(ld.buckets[0].u[:1]).dtype if ld.buckets \
            else np.float64
    factors, indices = [], []
    for ix, bucket_idx, block_idx in _block_list(ld):
        f = _block_factor(ld, bucket_idx, block_idx, ix.size)
        # the factor's kept rows scatter to their layout slots; holes
        # (dropped variants inside the window) and pads stay zero rows,
        # which is exactly the "missing for this cohort" semantics
        span_start, span_len, rel = block_span(layout_map, ix)
        u_span = np.zeros((span_len, f.u.shape[1]), dtype=f.u.dtype)
        d_span = np.zeros(span_len, dtype=f.d.dtype)
        u_span[rel] = f.u
        d_span[rel] = f.d
        factor = lowrank.LowRankFactor(u=u_span, s=f.s, d=d_span,
                                       rank=f.rank)
        if spill is not None:
            factor = spill.store(factor)
        factors.append(factor)
        indices.append(np.arange(span_start, span_start + span_len,
                                 dtype=np.int32))
    out = blocks_mod.pack(factors, indices, L, dtype=dtype, spill=spill,
                          u_dtype=u_dtype, n_shards=n_shards)
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
