"""Multi-host execution: per-process LD loading and global sharded arrays.

The reference is strictly single-process (SURVEY.md section 2.4); at
multi-host scale the input pipeline must not load or eigendecompose every
LD block on every host (SURVEY.md section 7.3 item 6). The flow here:

  1. every process runs the cheap metadata pass
     (`load.matched_schema_entries`: .var parsing + variant matching), so
     the global block structure — sizes, genome permutation, missing set,
     bucket composition — is identical on all hosts without touching any
     .npy payload;
  2. blocks are grouped into size-tier buckets and each bucket's block
     axis is split contiguously across processes (matching the 'snp' mesh
     axis layout); each process loads + eigendecomposes ONLY its own
     slice — the O(n^3) factorizations, the dominant load cost, are
     perfectly distributed;
  3. per-bucket eigendecomposition ranks (unknowable from metadata) are
     agreed via one tiny allgather, then
     `jax.make_array_from_process_local_data` assembles globally-sharded
     bucket tensors over the 'snp' mesh axis.

The result is an ordinary PackedLD whose bucket arrays are global jax
Arrays: every downstream op (engine precompute, the jitted VI step) runs
unchanged under the mesh. Single-process calls degrade to the ordinary
loader. See tests/test_distributed.py for the 2-process CPU equivalence
proof.
"""
import logging

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from vilma_tpu.io import load as load_mod
from vilma_tpu.ops import blocks as blocks_mod
from vilma_tpu.ops.blocks import BlockBucket, PackedLD, _pad_to_tier, \
    _pad_rank
from vilma_tpu.io.load import consume_mmap_rng_draws


def _round_up(n, m):
    return -(-n // m) * m


def process_contiguous_devices():
    """All devices ordered process-major, so a contiguous slice of a
    sharded axis maps to a contiguous run of each process's devices."""
    return sorted(jax.devices(), key=lambda d: (d.process_index, d.id))


def host_fetch(arr):
    """np.asarray that also works for multi-host global jax Arrays.

    Single-process (or plain numpy input): a straight np.asarray.
    Multi-process: non-fully-addressable arrays are first rereplicated
    with an all-gather (jit identity with replicated out_shardings), then
    read from the local shard — every process returns the full value.
    """
    if not isinstance(arr, jax.Array) or jax.process_count() == 1:
        return np.asarray(arr)
    if not arr.is_fully_addressable:
        mesh = arr.sharding.mesh
        arr = jax.jit(lambda x: x,
                      out_shardings=NamedSharding(mesh, P()))(arr)
    return np.asarray(arr.addressable_data(0))


def _allgather_np(values):
    """All-gather a small numpy array across processes -> [nproc, ...]."""
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(
        np.asarray(values)))


def load_ld_sharded(schema_path, variants, denylist, ldthresh,
                    dtype=np.float64, mmap=False, mesh=None,
                    axis='snp', u_dtype=None, cache_dir=None):
    """Load an LD schema with per-process block ownership (see module
    docstring). Returns (PackedLD with globally-sharded buckets, list of
    variant positions missing LD info).

    Matches load.load_ld_from_schema semantics (reference
    load.py:237-354) exactly — same variant matching, allele flips,
    missing set, and factorization thresholds — with the work and the
    memory of the factor tensors distributed across processes.
    """
    if u_dtype is None:
        u_dtype = dtype
    if jax.process_count() == 1 and mesh is None:
        return load_mod.load_ld_from_schema(schema_path, variants,
                                            denylist, ldthresh,
                                            mmap=mmap, dtype=dtype,
                                            u_dtype=u_dtype,
                                            cache_dir=cache_dir)
    if mesh is None:
        raise ValueError('multi-process loads need the global device mesh')

    nproc = jax.process_count()
    pid = jax.process_index()
    n_dev = mesh.shape[axis]
    if n_dev % nproc != 0:
        raise ValueError(f'{axis} mesh axis ({n_dev}) must be divisible '
                         f'by the process count ({nproc})')

    # -- phase 1: metadata (identical on every process) -------------------
    entries = list(load_mod.matched_schema_entries(schema_path, variants,
                                                   denylist))
    total_flipped = sum(e['num_flipped'] for e in entries)
    if mmap:
        for _ in entries:
            consume_mmap_rng_draws()
    sizes = [len(e['idx']) for e in entries]
    seq_starts = np.concatenate([[0], np.cumsum(sizes)])
    n = variants.shape[0]
    covered = (np.concatenate([e['idx'] for e in entries])
               if entries else np.array([], dtype=np.int64))
    missing = tuple(sorted(set(range(n)) - set(covered.tolist())))

    # bucket composition from sizes alone: tier -> entry positions in
    # manifest order (rank padding is resolved by the allgather below)
    tiers = {}
    for pos, size in enumerate(sizes):
        tiers.setdefault(_pad_to_tier(size), []).append(pos)

    # -- phase 2: local factorization of owned slices ---------------------
    shard_info = []      # (pmax, B_pad, lo, hi, positions)
    local_factors = {}   # manifest position -> LowRankFactor
    for pmax in sorted(tiers):
        positions = tiers[pmax]
        B_pad = _round_up(len(positions), n_dev)
        per_proc = B_pad // nproc
        lo, hi = pid * per_proc, (pid + 1) * per_proc
        shard_info.append((pmax, B_pad, lo, hi, positions))
        for b in range(lo, min(hi, len(positions))):
            entry = entries[positions[b]]
            local_factors[positions[b]] = load_mod.load_entry_factor(
                entry, ldthresh, cache_dir=cache_dir)

    # -- phase 3: global rank agreement (one tiny allgather) --------------
    local_rmax = np.array([
        max((local_factors[p].r for p in positions[lo:hi]
             if p in local_factors), default=1)
        for (_, _, lo, hi, positions) in shard_info], dtype=np.int64)
    local_rank = np.array([sum(f.rank for f in local_factors.values())],
                          dtype=np.float64)
    all_rmax = _allgather_np(local_rmax)        # [nproc, n_buckets]
    all_rank = _allgather_np(local_rank)        # [nproc, 1]
    bucket_rmax = [_pad_rank(int(r)) for r in all_rmax.max(axis=0)]
    rank = float(all_rank.sum())

    # -- phase 4: assemble globally-sharded bucket tensors ----------------
    buckets = []
    for (pmax, B_pad, lo, hi, positions), rmax in zip(shard_info,
                                                      bucket_rmax):
        B_local = hi - lo
        u = np.zeros((B_local, pmax, rmax), dtype=u_dtype)
        s = np.zeros((B_local, rmax), dtype=dtype)
        inv_s = np.zeros((B_local, rmax), dtype=dtype)
        d = np.zeros((B_local, pmax), dtype=dtype)
        perm = np.full((B_local, pmax), n, dtype=np.int32)
        seq = np.full((B_local, pmax), n, dtype=np.int32)
        for row, b in enumerate(range(lo, min(hi, len(positions)))):
            f = local_factors[positions[b]]
            entry = entries[positions[b]]
            u[row, :f.n, :f.r] = f.u
            s[row, :f.r] = f.s
            with np.errstate(divide='ignore'):
                inv_s[row, :f.r] = np.where(
                    f.s > 0, 1.0 / np.where(f.s > 0, f.s, 1.0), 0.0)
            d[row, :f.n] = f.d
            perm[row, :f.n] = entry['idx']
            start = int(seq_starts[positions[b]])
            seq[row, :f.n] = np.arange(start, start + f.n,
                                       dtype=np.int32)

        def put(local, extra_dims):
            spec = P(*((axis,) + (None,) * extra_dims))
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), local)

        rpb = 1
        grows = np.zeros((B_local, rpb), dtype=np.int32)
        srows = np.zeros((B_local, rpb), dtype=np.int32)
        buckets.append(BlockBucket(
            u=put(u, 2), s=put(s, 1), inv_s=put(inv_s, 1), d=put(d, 1),
            perm=put(perm, 1), grows=put(grows, 1), srows=put(srows, 1),
            seq=put(seq, 1)))

    logging.info('process %d/%d: %d of %d LD blocks factorized locally',
                 pid, nproc, len(local_factors), len(entries))
    packed = PackedLD(buckets=tuple(buckets), n=n, inverted=False,
                      has_diag=False, rank=rank, missing=missing,
                      row_aligned=False)
    return packed, list(missing)


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """Initialize jax.distributed (idempotent).

    With no arguments, jax auto-detects the cluster (TPU pods, SLURM,
    OMPI, JAX_COORDINATOR_ADDRESS); explicit values support manual
    launches (fit --distributed --coordinator host:port
    --num-processes N --process-id i). Only the already-initialized case
    is tolerated; real coordinator failures propagate — swallowing them
    would silently degrade a multi-host launch into N independent
    full-problem fits that all believe they are rank 0."""
    kwargs = {}
    if coordinator_address:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as err:
        if 'already' not in str(err).lower():
            raise
        logging.info('jax.distributed already initialized: %s', err)
