"""AOT HBM analysis of the bench step program at genome scale.

Compiles bench.py's chained-iteration program against abstract
ShapeDtypeStruct inputs shaped like the 6M-SNP (or 1M/100K) benchmark
problem — no 6 GB host->device transfer needed — and prints XLA's
compile-time memory breakdown (argument/output/temp bytes). This is how
step-phase HBM OOMs are diagnosed and fixes validated without paying
the ~40 min cold-start of a real 6M run each attempt.

Non-LD shapes are derived from a small REAL problem (same K/P/A/field
structure) by substituting the SNP axis; the LD bucket shapes are read
from the packed disk cache's .npy headers (exact).

Run (TPU): BENCH_SIZE=6m python profile_mem.py [--donate]
"""
import glob
import json
import os
import re
import sys

import numpy as np

SMALL_I = 8192


def _sds_of(tree, small_i, big_i):
    import jax

    def leaf(x):
        shape = tuple(big_i if d == small_i else d
                      for d in np.shape(x))
        return jax.ShapeDtypeStruct(shape, np.asarray(x).dtype)

    return jax.tree.map(leaf, tree)


def _packed_sds(cache_dir):
    """Exact PackedLD ShapeDtypeStructs from a packed cache directory."""
    import jax
    from vilma_tpu.ops import blocks

    with open(os.path.join(cache_dir, 'meta.json')) as fh:
        meta = json.load(fh)
    n_buckets = meta['num_buckets']
    buckets = []
    for i in range(n_buckets):
        fields = {}
        for path in glob.glob(os.path.join(cache_dir, f'b{i}_*.npy')):
            name = re.match(rf'b{i}_(\w+)\.npy',
                            os.path.basename(path)).group(1)
            arr = np.load(path, mmap_mode='r')
            fields[name] = jax.ShapeDtypeStruct(arr.shape, arr.dtype)
        buckets.append(blocks.BlockBucket(**fields))
    return blocks.PackedLD(buckets=tuple(buckets), n=meta['n'],
                           inverted=False, has_diag=meta['has_diag'],
                           rank=meta['rank'],
                           missing=tuple(meta['missing']),
                           row_aligned=meta['row_aligned'])


def main():
    import bench
    import jax
    from jax import lax
    import dataclasses
    os.environ.setdefault('BENCH_LD_DTYPE', 'bf16')
    jax.config.update('jax_enable_x64', True)

    from vilma_tpu.inference import engine
    from vilma_tpu.utils import synthetic

    big_i = bench.NUM_LOCI
    tag = bench._packed_tag(np.float32)
    cache_dir = os.path.join(bench.CACHE_DIR, tag)
    if not os.path.exists(os.path.join(cache_dir, 'meta.json')):
        raise SystemExit(f'no packed cache at {cache_dir}')

    # small real instance for field structure (CPU), then substitute I.
    # BENCH_SCALE_SE=1 profiles the --learn-scaling program (compact
    # per-component [K, P, I] state); PROFILE_COMPACT=0 opts back into
    # the materialized state (the pre-round-3 program shape).
    # match bench.accel_main: the production program runs with the fused
    # Mosaic kernels on (BENCH_PALLAS=0 profiles the XLA fallback)
    if os.environ.get('BENCH_PALLAS', '1') != '0':
        from vilma_tpu.ops import blocks
        blocks.enable_pallas(True)
    compact = os.environ.get('PROFILE_COMPACT', '1') == '1'
    # PROFILE_K overrides the component count (e.g. 582 profiles the
    # production-CLI-grid program shape); with BENCH_SCALE_SE=1 the
    # state representation follows the engine's own kdim-vs-epoch rule
    # at the BIG SNP count (bench._epoch_b)
    K = int(os.environ.get('PROFILE_K', '0')) or bench.NUM_COMPONENTS
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        data = synthetic.synthetic_problem(
            num_loci=SMALL_I, num_pops=2,
            num_components=K,
            block_size=bench.BLOCK_SIZE, num_annotations=4,
            dtype=np.float32, rank_frac=bench.RANK_FRAC,
            scale_se=bench.SCALE_SE)
        state = synthetic.synthetic_state(
            data, compact=compact, epoch_b=bench._epoch_b(np.float32, K))

    # one UNIQUE LD parameter (both populations index it via ld_index,
    # matching build_model_data's identity dedup)
    ld_sds = _packed_sds(cache_dir)
    data_sds = dataclasses.replace(
        _sds_of(dataclasses.replace(data, ld=()), SMALL_I, big_i),
        ld=(ld_sds,))
    state_sds = _sds_of(state, SMALL_I, big_i)

    donate = (1,) if '--donate' in sys.argv else ()

    @(lambda f: jax.jit(f, donate_argnums=donate))
    def run(data, st):
        def body(i, st):
            st, _ = engine.outer_step_impl(data, st, line_search_rate=2.0)
            return st
        return lax.fori_loop(0, bench.N_STEPS, body, st)

    accel = [d for d in jax.devices() if d.platform != 'cpu']
    dev = accel[0] if accel else cpu
    print(f'compiling for {dev.platform} at I={big_i:,} '
          f'(donate={bool(donate)}) ...', flush=True)
    compiled = run.lower(data_sds, state_sds).compile()
    ma = compiled.memory_analysis()

    gib = 1024 ** 3
    ld_bytes = sum(
        int(np.prod(f.shape)) * f.dtype.itemsize
        for bk in ld_sds.buckets
        for f in jax.tree.leaves(bk))
    print(f'argument bytes : {ma.argument_size_in_bytes / gib:8.2f} GiB '
          f'(LD = {ld_bytes / gib:.2f} GiB)')
    print(f'output bytes   : {ma.output_size_in_bytes / gib:8.2f} GiB')
    print(f'temp bytes     : {ma.temp_size_in_bytes / gib:8.2f} GiB')
    print(f'alias bytes    : {ma.alias_size_in_bytes / gib:8.2f} GiB')
    peak = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
            + ma.output_size_in_bytes - ma.alias_size_in_bytes)
    print(f'peak (args + temp + out - alias): {peak / gib:8.2f} GiB')


if __name__ == '__main__':
    main()
