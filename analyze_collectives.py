"""Inventory the cross-device collectives in one sharded outer_step.

Compiles the full VI iteration over an 8-way simulated `snp` mesh and
counts every collective op (all-reduce / all-gather / reduce-scatter /
collective-permute / all-to-all) in the optimized HLO, with payload
bytes. This is the communication side of the multi-host scaling model:
per-iteration cross-device traffic is O(I) bytes (the genome<->block
permutation's gather/scatter crossing shard boundaries) plus scalar
ELBO/convergence reductions — per mesh axis, independent of K and of
the LD payload, which never moves after setup. See BASELINE.md
("Scaling model") for the recorded numbers.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python analyze_collectives.py [NUM_LOCI]
"""
import re
import sys

import numpy as np

_DTYPE_BYTES = {'f64': 8, 'f32': 4, 'bf16': 2, 'f16': 2,
                's64': 8, 's32': 4, 'u64': 8, 'u32': 4,
                's8': 1, 'u8': 1, 'pred': 1}

_SHAPE_RE = re.compile(r'(f64|f32|bf16|f16|s64|s32|u64|u32|s8|u8|pred)'
                       r'\[([0-9,]*)\]')
_OP_RE = re.compile(r'= (\(?[^=]*?\)?) (all-reduce|all-gather|'
                    r'reduce-scatter|collective-permute|all-to-all)\(')


def _shape_bytes(shape_text):
    """Total payload bytes of a (possibly tuple) HLO shape string."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_text):
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_inventory(hlo_text):
    """{op_kind: (count, total_bytes)} over an optimized HLO module."""
    out = {}
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        shape_text, op = m.groups()
        cnt, byt = out.get(op, (0, 0))
        out[op] = (cnt + 1, byt + _shape_bytes(shape_text))
    return out


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    from vilma_tpu.inference import engine
    from vilma_tpu.parallel import mesh as mesh_mod
    from vilma_tpu.utils import synthetic

    num_loci = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_snp = 8
    if len(jax.devices()) < n_snp:
        raise SystemExit('need XLA_FLAGS=--xla_force_host_platform_'
                         f'device_count={n_snp}')
    mesh = mesh_mod.make_mesh(n_snp=n_snp)

    def report(tag, hlo):
        inv = collective_inventory(hlo)
        print(f'collectives in one sharded outer_step — {tag} '
              f'({n_snp}-way snp mesh, I={num_loci}, P=2, f64):')
        total = 0
        for op, (cnt, byt) in sorted(inv.items()):
            print(f'  {op:20s} count={cnt:3d}  bytes={byt:>12,}')
            total += byt
        print(f'  {"TOTAL":20s} {"":10s}  bytes={total:>12,}'
              f'  ({total / max(num_loci, 1):.1f} B/SNP)')
        return inv

    # -- legacy layout: genome-order gather/scatter under SPMD ------------
    data = synthetic.synthetic_problem(num_loci=num_loci, num_pops=2,
                                       num_components=4, block_size=64,
                                       num_annotations=2,
                                       dtype=np.float64)
    state = synthetic.synthetic_state(data)
    sdata = mesh_mod.shard_data(data, mesh)
    sstate = mesh_mod.shard_state(state, mesh)
    with jax.set_mesh(mesh):
        hlo = jax.jit(
            lambda d, s: engine.outer_step_impl(d, s, 2.0),
        ).lower(sdata, sstate).compile().as_text()
    report('global-gather layout', hlo)

    # -- shard-local layout: collective-free matvec (the production
    #    `fit --mesh` path since round 3) ---------------------------------
    from vilma_tpu.parallel import alignment
    from vilma_tpu.ops import blocks as blocks_mod
    ld = data.ld[0]
    lmap, L, ok = alignment.compute_layout([ld], num_loci,
                                           n_shards=n_snp)
    assert ok
    lds = alignment.relayout_ld(ld, lmap, L, n_shards=n_snp)
    rng = np.random.default_rng(0)
    betas = alignment.relayout_rows(
        np.asarray(data.marginal_effects), lmap, L, fill=0.0)
    ses = alignment.relayout_rows(np.asarray(data.std_errs), lmap, L,
                                  fill=1.0)
    annot = np.zeros((L, 2))
    annot[lmap, rng.integers(0, 2, num_loci)] = 1
    covs = np.linalg.inv(np.asarray(data.mixture_prec))
    with jax.set_mesh(mesh):
        data2 = engine.build_model_data(
            betas, ses, [lds, lds], annot, covs, scaled=False,
            scale_se=False, gwas_N=np.full(2, 1e5),
            init_hg=np.full(2, 0.3), dtype=np.float64)
        state2 = synthetic.synthetic_state(data2)
        sdata2 = mesh_mod.shard_data(data2, mesh)
        sstate2 = mesh_mod.shard_state(state2, mesh)
        hlo2 = jax.jit(
            lambda d, s: engine.outer_step_impl(d, s, 2.0),
        ).lower(sdata2, sstate2).compile().as_text()
    return report('shard-local layout', hlo2)


if __name__ == '__main__':
    main()
