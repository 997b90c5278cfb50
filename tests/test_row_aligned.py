"""Row-aligned fast-path tests: the 128-aligned contiguous-block matvec
must be numerically identical to the general gather/scatter path."""
import dataclasses

import numpy as np

from vilma_tpu.ops import blocks, lowrank


def _aligned_problem(rng, sizes, n_extra=0):
    """Blocks at 128-aligned starts, contiguous; optionally trailing
    missing slots."""
    factors, indices = [], []
    start = 0
    for sz in sizes:
        a = rng.standard_normal((sz, sz))
        x = a @ a.T / sz
        factors.append(lowrank.factor_block(X=x, t=1.0,
                                            check_symmetric=False))
        indices.append(np.arange(start, start + sz))
        start += -(-sz // 128) * 128        # next aligned start
    n = start + n_extra
    return blocks.pack(factors, indices, n), n


def test_row_aligned_flag_detection():
    rng = np.random.default_rng(0)
    ld, n = _aligned_problem(rng, [128, 256, 200], n_extra=37)
    assert ld.row_aligned

    # unaligned start -> general path
    f = lowrank.factor_block(X=np.eye(16), t=1.0)
    ld2 = blocks.pack([f], [np.arange(5, 21)], 30)
    assert not ld2.row_aligned

    # non-contiguous -> general path
    ld3 = blocks.pack([f], [np.arange(0, 32, 2)], 40)
    assert not ld3.row_aligned


def test_row_aligned_dot_matches_general():
    rng = np.random.default_rng(1)
    ld, n = _aligned_problem(rng, [128, 256, 200, 1000], n_extra=55)
    assert ld.row_aligned
    v = rng.standard_normal(n)
    fast = np.asarray(blocks.dot(ld, v))
    general = np.asarray(blocks.dot(
        dataclasses.replace(ld, row_aligned=False), v))
    assert np.allclose(fast, general, atol=1e-12)
    # missing tail slots stay zero
    assert np.allclose(fast[-55:], 0)


def test_row_aligned_under_mesh_padding():
    import jax

    from vilma_tpu.inference import engine
    from vilma_tpu.parallel import mesh as mesh_mod
    from vilma_tpu.utils import synthetic

    assert len(jax.devices()) >= 8, (
        'conftest.py must provide 8 simulated CPU devices; failing loudly '
        'instead of skipping so sharding coverage cannot silently vanish')
    data = synthetic.synthetic_problem(num_loci=1024, num_pops=2,
                                       num_components=2, block_size=128,
                                       num_annotations=2)
    assert data.ld[0].row_aligned
    state = synthetic.synthetic_state(data)
    st1, pm1 = engine.outer_step(data, state, line_search_rate=2.0)

    mesh = mesh_mod.make_mesh(n_snp=8, n_comp=1)
    sdata = mesh_mod.shard_data(data, mesh)
    sstate = mesh_mod.shard_state(state, mesh)
    with jax.set_mesh(mesh):
        st2, pm2 = engine.outer_step(sdata, sstate, line_search_rate=2.0)
    assert np.allclose(np.asarray(pm1), np.asarray(pm2), rtol=1e-9,
                       atol=1e-11)


def test_row_aligned_pad_tail_invariant():
    """Pin the contract the fast path's neighbour-row reads rely on
    (blocks._dot_row_aligned): gather rows past a block's live extent may
    contain the NEXT block's vector data, which is harmless only because
    (a) the padded u/d rows beyond each block's true size are all zero, so
    neighbour values cannot contribute to the product, and (b) scatter
    rows past the live extent are routed to the trash row (srows == -1).
    A future bucket-tier or packing change that breaks either leg would
    corrupt results silently; this test makes it fail loudly instead."""
    rng = np.random.default_rng(7)
    sizes = [128, 200, 256, 1000, 900]          # mixed tiers, ragged tails
    ld, n = _aligned_problem(rng, sizes, n_extra=64)
    assert ld.row_aligned
    for bk in ld.buckets:
        perm = np.asarray(bk.perm)
        u = np.asarray(bk.u)
        d = np.asarray(bk.d)
        srows = np.asarray(bk.srows)
        for b in range(bk.num_blocks):
            live = int((perm[b] < n).sum())
            # (a) zero pad rows beyond the block's true extent
            assert not np.any(u[b, live:]), 'pad u rows must stay zero'
            assert not np.any(d[b, live:]), 'pad d rows must stay zero'
            # (b) scatter routing: live rows target real rows, the rest -1
            live_rows = -(-live // 128)
            assert np.all(srows[b, :live_rows] >= 0)
            assert np.all(srows[b, live_rows:] == -1)
