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

    if len(jax.devices()) < 8:
        return
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
