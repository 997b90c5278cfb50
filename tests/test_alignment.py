"""Aligned-segment-layout tests: relayouted fits produce identical
outputs to genome-order fits, and the CLI --align-layout path matches the
reference golden."""
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from vilma_tpu.ops import blocks
from vilma_tpu.parallel import alignment

DATA = os.path.join(os.environ.get('VILMA_REF', '/root/reference'),
                    'tests', 'test_data')


def test_compute_layout_and_relayout():
    rng = np.random.default_rng(0)
    # two cohorts with different (contiguous) block boundaries over 300
    # variants, 20 trailing missing
    n = 320
    def make(sizes):
        factors, idx = [], []
        start = 0
        dense = []
        for sz in sizes:
            a = rng.standard_normal((sz, sz))
            x = a @ a.T / sz
            dense.append(x)
            from vilma_tpu.ops import lowrank
            factors.append(lowrank.factor_block(X=x, t=1.0,
                                                check_symmetric=False))
            idx.append(np.arange(start, start + sz))
            start += sz
        return blocks.pack(factors, idx, n), dense, idx
    ld_a, dense_a, idx_a = make([100, 150, 50])
    ld_b, dense_b, idx_b = make([60, 90, 150])

    layout_map, L, ok = alignment.compute_layout([ld_a, ld_b], n)
    assert ok
    assert L % 128 == 0
    assert np.unique(layout_map).size == n

    for ld, dense, idx in [(ld_a, dense_a, idx_a), (ld_b, dense_b, idx_b)]:
        ld2 = alignment.relayout_ld(ld, layout_map, L)
        assert ld2.row_aligned
        v = rng.standard_normal(n)
        v_layout = alignment.relayout_rows(v, layout_map, L)
        y_orig = np.asarray(blocks.dot(ld, v))
        y_layout = np.asarray(blocks.dot(ld2, v_layout))
        assert np.allclose(y_layout[layout_map], y_orig, atol=1e-9)
        assert np.isclose(ld2.get_rank(), ld.get_rank())


def test_aligned_engine_matches_unaligned():
    rng = np.random.default_rng(1)
    from vilma_tpu.ops import lowrank
    from vilma_tpu.inference import engine
    n = 120
    sizes = [50, 40, 30]
    factors, idx = [], []
    start = 0
    for sz in sizes:
        a = rng.standard_normal((sz, sz))
        x = a @ a.T / sz
        d = np.diag(1 / np.sqrt(np.diag(x)))
        factors.append(lowrank.factor_block(X=d @ x @ d, t=1.0,
                                            check_symmetric=False))
        idx.append(np.arange(start, start + sz))
        start += sz
    ld = blocks.pack(factors, idx, n)
    betas = rng.standard_normal((2, n)) * 0.05
    ses = rng.uniform(0.02, 0.08, (2, n))
    covs = [np.eye(2) * 1e-4, np.eye(2) * 1e-2]
    annot = np.zeros((n, 2))
    annot[np.arange(n), rng.integers(0, 2, n)] = 1
    kwargs = dict(mixture_covs=covs, checkpoint=False, checkpoint_freq=-1,
                  scaled=False, scale_se=True,
                  gwas_N=np.array([1e4, 2e4]),
                  init_hg=np.array([0.2, 0.3]), num_its=60)

    np.random.seed(5)
    m1 = engine.MultiPopVI(marginal_effects=betas, std_errs=ses,
                           ld_mats=[ld, ld], annotations=annot,
                           output='/tmp/al_a', **kwargs)
    st1 = m1.optimize()

    layout_map, L, ok = alignment.compute_layout([ld, ld], n)
    assert ok
    ld2 = alignment.relayout_ld(ld, layout_map, L)
    np.random.seed(5)
    m2 = engine.MultiPopVI(
        marginal_effects=alignment.relayout_rows(betas, layout_map, L),
        std_errs=alignment.relayout_rows(ses, layout_map, L, fill=1.0),
        ld_mats=[ld2, ld2],
        annotations=alignment.relayout_annotations(annot, layout_map, L),
        output='/tmp/al_b', out_index=layout_map, **kwargs)
    st2 = m2.optimize()

    # identical optima; trajectories may differ at fp-reassociation level
    # (padded reductions reorder sums, which can flip line-search branch
    # decisions), so compare at optimization tolerance
    assert np.allclose(m1.real_posterior_mean(st1),
                       m2.real_posterior_mean(st2), rtol=1e-2, atol=2e-5)
    assert np.allclose(np.asarray(st1.hyper_delta),
                       np.asarray(st2.hyper_delta), rtol=1e-2, atol=1e-5)
    assert np.allclose(np.asarray(st1.error_scaling),
                       np.asarray(st2.error_scaling), rtol=1e-4)
    assert np.isclose(float(st1.elbo), float(st2.elbo), rtol=1e-6)

    # the very first coordinate-ascent step matches tightly (same branch
    # decisions, only reduction-reassociation noise)
    from vilma_tpu.inference import engine as eng
    np.random.seed(5)
    s1 = m1._initialize()
    np.random.seed(5)
    s2 = m2._initialize()
    s1b, pm1 = eng.outer_step(m1.data, s1, line_search_rate=2.0)
    s2b, pm2 = eng.outer_step(m2.data, s2, line_search_rate=2.0)
    ix = m2._out_index
    assert np.allclose(np.asarray(pm1), np.asarray(pm2)[:, ix],
                       rtol=1e-6, atol=1e-10)


@pytest.mark.skipif(not os.path.isdir(DATA),
                    reason='reference fixtures unavailable')
def test_cli_fit_align_layout_matches_golden(tmp_path):
    def run_cli(*cli_args):
        env = dict(os.environ)
        env['PYTHONPATH'] = (os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))) + os.pathsep
            + env.get('PYTHONPATH', ''))
        return subprocess.call([sys.executable, '-m', 'vilma_tpu.frontend']
                               + list(cli_args), env=env)

    out = str(tmp_path / 'vilma_run_aligned')
    assert run_cli('fit',
                   '--ld-schema', os.path.join(DATA, 'ld_manifest.tsv'),
                   '--sumstats', os.path.join(DATA,
                                              'good_sumstats_beta.tsv'),
                   '--output', out, '-K', '80', '--ldthresh', '0.8',
                   '--init-hg', '0.2', '--samplesizes', '10e3',
                   '--names', 'test_cohort', '--learn-scaling',
                   '--align-layout',
                   '--extract', os.path.join(DATA,
                                             'good_variants.tsv')) == 0
    truth = pd.read_csv(os.path.join(DATA, 'copy_vilma_run.estimates.tsv'),
                        sep='\t', header=0)
    cli = pd.read_csv(out + '.estimates.tsv', sep='\t', header=0)
    for col in truth.columns:
        if truth[col].dtype.kind in 'fc':
            assert np.allclose(truth[col], cli[col], rtol=1e-4,
                               atol=1e-10), col
        else:
            assert (truth[col] == cli[col]).all(), col


def test_relayout_blocks_with_holes():
    """Blocks with holes (variants dropped inside a cohort's LD window —
    denylisted/mismatched) must still get the aligned layout: only
    ascending order and disjoint [min, max] intervals are required."""
    rng = np.random.default_rng(5)
    from vilma_tpu.ops import lowrank
    n = 260
    # cohort A: two blocks with interior holes; cohort B: contiguous
    def holey(start, window, keep):
        ix = np.sort(rng.choice(np.arange(start, start + window),
                                size=keep, replace=False))
        a = rng.standard_normal((keep, keep))
        x = a @ a.T / keep
        return lowrank.factor_block(X=x, t=1.0,
                                    check_symmetric=False), ix, x
    f1, ix1, x1 = holey(0, 120, 97)
    f2, ix2, x2 = holey(120, 130, 110)
    ld_a = blocks.pack([f1, f2], [ix1, ix2], n)
    f3, ix3, x3 = holey(0, 250, 250)       # keep == window: contiguous
    ld_b = blocks.pack([f3], [ix3], n)

    layout_map, L, ok = alignment.compute_layout([ld_a, ld_b], n)
    assert ok and L % 128 == 0
    assert np.unique(layout_map).size == n

    v = rng.standard_normal(n)
    v_layout = alignment.relayout_rows(v, layout_map, L)
    for ld in (ld_a, ld_b):
        ld2 = alignment.relayout_ld(ld, layout_map, L)
        assert ld2.row_aligned
        y_orig = np.asarray(blocks.dot(ld, v))
        y_layout = np.asarray(blocks.dot(ld2, v_layout))
        assert np.allclose(y_layout[layout_map], y_orig, atol=1e-9)
        assert np.isclose(ld2.get_rank(), ld.get_rank())


def _rand_factor(rng, k):
    from vilma_tpu.ops import lowrank
    a = rng.standard_normal((k, k))
    return lowrank.factor_block(X=a @ a.T / k, t=1.0,
                                check_symmetric=False)


def test_interleaved_blocks_align_via_virtual_order():
    """Blocks whose index intervals interleave (arbitrary extract-file
    ordering) relayout through the virtual genome order — the operator
    is exactly preserved and the result is row-aligned. (Round-4 refused
    these; reference anchor matrix_structures.py:389-408 — block
    membership never required contiguity.)"""
    rng = np.random.default_rng(6)
    n = 40
    ix1 = np.array([0, 2, 4, 6, 8, 10])
    ix2 = np.array([1, 3, 5, 7, 9, 11])
    ld = blocks.pack([_rand_factor(rng, 6), _rand_factor(rng, 6)],
                     [ix1, ix2], n)
    layout_map, L, ok = alignment.compute_layout([ld], n)
    assert ok
    assert np.unique(layout_map).size == n
    ld2 = alignment.relayout_ld(ld, layout_map, L)
    assert ld2.row_aligned
    v = rng.standard_normal(n)
    vl = alignment.relayout_rows(v, layout_map, L)
    y = np.asarray(blocks.dot(ld, v))
    yl = np.asarray(blocks.dot(ld2, vl))
    assert np.allclose(yl[layout_map], y, atol=1e-9)
    assert np.isclose(ld2.get_rank(), ld.get_rank())
    assert np.allclose(np.asarray(blocks.diag(ld2))[layout_map],
                       np.asarray(blocks.diag(ld)), atol=1e-12)


def test_shuffled_extract_aligns_multi_cohort():
    """A fully shuffled extract order (every block's indices scattered),
    TWO cohorts with different block boundaries: the virtual-order
    layout must preserve both operators, support shard-local spans, and
    keep per-cohort blocks non-interleaved."""
    rng = np.random.default_rng(7)
    n = 512
    shuffle = rng.permutation(n)        # genome position -> extract row

    def make(sizes):
        factors, idx = [], []
        start = 0
        for sz in sizes:
            factors.append(_rand_factor(rng, sz))
            idx.append(shuffle[np.arange(start, start + sz)])
            start += sz
        return blocks.pack(factors, idx, n)

    ld_a = make([100, 150, 50, 100, 112])
    ld_b = make([60, 90, 150, 120, 92])
    for n_shards in (1, 4):
        layout_map, L, ok = alignment.compute_layout([ld_a, ld_b], n,
                                                     n_shards=n_shards)
        assert ok, n_shards
        assert np.unique(layout_map).size == n
        assert L % (128 * n_shards) == 0
        for ld in (ld_a, ld_b):
            ld2 = alignment.relayout_ld(ld, layout_map, L,
                                        n_shards=n_shards)
            assert ld2.row_aligned
            if n_shards > 1:
                assert ld2.shard_count == n_shards
            v = rng.standard_normal(n)
            vl = alignment.relayout_rows(v, layout_map, L)
            y = np.asarray(blocks.dot(ld, v))
            if n_shards > 1:
                import jax
                from vilma_tpu.parallel import mesh as mesh_mod
                mesh = mesh_mod.make_mesh(n_snp=n_shards, n_comp=1)
                with jax.set_mesh(mesh):
                    yl = np.asarray(jax.jit(blocks.dot)(
                        ld2, jax.numpy.asarray(vl)))
            else:
                yl = np.asarray(blocks.dot(ld2, vl))
            assert np.allclose(yl[layout_map], y, atol=1e-9)


def test_topological_merge_conflict_detected():
    """Schemas that genuinely disagree on the order of shared variants
    (a cycle) are refused — the one remaining ineligible case."""
    chains = [np.array([0, 1, 2]), np.array([2, 1, 3])]
    assert alignment.topological_merge(chains, 4) is None
    # consistent chains merge fine, shared segment and all
    vpos = alignment.topological_merge(
        [np.array([0, 1, 2]), np.array([1, 2, 3])], 5)
    assert vpos is not None
    order = np.argsort(vpos)
    assert list(order) == [0, 1, 2, 3, 4]
