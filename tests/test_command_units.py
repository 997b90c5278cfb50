"""Unit tests for command internals (make_ld_schema block assignment,
check_ld_schema traces, sim statistical properties) mirroring the
reference's tiers (reference tests/test.py:714-875,1884-2009)."""
import os

import numpy as np
import pytest

from vilma_tpu.commands import make_ld_schema, check_ld_schema, sim
from vilma_tpu.ops import blocks
from vilma_tpu.io import plink

DATA = os.path.join(os.environ.get('VILMA_REF', '/root/reference'),
                    'tests', 'test_data')
has_ref = os.path.isdir(DATA)


def d(fname):
    return os.path.join(DATA, fname)


@pytest.mark.skipif(not has_ref, reason='fixtures unavailable')
def test_get_ld_blocks():
    with pytest.raises(ValueError):
        make_ld_schema._get_ld_blocks(d('bad_blocks.bed'))
    blk = make_ld_schema._get_ld_blocks(d('blocks.bed'))
    assert len(blk) == 1 and '1' in blk
    assert len(blk['1']) == 4
    assert np.all(blk['1']['start'] == np.array([0, 8, 100, 950]))
    assert np.all(blk['1']['end'] == np.array([8, 100, 200, 1000]))


@pytest.mark.skipif(not has_ref, reason='fixtures unavailable')
def test_assign_to_blocks():
    blk = make_ld_schema._get_ld_blocks(d('blocks.bed'))
    pdata = plink.open_plink(d('sim_genotypes'))
    assigned = make_ld_schema._assign_to_blocks(blk, pdata)
    # variants at bp 3,4 -> block 0; bp 9 -> block 1; bp 962,975 -> block 3
    assert set(assigned.keys()) == {'1 0', '1 1', '1 3'}
    assert assigned['1 0']['SNPs'].shape[1] == 2
    assert assigned['1 1']['SNPs'].shape[1] == 1
    assert assigned['1 3']['SNPs'].shape[1] == 2
    # extract filter keeps a subset
    assigned2 = make_ld_schema._assign_to_blocks(
        blk, pdata, variants={'var1', 'var5'})
    total = sum(v['SNPs'].shape[1] for v in assigned2.values())
    assert total == 2


def test_nan_corr_fast_matches_pandas():
    """The GEMM-based NaN-aware correlation must agree with
    pandas.DataFrame.corr() (the semantic spec) including under missing
    data and a constant-over-joint-support column."""
    rng = np.random.default_rng(7)
    genos = rng.integers(0, 3, size=(60, 40)).astype(float)
    miss = rng.random(genos.shape) < 0.15
    genos[miss] = np.nan
    expected = np.asarray(__import__('pandas').DataFrame(genos).corr())
    got = make_ld_schema._nan_corr_fast(genos)
    both = ~(np.isnan(expected) | np.isnan(got))
    assert np.allclose(got[both], expected[both], atol=1e-12)
    # columns with < 2 joint observations are NaN in both
    assert np.array_equal(np.isnan(got), np.isnan(expected))


def test_compute_trace():
    rng = np.random.default_rng(0)
    x1 = rng.random((5, 5))
    x1 = x1 + x1.T + 3 * np.eye(5)
    x2 = rng.random((3, 3))
    x2 = x2 + x2.T + 3 * np.eye(3)
    m = blocks.from_dense_blocks([x1, x2],
                                 [np.arange(5), np.arange(5, 8)], 8)
    full_diag = np.concatenate([np.diag(x1), np.diag(x2)])
    trace_df = check_ld_schema.compute_trace(m, np.ones((8, 1)))
    assert np.all(trace_df['annotation'] == 'all_snps')
    assert np.allclose(trace_df['trace'], full_diag.sum())
    assert np.allclose(trace_df['num_snps'], 8)

    one_hot = np.zeros((8, 3))
    one_hot[::4, 0] = 1
    one_hot[1::4, 1] = 1
    one_hot[2::4, 2] = 1
    one_hot[3::4, 2] = 1
    trace_df = check_ld_schema.compute_trace(m, one_hot)
    expect = [full_diag.sum(), full_diag[::4].sum(), full_diag[1::4].sum(),
              full_diag[2::4].sum() + full_diag[3::4].sum()]
    assert np.allclose(trace_df['trace'], expect)
    assert np.allclose(trace_df['num_snps'], [8, 2, 2, 4])

    with pytest.raises(ValueError):
        check_ld_schema.compute_trace(m, np.ones((8, 2)))


def test_sim_components_statistics():
    np.random.seed(0)
    annotations = np.zeros((20000, 2))
    annotations[0:10000, 0] = 1
    annotations[10000:, 1] = 1
    weights = np.array([[0.5, 0.3, 0.2], [0.2, 0.3, 0.5]])
    sims = sim.sim_components(annotations, weights)
    assert sims.shape == (20000, 3)
    assert np.allclose(sims.sum(axis=1), 1)
    assert np.all(np.abs(sims[:10000].mean(axis=0) - weights[0]) < 0.025)
    assert np.all(np.abs(sims[10000:].mean(axis=0) - weights[1]) < 0.025)


def test_sim_components_fast_statistics():
    """--fast-rng path: same marginal distribution as the per-SNP loop."""
    np.random.seed(0)
    annotations = np.zeros((20000, 2))
    annotations[0:10000, 0] = 1
    annotations[10000:, 1] = 1
    weights = np.array([[0.5, 0.3, 0.2], [0.2, 0.3, 0.5]])
    sims = sim.sim_components(annotations, weights, fast=True)
    assert sims.shape == (20000, 3)
    assert np.allclose(sims.sum(axis=1), 1)
    assert np.all(np.abs(sims[:10000].mean(axis=0) - weights[0]) < 0.025)
    assert np.all(np.abs(sims[10000:].mean(axis=0) - weights[1]) < 0.025)


def test_sim_true_effects_statistics():
    np.random.seed(1)
    n = 20000
    annotations = np.zeros((n, 2))
    annotations[:n // 2, 0] = 1
    annotations[n // 2:, 1] = 1
    weights = np.array([[1.0, 0.], [0., 1.0]])
    c1 = np.random.random((3, 3))
    c1 = c1 + c1.T + 5 * np.eye(3)
    c2 = 10 * np.random.random((3, 3))
    c2 = c2 + c2.T + 50 * np.eye(3)
    effects = sim.sim_true_effects(annotations, weights,
                                   np.array([c1, c2]))
    assert effects.shape == (3, n)
    for half, cov in [(effects[:, :n // 2], c1), (effects[:, n // 2:], c2)]:
        means = half.mean(axis=1)
        assert np.all(np.abs(means / np.sqrt(np.diag(cov)))
                      < 5 / np.sqrt(n // 2))
        err = np.sqrt(np.outer(np.diag(cov), np.diag(cov)))
        assert np.all(np.abs(np.cov(half) - cov) < err * 5 / np.sqrt(n // 2))


def test_sim_gwas_statistics():
    np.random.seed(2)
    true_betas = np.random.random(3)
    std_errs = np.random.random(3)
    x = np.random.random((3, 3))
    x = x + x.T + 5 * np.eye(3)
    ld = blocks.from_dense_blocks([x], [np.arange(3)], 3)
    reps = 10000
    beta_hats = np.zeros((3, reps))
    for i in range(reps):
        beta_hats[:, i] = sim.sim_gwas(true_betas, std_errs, ld)
    mean = x.dot(true_betas / std_errs) * std_errs
    var = np.diag(std_errs) @ x @ np.diag(std_errs)
    assert np.all(np.abs(beta_hats.mean(axis=1) - mean)
                  < np.sqrt(np.diag(var)) / np.sqrt(reps) * 5)
    err = np.sqrt(np.outer(np.diag(var), np.diag(var)))
    assert np.all(np.abs(np.cov(beta_hats) - var) < err * 5 / np.sqrt(reps))


def test_make_simple_drop_non_psd():
    """The P>=3 grid contains infeasible pairwise-correlation
    combinations (reference vi_options.py:309-310 products them
    independently); drop_non_psd removes exactly those without
    disturbing the RNG stream, and is a no-op at P=2 where every
    pairwise correlation in (-1, 1) is PSD."""
    from vilma_tpu.models import mixture

    mins, maxes = np.full(3, 1e-5), np.full(3, 1e-2)
    np.random.seed(7)
    full = mixture.make_simple(3, 4, mins, maxes)
    np.random.seed(7)
    kept = mixture.make_simple(3, 4, mins, maxes, drop_non_psd=True)

    full_min_eig = np.linalg.eigvalsh(np.array(full))[:, 0]
    assert np.any(full_min_eig <= 0), 'P=3 grid should be infeasible'
    assert 0 < len(kept) < len(full)
    assert np.all(np.linalg.eigvalsh(np.array(kept))[:, 0] > 0)
    # same RNG stream: the kept members are exactly the PSD subsequence
    expected = [c for c, e in zip(full, full_min_eig) if e > 0]
    assert all(np.array_equal(a, b) for a, b in zip(kept, expected))

    np.random.seed(7)
    full2 = mixture.make_simple(2, 4, mins[:2], maxes[:2])
    np.random.seed(7)
    kept2 = mixture.make_simple(2, 4, mins[:2], maxes[:2],
                                drop_non_psd=True)
    assert len(full2) == len(kept2)
    assert all(np.array_equal(a, b) for a, b in zip(full2, kept2))
