"""Streaming .npz output: bounded-memory vi_sigma writes.

The reference materializes the full [K, P, P, I] vi_sigma into RAM to
save it (reference vi_options.py:263-265) — at genome scale with a
production mixture grid that array alone is tens of GB. These pin the
round-4 fix: a chunk-streamed zip member that np.load reads identically,
the engine's chunk generator matching the materialized property, and the
--no-save-vi-sigma opt-out.
"""
import subprocess
import sys

import numpy as np
import pandas as pd

from vilma_tpu.utils.npz_stream import save_npz_stream


def test_save_npz_stream_matches_savez(tmp_path):
    rng = np.random.default_rng(0)
    arrays = {'a': rng.standard_normal((3, 5)),
              'b': rng.integers(0, 9, (4,)),
              'scalar': np.asarray(2.5)}
    big = rng.standard_normal((7, 2, 2, 11))

    ref_path = tmp_path / 'ref.npz'
    np.savez(ref_path, **arrays, big=big)

    def chunks():
        yield big[:3]
        yield big[3:4]
        yield big[4:]

    out_path = tmp_path / 'out.npz'
    save_npz_stream(out_path, arrays,
                    [('big', big.shape, big.dtype, chunks())])
    ref = np.load(ref_path)
    got = np.load(out_path)
    assert sorted(ref.files) == sorted(got.files)
    for name in ref.files:
        assert ref[name].dtype == got[name].dtype, name
        assert np.array_equal(ref[name], got[name]), name


def test_save_npz_stream_validates_coverage(tmp_path):
    import pytest
    big = np.zeros((4, 3))
    with pytest.raises(ValueError, match='leading rows'):
        save_npz_stream(tmp_path / 'x.npz', {},
                        [('big', big.shape, big.dtype, iter([big[:2]]))])


def test_vi_sigma_chunks_match_property():
    from vilma_tpu.inference import engine
    from vilma_tpu.utils import synthetic
    np.random.seed(3)
    data = synthetic.synthetic_problem(num_loci=96, num_pops=2,
                                       num_components=5, block_size=32)
    covs = np.linalg.inv(np.asarray(data.mixture_prec))
    vi = engine.MultiPopVI(
        marginal_effects=np.asarray(data.marginal_effects),
        std_errs=np.asarray(data.std_errs), ld_mats=[data.ld[0]] * 2,
        mixture_covs=covs, annotations=np.ones((96, 1)),
        checkpoint=False, gwas_N=np.full(2, 1e5),
        init_hg=np.full(2, 0.3), num_its=3, output='unused')
    vi.optimize()
    full = vi.vi_sigma
    got = np.concatenate(list(vi.vi_sigma_chunks(chunk_k=2)), axis=0)
    assert got.shape == full.shape
    assert np.allclose(got, full, rtol=1e-12, atol=1e-15)
    assert len(list(vi.vi_sigma_chunks(chunk_k=2))) == 3   # 5 comps / 2


def _small_fit(num_its=4, scale_se=False, seed=7):
    from vilma_tpu.inference import engine
    from vilma_tpu.utils import synthetic
    np.random.seed(seed)
    data = synthetic.synthetic_problem(num_loci=96, num_pops=2,
                                       num_components=4, block_size=32,
                                       scale_se=scale_se)
    covs = np.linalg.inv(np.asarray(data.mixture_prec))
    return engine.MultiPopVI(
        marginal_effects=np.asarray(data.marginal_effects),
        std_errs=np.asarray(data.std_errs), ld_mats=[data.ld[0]] * 2,
        mixture_covs=covs, annotations=np.ones((96, 1)),
        checkpoint=False, gwas_N=np.full(2, 1e5),
        init_hg=np.full(2, 0.3), num_its=num_its, scale_se=scale_se,
        output='unused')


import pytest


@pytest.mark.parametrize('scale_se', [False, True])
def test_streamed_outputs_match_materialized(tmp_path, monkeypatch,
                                             scale_se):
    """With the stream threshold forced to zero (as if the problem were
    genome-scale), the whole output surface — dump_spec streams,
    posterior moments, elbo, checkpoint resume — must agree with the
    materialized small-problem path."""
    from vilma_tpu.inference import engine

    # materialized reference values
    vi = _small_fit(scale_se=scale_se)
    st = vi.optimize()
    want = vi.create_dump_dict(st)
    want_pm = vi.real_posterior_mean(st)
    want_pv = vi.real_posterior_variance(st)
    want_elbo = vi.elbo_value(st)

    # identical fit on the streamed-output path
    monkeypatch.setattr(engine, '_STREAM_OUTPUT_BYTES', 0)
    vi2 = _small_fit(scale_se=scale_se)
    assert vi2._stream_big()
    st2 = vi2.optimize()
    assert st2.vi_mu is None and st2.nat_mu is not None  # stayed compact
    arrays, streams = vi2.dump_spec(st2)
    assert {n for n, *_ in streams} == {'vi_mu', 'vi_delta'}
    out = tmp_path / 'streamed.npz'
    save_npz_stream(out, arrays, streams)
    got = np.load(out)
    assert sorted(got.files) == sorted(want.keys())
    for key in want:
        assert np.allclose(got[key], want[key], rtol=1e-9,
                           atol=1e-12), key
    assert np.allclose(vi2.real_posterior_mean(st2), want_pm,
                       rtol=1e-9, atol=1e-12)
    assert np.allclose(vi2.real_posterior_variance(st2), want_pv,
                       rtol=1e-9, atol=1e-12)
    assert np.isclose(vi2.elbo_value(st2), want_elbo, rtol=1e-9)

    # resume through the streamed checkpoint (memmap member reader)
    vi3 = _small_fit(scale_se=scale_se)
    restored = vi3._state_from_checkpoint(np.load(out))
    assert restored.nat_mu is not None
    assert np.isclose(vi3.elbo_value(restored), want_elbo, rtol=1e-8)


def test_npz_member_memmap_roundtrip(tmp_path):
    from vilma_tpu.utils.npz_stream import npz_member_memmap
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((5, 3, 7))
    path = tmp_path / 'x.npz'
    np.savez(path, arr=arr, other=np.arange(4))
    mm = npz_member_memmap(str(path), 'arr')
    assert mm is not None and mm.shape == arr.shape
    assert np.array_equal(np.asarray(mm), arr)
    # the np.load-handle form works too
    mm2 = npz_member_memmap(np.load(path), 'other')
    assert np.array_equal(np.asarray(mm2), np.arange(4))


def _schema(tmp_path, sizes):
    rng = np.random.default_rng(0)
    root = str(tmp_path / 'schema')
    rows, ids = [], []
    start = 0
    for b, size in enumerate(sizes):
        idx = np.abs(np.subtract.outer(np.arange(size), np.arange(size)))
        np.save(f'{root}_{b}.npy', rng.uniform(0.4, 0.8) ** idx)
        with open(f'{root}_{b}.var', 'w') as fh:
            for i in range(size):
                name = f'snp{b}_{i}'
                ids.append(name)
                fh.write(f'{name}\t1\t{start + i + 1}\t0\tA\tT\n')
        rows.append(f'{root}_{b}.var\t{root}_{b}.npy')
        start += size
    with open(root + '.schema', 'w') as fh:
        fh.write('\n'.join(rows) + '\n')
    with open(root + '.extract', 'w') as fh:
        fh.write('ID\tA1\tA2\n')
        fh.write(''.join(f'{name}\tA\tT\n' for name in ids))
    rng2 = np.random.default_rng(1)
    n = len(ids)
    se = rng2.uniform(0.02, 0.08, n)
    frame = pd.DataFrame({'ID': ids, 'A1': 'A', 'A2': 'T',
                          'BETA': rng2.standard_normal(n) * se * 2,
                          'SE': se})
    frame.to_csv(root + '.sumstats.tsv', sep='\t', index=False)
    return root


def test_cli_fit_writes_streamed_npz_and_opt_out(tmp_path):
    """fit's .npz (now chunk-streamed) must np.load with the same keys
    and values as before; --no-save-vi-sigma drops only vi_sigma."""
    import os
    root = _schema(tmp_path, [32, 32])
    env = dict(os.environ)
    env['PYTHONPATH'] = (str(tmp_path.parent)
                         + os.pathsep + env.get('PYTHONPATH', ''))
    env['JAX_PLATFORMS'] = 'cpu'

    def fit(output, extra):
        cmd = [sys.executable, '-m', 'vilma_tpu.frontend', 'fit',
               '--ld-schema', root + '.schema',
               '--sumstats', root + '.sumstats.tsv',
               '--extract', root + '.extract',
               '-K', '2', '--num-its', '3', '--seed', '5',
               '--output', output] + extra
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]

    fit(str(tmp_path / 'with_sigma'), [])
    fit(str(tmp_path / 'no_sigma'), ['--no-save-vi-sigma'])
    with_sigma = np.load(str(tmp_path / 'with_sigma.npz'))
    no_sigma = np.load(str(tmp_path / 'no_sigma.npz'))
    assert 'vi_sigma' in with_sigma.files
    assert 'vi_sigma' not in no_sigma.files
    K = with_sigma['vi_mu'].shape[0]
    n = with_sigma['vi_mu'].shape[2]
    assert with_sigma['vi_sigma'].shape == (K, 1, 1, n)
    for key in no_sigma.files:
        assert np.allclose(with_sigma[key], no_sigma[key]), key
