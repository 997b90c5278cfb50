"""Loader tests against the reference's committed golden fixtures.

The reference repo (read-only at /root/reference) ships fixture TSV/npy
files and a loader test tier (reference tests/test.py:486-707); we assert
the same observable semantics — column validation errors, allele flips,
missing handling, dense vs stacked-SVD LD equivalence — for our loaders.
"""
import os

import numpy as np
import pytest

from vilma_tpu.io import load

REF_DATA = os.environ.get(
    'VILMA_REF_DATA', '/root/reference/tests/test_data')

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA),
    reason='reference fixture directory unavailable')


def p(fname):
    return os.path.join(REF_DATA, fname)


def test_load_variant_list():
    for bad in ['bad_variants_missing_id.tsv', 'bad_variants_missing_a1.tsv',
                'bad_variants_missing_a2.tsv']:
        with pytest.raises(ValueError):
            load.load_variant_list(p(bad))
    variants = load.load_variant_list(p('good_variants.tsv'))
    assert len(variants) == 13
    assert set(variants.columns) == {'ID', 'A1', 'A2'}


def test_load_annotations():
    variants = load.load_variant_list(p('good_variants.tsv'))
    null_annot, denylist = load.load_annotations(None, variants)
    assert null_annot.shape == (13, 1)
    assert np.allclose(null_annot, 1)
    assert denylist == []

    annot, denylist = load.load_annotations(p('good_annotations.tsv'),
                                            variants)
    assert annot.shape == (13, 6)
    assert np.all(annot.sum(axis=1) == 1)
    assert np.all(annot.sum(axis=0)[1:] == 2)
    assert annot.sum(axis=0)[0] == 3
    assert denylist == [12]

    for bad in ['bad_annotations_missing_id.tsv',
                'bad_annotations_missing_annotation.tsv']:
        with pytest.raises(ValueError):
            load.load_annotations(p(bad), variants)


def test_load_sumstats_beta_or_flip():
    variants = load.load_variant_list(p('good_variants.tsv'))

    stats, missing = load.load_sumstats(p('good_sumstats_beta.tsv'), variants)
    assert set(missing) == {10, 11, 12}
    assert len(stats) == 13
    assert np.all(stats.BETA.iloc[0:10] == np.arange(10))
    assert np.all(stats.BETA.iloc[10:13] == 0.)
    assert np.all(stats.SE.iloc[0:10] == np.arange(10) + 1)
    assert np.all(stats.SE.iloc[10:13] == 1.)

    stats, missing = load.load_sumstats(p('good_sumstats_or.tsv'), variants)
    assert set(missing) == {10, 11, 12}
    assert np.allclose(stats.BETA.iloc[0:10], np.log(np.arange(10) + 1.))

    stats, missing = load.load_sumstats(p('good_sumstats_flip.tsv'), variants)
    assert set(missing) == {0, 10, 11, 12}
    assert np.all(stats.BETA.iloc[0:10] == -np.arange(10))
    assert np.all(stats.SE.iloc[0:10] == np.arange(10) + 1)


def test_load_sumstats_errors():
    variants = load.load_variant_list(p('good_variants.tsv'))
    for bad in ['bad_sumstats_missing_id.tsv', 'bad_sumstats_missing_beta.tsv',
                'bad_sumstats_missing_se.tsv', 'bad_sumstats_missing_a1.tsv',
                'bad_sumstats_missing_a2.tsv']:
        with pytest.raises(ValueError):
            load.load_sumstats(p(bad), variants)


def _expected_ld(denylist=()):
    true_ld = np.eye(13)
    true_ld[0, 2] = -1
    true_ld[2, 0] = -1
    true_ld[5, 5] = 0
    true_ld[12, 12] = 0
    for i in denylist:
        true_ld[i, i] = 0
    return true_ld


@pytest.mark.parametrize('manifest', ['ld_manifest.tsv',
                                      'ld_manifest_svd.tsv'])
@pytest.mark.parametrize('denylist', [[], [3, 4, 5]])
def test_load_ld_from_schema(manifest, denylist):
    variants = load.load_variant_list(p('good_variants.tsv'))
    ldmat, missing = load.load_ld_from_schema(p(manifest), variants,
                                              denylist, 1., False)
    true_ld = _expected_ld(denylist)
    v = np.random.default_rng(0).random(13)
    assert np.allclose(np.asarray(ldmat.dot(v)), true_ld.dot(v))


def test_load_missing():
    variants = load.load_variant_list(p('good_variants_plus_missing.tsv'))
    ldmat, missing = load.load_ld_from_schema(p('ld_manifest.tsv'), variants,
                                              [], 1., False)
    assert set(missing) == {5, 12, 13, 14}
    for i in (13, 14):
        e = np.zeros(15)
        e[i] = 1
        assert np.allclose(np.asarray(ldmat.dot(e)), 0)
        assert np.allclose(np.asarray(ldmat.inverse.dot(e)), 0)

    sumstats, missing = load.load_sumstats(
        p('good_sumstats_beta_plus_missing.tsv'), variants)
    assert set(missing) == {10, 11, 12, 14}


def _count_factorizations(monkeypatch):
    """Instrument the eigendecomposition entry point with a call counter."""
    from vilma_tpu.ops import lowrank
    calls = []
    real = lowrank.factor_block

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(load.lowrank, 'factor_block', counting)
    return calls


def test_factor_cache_hit_and_equivalence(tmp_path, monkeypatch):
    variants = load.load_variant_list(p('good_variants.tsv'))
    calls = _count_factorizations(monkeypatch)
    cache = str(tmp_path / 'cache')

    plain, _ = load.load_ld_from_schema(p('ld_manifest.tsv'), variants,
                                        [], 1., False)
    n_blocks = len(calls)
    assert n_blocks > 0

    calls.clear()
    cold, _ = load.load_ld_from_schema(p('ld_manifest.tsv'), variants,
                                       [], 1., False, cache_dir=cache)
    assert len(calls) == n_blocks  # cold: every block factorized + stored

    calls.clear()
    warm, _ = load.load_ld_from_schema(p('ld_manifest.tsv'), variants,
                                       [], 1., False, cache_dir=cache)
    assert len(calls) == 0  # warm: all blocks served from the cache

    v = np.random.default_rng(0).random(13)
    expect = np.asarray(plain.dot(v))
    assert np.array_equal(np.asarray(cold.dot(v)), expect)
    assert np.array_equal(np.asarray(warm.dot(v)), expect)


def test_factor_cache_keys_invalidate(tmp_path, monkeypatch):
    variants = load.load_variant_list(p('good_variants.tsv'))
    calls = _count_factorizations(monkeypatch)
    cache = str(tmp_path / 'cache')

    load.load_ld_from_schema(p('ld_manifest.tsv'), variants, [], 1.,
                             False, cache_dir=cache)
    n_blocks = len(calls)

    # a different threshold must miss (key includes ldthresh)
    calls.clear()
    load.load_ld_from_schema(p('ld_manifest.tsv'), variants, [], 0.5,
                             False, cache_dir=cache)
    assert len(calls) == n_blocks

    # a different variant match must miss (key includes kept rows)
    calls.clear()
    load.load_ld_from_schema(p('ld_manifest.tsv'), variants, [3, 4, 5],
                             1., False, cache_dir=cache)
    assert len(calls) > 0


def test_factor_cache_ignores_corrupt_entry(tmp_path, monkeypatch):
    variants = load.load_variant_list(p('good_variants.tsv'))
    cache = tmp_path / 'cache'
    plain, _ = load.load_ld_from_schema(p('ld_manifest.tsv'), variants,
                                        [], 1., False,
                                        cache_dir=str(cache))
    entries = sorted(cache.glob('*.npz'))
    assert entries
    entries[0].write_bytes(b'not an npz')

    again, _ = load.load_ld_from_schema(p('ld_manifest.tsv'), variants,
                                        [], 1., False,
                                        cache_dir=str(cache))
    v = np.random.default_rng(0).random(13)
    assert np.array_equal(np.asarray(again.dot(v)), np.asarray(plain.dot(v)))
