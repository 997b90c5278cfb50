"""Closed-form sigma algebra vs the dense batched-solve fallback.

The closed forms (P<=3) must agree with the generic path that
materializes [K,I,P,P] precision tensors — same math, different
factorization. P=3 is the multi-ancestry production case the reference
supports at full scale (reference numerics.py:216-254 handles general P);
round-2 review flagged that our closed forms stopped at P=2.
"""
import numpy as np
import pytest

from vilma_tpu.models import sigma as sigma_mod


def _problem(P, K=5, I=37, seed=0):
    rng = np.random.default_rng(seed)
    prec = []
    for _ in range(K):
        a = rng.standard_normal((P, P))
        prec.append(a @ a.T + P * np.eye(P))
    mixture_prec = np.stack(prec)
    diag_term = rng.uniform(0.1, 5.0, (P, I))
    vi_delta = rng.uniform(0.01, 1.0, (K, I))
    vi_delta /= vi_delta.sum(axis=0)
    x = rng.standard_normal((K, P, I))
    log_det_prior = -np.linalg.slogdet(mixture_prec)[1]
    return mixture_prec, diag_term, vi_delta, x, log_det_prior


def _dense(monkeypatch):
    monkeypatch.setattr(sigma_mod, '_use_closed_form', lambda P: False)


@pytest.mark.parametrize('P', [1, 2, 3])
def test_apply_sigma_matches_dense(P, monkeypatch):
    prec, dt, _, x, _ = _problem(P)
    closed = np.asarray(sigma_mod.apply_sigma(prec, dt, x))
    _dense(monkeypatch)
    dense = np.asarray(sigma_mod.apply_sigma(prec, dt, x))
    assert np.allclose(closed, dense, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('P', [1, 2, 3])
def test_make_summaries_matches_dense(P, monkeypatch):
    prec, dt, _, _, ldp = _problem(P)
    closed = sigma_mod.make_summaries(prec, ldp, dt)
    _dense(monkeypatch)
    dense = sigma_mod.make_summaries(prec, ldp, dt)
    for field in ('log_det_sigma', 'sigma_summary', 'diag', 'matches'):
        assert np.allclose(np.asarray(getattr(closed, field)),
                           np.asarray(getattr(dense, field)),
                           rtol=1e-10, atol=1e-12), field


@pytest.mark.parametrize('P', [1, 2, 3])
def test_sigma_weighted_sum_matches_dense(P, monkeypatch):
    prec, dt, vd, _, _ = _problem(P)
    closed = np.asarray(sigma_mod.sigma_weighted_sum(prec, dt, vd))
    _dense(monkeypatch)
    dense = np.asarray(sigma_mod.sigma_weighted_sum(prec, dt, vd))
    assert np.allclose(closed, dense, rtol=1e-10, atol=1e-12)


def test_apply_sigma_inverts_precision_p3():
    # independent oracle: sigma @ (precision @ x) == x
    prec, dt, _, x, _ = _problem(3, seed=7)
    px = np.asarray(sigma_mod.apply_precision(prec, dt, x))
    roundtrip = np.asarray(sigma_mod.apply_sigma(prec, dt, px))
    assert np.allclose(roundtrip, x, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize('P', [4, 5])
def test_generic_path_chunking_matches_unchunked(P, monkeypatch):
    """The P>=4 chunked batched-solve path (multiple chunks + a ragged
    tail: I=37, chunk=8) must equal the same math done in one chunk."""
    prec, dt, vd, x, ldp = _problem(P)
    one = {
        'apply': np.asarray(sigma_mod.apply_sigma(prec, dt, x)),
        'summ': sigma_mod.make_summaries(prec, ldp, dt),
        'wsum': np.asarray(sigma_mod.sigma_weighted_sum(prec, dt, vd)),
    }
    monkeypatch.setattr(sigma_mod, '_GENERIC_CHUNK', 8)
    assert np.allclose(np.asarray(sigma_mod.apply_sigma(prec, dt, x)),
                       one['apply'], rtol=1e-12, atol=1e-14)
    summ = sigma_mod.make_summaries(prec, ldp, dt)
    for field in ('log_det_sigma', 'sigma_summary', 'diag', 'matches'):
        assert np.allclose(np.asarray(getattr(summ, field)),
                           np.asarray(getattr(one['summ'], field)),
                           rtol=1e-12, atol=1e-14), field
    assert np.allclose(
        np.asarray(sigma_mod.sigma_weighted_sum(prec, dt, vd)),
        one['wsum'], rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize('P', [4, 5])
def test_generic_path_oracles(P, monkeypatch):
    """P>=4 correctness against materialize_sigma (dense [K,P,P,I]
    oracle, kept only for checkpoint parity/tests) and the
    sigma@(precision@x)==x roundtrip — with chunking engaged."""
    prec, dt, vd, x, ldp = _problem(P, seed=3)
    monkeypatch.setattr(sigma_mod, '_GENERIC_CHUNK', 16)
    dense = np.asarray(sigma_mod.materialize_sigma(prec, dt))  # [K,P,P,I]
    got = np.asarray(sigma_mod.apply_sigma(prec, dt, x))
    expect = np.einsum('kpqi,kqi->kpi', dense, x)
    assert np.allclose(got, expect, rtol=1e-9, atol=1e-11)
    px = np.asarray(sigma_mod.apply_precision(prec, dt, x))
    roundtrip = np.asarray(sigma_mod.apply_sigma(prec, dt, px))
    assert np.allclose(roundtrip, x, rtol=1e-9, atol=1e-11)
    summ = sigma_mod.make_summaries(prec, ldp, dt)
    diag_expect = np.einsum('kppi->kpi', dense)
    assert np.allclose(np.asarray(summ.diag), diag_expect,
                       rtol=1e-9, atol=1e-11)
    ws = np.asarray(sigma_mod.sigma_weighted_sum(prec, dt, vd))
    ws_expect = np.einsum('ki,kpqi->ipq', vd, dense)
    assert np.allclose(ws, ws_expect, rtol=1e-9, atol=1e-11)
