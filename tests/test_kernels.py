"""Kernel parity tests: every fused XLA kernel vs a plain numpy
re-derivation on random inputs — the reference's own test pattern for its
numba kernels (reference tests/test.py:877-1217)."""
import numpy as np
import jax.numpy as jnp

from vilma_tpu.ops import kernels
from vilma_tpu.models import sigma as sigma_mod

RNG = np.random.default_rng(1234)
K, P, I, A = 4, 2, 37, 3


def _mu():
    return RNG.standard_normal((K, P, I))


def _delta():
    d = RNG.uniform(0.1, 1.0, size=(I, K))
    return d / d.sum(axis=1, keepdims=True)


def _prec():
    mats = []
    for _ in range(K):
        a = RNG.standard_normal((P, P))
        mats.append(a @ a.T + P * np.eye(P))
    return np.stack(mats)


def test_sum_betas():
    old, new = _mu(), _mu()
    got = np.asarray(kernels.sum_betas(jnp.asarray(old), jnp.asarray(new),
                                       0.3))
    assert np.allclose(got, 0.3 * new + 0.7 * old)


def test_fast_likelihood():
    pm = RNG.standard_normal((P, I))
    pv = RNG.uniform(0.1, 1, (P, I))
    smu = RNG.standard_normal((P, I))
    sld = RNG.uniform(0.5, 2, (P, I))
    le = RNG.standard_normal((P, I))
    adj = RNG.standard_normal((P, I))
    chi = RNG.uniform(1, 5, P)
    ranks = np.array([30., 20.])
    esc = RNG.uniform(0.5, 2, P)
    got = float(kernels.fast_likelihood(*map(jnp.asarray,
                                             (pm, pv, smu, sld, le, adj,
                                              chi, ranks, esc))))
    lik = np.zeros(P)
    for i in range(I):
        lik += (-0.5 * (sld[:, i] * pv[:, i] + le[:, i] * smu[:, i])
                + pm[:, i] * adj[:, i])
    lik += -0.5 * chi
    expect = (lik / esc - 0.5 * ranks * np.log(esc)).sum()
    assert np.allclose(got, expect)


def test_fast_posterior_mean_and_pmv():
    mu, delta = _mu(), _delta()
    mean = np.asarray(kernels.fast_posterior_mean(jnp.asarray(mu),
                                                  jnp.asarray(delta.T)))
    expect = np.einsum('kpi,ik->pi', mu, delta)
    assert np.allclose(mean, expect)

    diag = RNG.uniform(0.1, 1, (K, P, I))
    pmv = np.asarray(kernels.fast_pmv(jnp.asarray(mean), jnp.asarray(mu),
                                      jnp.asarray(delta.T),
                                      jnp.asarray(diag)))
    second = np.einsum('kpi,ik->pi', diag + mu ** 2, delta)
    assert np.allclose(pmv, second - mean ** 2)


def test_fast_inner_product_comp():
    mu, delta, prec = _mu(), _delta(), _prec()
    got = float(kernels.fast_inner_product_comp(
        jnp.asarray(mu), jnp.asarray(prec), jnp.asarray(delta.T)))
    expect = 0.5 * np.einsum('kpi,kqi,kqp,ik->', mu, mu, prec, delta)
    assert np.allclose(got, expect)


def test_sum_annotations_and_delta_kl():
    delta = _delta()
    annot = RNG.integers(0, A, size=I)
    got = np.asarray(kernels.sum_annotations(jnp.asarray(delta.T),
                                             jnp.asarray(annot), A))
    expect = np.zeros((A, K))
    for i in range(I):
        expect[annot[i]] += delta[i]
    assert np.allclose(got, expect)

    hyper = RNG.uniform(0.1, 1, (A, K))
    hyper /= hyper.sum(axis=1, keepdims=True)
    kl = float(kernels.fast_delta_kl(jnp.asarray(delta.T),
                                     jnp.asarray(hyper),
                                     jnp.asarray(annot)))
    expect_kl = sum((delta[i] * (np.log(delta[i])
                                 - np.log(hyper[annot[i]]))).sum()
                    for i in range(I))
    assert np.allclose(kl, expect_kl)


def test_fast_vi_delta_grad():
    hyper = RNG.uniform(0.1, 1, (A, K))
    hyper /= hyper.sum(axis=1, keepdims=True)
    log_det = RNG.standard_normal(K)
    annot = RNG.integers(0, A, size=I)
    got = np.asarray(kernels.fast_vi_delta_grad(
        jnp.asarray(hyper), jnp.asarray(log_det), jnp.asarray(annot))).T
    expect = np.empty((I, K - 1))
    lh = np.log(hyper)
    ss = -0.5 * log_det
    for i in range(I):
        last = lh[annot[i], -1] + ss[-1]
        for k in range(K - 1):
            expect[i, k] = lh[annot[i], k] + ss[k] - last
    assert np.allclose(got, expect)


def test_nat_cat_roundtrip():
    delta = _delta()
    nat = np.asarray(kernels.map_to_nat_cat_2D(jnp.asarray(delta.T))).T
    expect = np.log(delta[:, :-1]) - np.log(delta[:, -1:])
    assert np.allclose(nat, expect)
    back = np.asarray(kernels.invert_nat_cat_2D(jnp.asarray(nat.T))).T
    assert np.allclose(back, delta)


def test_fast_invert_nat_vi_delta():
    new_mu, nat_mu = _mu(), _mu()
    const = RNG.standard_normal((I, K))
    nat_vd = RNG.standard_normal((I, K - 1))
    got = np.asarray(kernels.fast_invert_nat_vi_delta(
        *map(jnp.asarray, (new_mu, nat_mu, const.T, nat_vd.T)))).T
    to_invert = np.empty((I, K - 1))
    for i in range(I):
        last = const[i, -1] + (new_mu[-1, :, i] * nat_mu[-1, :, i]).sum()
        for k in range(K - 1):
            this = const[i, k] + (new_mu[k, :, i] * nat_mu[k, :, i]).sum()
            to_invert[i, k] = 0.5 * (this - last) + nat_vd[i, k]
    mx = np.maximum(to_invert.max(axis=1, keepdims=True), 0)
    num = np.hstack([np.exp(to_invert - mx), np.exp(-mx)])
    expect = np.maximum(num / num.sum(axis=1, keepdims=True), 1e-100)
    assert np.allclose(got, expect)
    assert np.allclose(got.sum(axis=1), 1)


def _dense_sigma(prec, dterm):
    Kn, Pn, _ = prec.shape
    In = dterm.shape[1]
    out = np.zeros((Kn, Pn, Pn, In))
    for k in range(Kn):
        for i in range(In):
            out[k, :, :, i] = np.linalg.inv(prec[k] + np.diag(dterm[:, i]))
    return out


def test_sigma_closed_forms():
    for Pn in (1, 2, 3):
        prec = []
        for _ in range(K):
            a = RNG.standard_normal((Pn, Pn))
            prec.append(a @ a.T + Pn * np.eye(Pn))
        prec = np.stack(prec)
        dterm = RNG.uniform(0.5, 3, (Pn, I))
        dense = _dense_sigma(prec, dterm)

        x = RNG.standard_normal((K, Pn, I))
        got = np.asarray(sigma_mod.apply_sigma(jnp.asarray(prec),
                                               jnp.asarray(dterm),
                                               jnp.asarray(x)))
        expect = np.einsum('kpqi,kqi->kpi', dense, x)
        assert np.allclose(got, expect), f'apply_sigma P={Pn}'

        got_p = np.asarray(sigma_mod.apply_precision(jnp.asarray(prec),
                                                     jnp.asarray(dterm),
                                                     jnp.asarray(x)))
        full_prec = np.zeros_like(dense)
        for k in range(K):
            for i in range(I):
                full_prec[k, :, :, i] = prec[k] + np.diag(dterm[:, i])
        assert np.allclose(got_p,
                           np.einsum('kpqi,kqi->kpi', full_prec, x))

        log_det_prior = RNG.standard_normal(K)
        summ = sigma_mod.make_summaries(jnp.asarray(prec),
                                        jnp.asarray(log_det_prior),
                                        jnp.asarray(dterm))
        lds = np.array([[np.linalg.slogdet(dense[k, :, :, i])[1]
                         for i in range(I)] for k in range(K)])
        assert np.allclose(np.asarray(summ.log_det_sigma), lds)
        diag = np.einsum('kppi->kpi', dense)
        assert np.allclose(np.asarray(summ.diag), diag)
        matches = np.einsum('kpq,kqpi->ik', prec, dense)
        assert np.allclose(np.asarray(summ.matches), matches.T)
        assert np.allclose(np.asarray(summ.sigma_summary),
                           (log_det_prior[None, :] - lds.T + matches).T)

        delta = RNG.uniform(0.1, 1, (I, K))
        ws = np.asarray(sigma_mod.sigma_weighted_sum(jnp.asarray(prec),
                                                     jnp.asarray(dterm),
                                                     jnp.asarray(delta.T)))
        expect_ws = np.einsum('kpqi,ik->ipq', dense, delta)
        assert np.allclose(ws, expect_ws)

        mat = np.asarray(sigma_mod.materialize_sigma(jnp.asarray(prec),
                                                     jnp.asarray(dterm)))
        assert np.allclose(mat, dense)
