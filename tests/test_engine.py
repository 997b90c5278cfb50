"""VI engine tests: behavior parity with the reference engine tier
(reference tests/test.py:1226-1877) — init closed forms, monotone ELBO
under all flag combinations, update correctness, posterior formulas, and
checkpoint round trips — verified against independent numpy re-derivations.
"""
import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from vilma_tpu.ops import blocks
from vilma_tpu.inference import engine
from vilma_tpu.models import sigma as sigma_mod
from vilma_tpu.utils import synthetic


def dense_ld_50():
    ld = (1 + np.arange(50 * 50)).reshape(50, 50) / (50 * 50 + 1)
    ld = ld + ld.T + 5 * np.eye(50)
    d = np.diag(1 / np.sqrt(np.diag(ld)))
    return d @ ld @ d


def make_scheme(num_annotations=1, scaled=False, scale_se=False,
                unlinked=False, checkpoint=False):
    if unlinked:
        betas = np.arange(100).reshape(50, 2).T.astype(float)
        ld = np.eye(50)
    else:
        betas = np.arange(100).reshape(2, 50).astype(float)
        ld = dense_ld_50()
    std_errs = np.array([1.] * 50 + [2.] * 50).reshape(2, 50)
    packed = blocks.from_dense_blocks([ld], [np.arange(50)], 50)
    ld_mats = [packed, packed]
    mixture_covs = [np.eye(2), 2 * np.eye(2)]
    if num_annotations == 2:
        annotations = np.zeros((50, 2), dtype=int)
        annotations[0:25, 0] = 1
        annotations[25:, 1] = 1
    else:
        annotations = np.ones((50, 1), dtype=int)
    return engine.MultiPopVI(
        marginal_effects=betas,
        std_errs=std_errs,
        ld_mats=ld_mats,
        mixture_covs=mixture_covs,
        annotations=annotations,
        checkpoint=checkpoint,
        checkpoint_freq=-1,
        output='/tmp/vilma_tpu_test',
        scaled=scaled,
        scale_se=scale_se,
        gwas_N=np.array([100e3, 10e3]),
        init_hg=np.array([0.1, 0.9]),
        num_its=20,
    )


def numpy_elbo(scheme, st):
    """Independent numpy ELBO derivation (RSS likelihood + KL terms)."""
    data = scheme.data
    mu = np.asarray(st.vi_mu)
    delta = np.asarray(st.vi_delta).T          # oracle keeps the
    hyper = np.asarray(st.hyper_delta)         # reference's [I, K]
    esc = np.asarray(st.error_scaling)
    se = np.asarray(data.std_errs)
    dterm = np.asarray(data.scaled_ld_diags) / esc[:, None]
    prec = np.asarray(data.mixture_prec)
    K, P, I = mu.shape
    sigma = np.zeros((K, P, P, I))
    for k in range(K):
        for i in range(I):
            sigma[k, :, :, i] = np.linalg.inv(prec[k] + np.diag(dterm[:, i]))
    post_mean = np.einsum('kpi,ik->pi', mu, delta)
    diag_sigma = np.einsum('kppi->kpi', sigma)
    post_var = np.einsum('kpi,ik->pi', diag_sigma + mu ** 2,
                         delta) - post_mean ** 2
    smu = post_mean / se
    ld_dense = blocks.to_dense(data.ld[0])
    linked = np.stack([ld_dense @ smu[p] for p in range(P)])
    lik = np.zeros(P)
    for p in range(P):
        lik[p] = np.sum(
            -0.5 * (np.asarray(data.scaled_ld_diags)[p] * post_var[p]
                    + linked[p] * smu[p])
            + post_mean[p] * np.asarray(data.adj_marginal_effects)[p])
    lik += -0.5 * np.asarray(data.chi_stat)
    ll = np.sum(lik / esc
                - 0.5 * np.asarray(data.ld_ranks) * np.log(esc))
    annot = np.asarray(data.annotations)
    delta_kl = sum((delta[i] * (np.log(delta[i])
                                - np.log(hyper[annot[i]]))).sum()
                   for i in range(I))
    inner = 0.5 * np.einsum('kpi,kqi,kqp,ik->', mu, mu, prec, delta)
    lds = np.array([[np.linalg.slogdet(sigma[k, :, :, i])[1]
                     for i in range(I)] for k in range(K)])
    matches = np.einsum('kpq,kqpi->ik', prec, sigma)
    summary = np.asarray(data.log_det)[None, :] - lds.T + matches
    cov_kl = 0.5 * np.sum(summary * delta)
    return ll - (delta_kl + inner + cov_kl)


def test_elbo_matches_numpy_oracle():
    np.random.seed(42)
    scheme = make_scheme(num_annotations=2)
    st = engine.materialize_state(scheme.data, scheme._initialize())
    got = engine.elbo_jit(scheme.data, st.sigma, st.error_scaling,
                          st.vi_mu, st.vi_delta, st.hyper_delta)
    expect = numpy_elbo(scheme, st)
    assert np.allclose(float(got), expect)


def test_init_state_properties():
    np.random.seed(42)
    scheme = make_scheme(num_annotations=2)
    st = engine.materialize_state(scheme.data, scheme._initialize())
    delta = np.asarray(st.vi_delta).T
    assert delta.shape == (50, 2)
    assert np.allclose(delta.sum(axis=1), 1)
    assert np.all(delta > 0)
    hyper = np.asarray(st.hyper_delta)
    assert np.allclose(hyper.sum(axis=1), 1)
    # chi_stat = z' X^+ z against dense computation
    ld_dense = blocks.to_dense(scheme.data.ld[0])
    z = np.asarray(scheme.data.marginal_effects) / np.asarray(
        scheme.data.std_errs)
    for p in range(2):
        expect = z[p] @ np.linalg.pinv(ld_dense) @ z[p]
        assert np.allclose(float(scheme.data.chi_stat[p]), expect,
                           rtol=1e-6)


def test_init_shrinks_towards_zero_unlinked():
    # reference tests/test.py:1826-1846: initialization shrinks effects
    # towards zero while preserving sign (identity LD case)
    np.random.seed(42)
    scheme = make_scheme(unlinked=True)
    st = engine.materialize_state(scheme.data, scheme._initialize())
    mu = np.asarray(st.vi_mu)
    betas = np.asarray(scheme.data.marginal_effects)
    # reference checks (tests/test.py:1826-1846): shrinkage, sign
    # preservation, monotonicity in the observation, hyper bound
    for k in range(2):
        assert np.all(np.abs(mu[k, :, 1:]) < np.abs(betas[:, 1:]))
        assert np.all((betas[:, 1:] > 0)[(mu[k, :, 1:] > 0)])
        for p in range(2):
            assert np.all(np.diff(mu[k, p, :]) > 0)
    assert np.all(np.asarray(st.hyper_delta) > 1 / 500)


@pytest.mark.parametrize('num_annotations,scaled,scale_se', [
    (1, False, False),
    (1, True, False),
    (2, False, True),
    (2, True, True),
])
def test_optimize_improves_elbo(num_annotations, scaled, scale_se):
    np.random.seed(42)
    scheme = make_scheme(num_annotations=num_annotations, scaled=scaled,
                         scale_se=scale_se)
    st0 = scheme._initialize()
    elbo0 = scheme.elbo_value(st0)
    st = scheme.optimize()
    elbo1 = scheme.elbo_value(st)
    assert elbo1 > elbo0


def test_outer_step_monotone():
    np.random.seed(42)
    scheme = make_scheme()
    st = scheme._initialize()
    st = dataclasses.replace(
        st, elbo=jnp.asarray(scheme.elbo_value(st),
                             dtype=st.error_scaling.dtype))
    prev = float(st.elbo)
    for _ in range(3):
        st, _ = engine.outer_step(scheme.data, st, line_search_rate=2.0)
        cur = scheme.elbo_value(st)
        assert cur >= prev - 1e-6
        # tracked elbo (accumulated deltas) agrees with recomputation
        assert np.isclose(float(st.elbo), cur, rtol=1e-8, atol=1e-6)
        prev = cur


def test_outer_step_donated_matches():
    # the production optimize loop steps through the buffer-donating jit;
    # it must produce the same trajectory as the non-donating step (and
    # the donated input must actually be consumed on backends that
    # support donation)
    np.random.seed(42)
    scheme = make_scheme()
    st = scheme._initialize()
    import jax
    ref, pm_ref = engine.outer_step(
        scheme.data, jax.tree.map(lambda x: x, st), line_search_rate=2.0)
    out, pm_out = engine.outer_step_donated(scheme.data, st,
                                            line_search_rate=2.0)
    assert np.array_equal(np.asarray(pm_ref), np.asarray(pm_out))
    ref_m = engine.materialize_state(scheme.data, ref)
    out_m = engine.materialize_state(scheme.data, out)
    assert np.array_equal(np.asarray(ref_m.vi_mu), np.asarray(out_m.vi_mu))
    assert np.array_equal(np.asarray(ref_m.vi_delta),
                          np.asarray(out_m.vi_delta))


def test_l_cap_keeps_old_params():
    # with L so large the first step is accepted immediately and params
    # barely move (reference tests/test.py:1499-1514)
    np.random.seed(42)
    scheme = make_scheme(unlinked=True)
    st = scheme._initialize()
    import jax.numpy as jnp
    stL = dataclasses.replace(
        st, L=jnp.asarray(st.L).at[0].set(engine.L_MAX - 1))
    st2, _ = engine.outer_step(scheme.data, stL, line_search_rate=2.0)
    assert float(st2.L[0]) < engine.L_MAX - 1
    mu0 = np.asarray(engine.materialize_state(scheme.data, st).vi_mu)
    mu2 = np.asarray(engine.materialize_state(scheme.data, st2).vi_mu)
    assert np.allclose(mu2, mu0, atol=1e-4)


def test_hyper_delta_update_closed_form():
    np.random.seed(42)
    scheme = make_scheme(num_annotations=2)
    st = engine.materialize_state(scheme.data, scheme._initialize())
    obj0 = engine.elbo_jit(scheme.data, st.sigma, st.error_scaling,
                           st.vi_mu, st.vi_delta, st.hyper_delta)
    st2, _, _, _, _ = engine._update_hyper_delta(scheme.data, st, obj0)
    delta = np.asarray(st.vi_delta).T
    annot = np.asarray(scheme.data.annotations)
    counts = np.asarray(scheme.data.annotation_counts)
    expect = np.zeros((2, delta.shape[1]))
    for i in range(delta.shape[0]):
        expect[annot[i]] += delta[i]
    expect /= counts[:, None]
    expect /= expect.sum(axis=1, keepdims=True)
    assert np.allclose(np.asarray(st2.hyper_delta), expect)


def test_error_scaling_update_formula():
    np.random.seed(42)
    scheme = make_scheme(scale_se=True)
    # the scheme initializes the compact [K, P, I] state; this test
    # validates the MATERIALIZED EM formula, so materialize first
    st = engine.materialize_state(scheme.data, scheme._initialize())
    obj0, pm, lk = engine._beta_objective_terms(
        scheme.data, st.sigma, st.error_scaling, st.vi_mu, st.vi_delta,
        st.hyper_delta)
    st2, _ = engine._update_error_scaling(scheme.data, st, obj0, pm, lk)
    data = scheme.data
    mean = np.asarray(engine.posterior_mean(st.vi_mu, st.vi_delta))
    var = np.asarray(engine.posterior_marginal_variance(
        jnp.asarray(mean), st.vi_mu, st.vi_delta, st.sigma))
    ld_dense = blocks.to_dense(data.ld[0])
    se = np.asarray(data.std_errs)
    expect = np.zeros(2)
    for p in range(2):
        smu = mean[p] / se[p]
        expect[p] = (float(data.chi_stat[p])
                     - 2 * mean[p] @ np.asarray(data.adj_marginal_effects)[p]
                     + smu @ ld_dense @ smu
                     + (np.asarray(data.ld_diags)[p] * var[p]
                        * se[p] ** -2).sum()) / float(data.ld_ranks[p])
    assert np.allclose(np.asarray(st2.error_scaling), expect)


def test_checkpoint_roundtrip(tmp_path):
    np.random.seed(42)
    scheme = make_scheme()
    st = scheme.optimize()
    dump = scheme.create_dump_dict(st)
    path = tmp_path / 'ckpt.npz'
    np.savez(path, **dump)
    loaded = np.load(path)
    st2 = engine.materialize_state(scheme.data,
                                   scheme._state_from_checkpoint(loaded))
    for field in ['vi_mu', 'vi_delta', 'hyper_delta', 'error_scaling']:
        assert np.allclose(np.asarray(getattr(st, field)),
                           np.asarray(getattr(st2, field)))
    # resuming from the checkpoint keeps the ELBO (no degradation)
    e1 = scheme.elbo_value(st)
    e2 = scheme.elbo_value(st2)
    assert np.isclose(e1, e2)


def test_posterior_variance_positive():
    np.random.seed(42)
    scheme = make_scheme()
    st = scheme.optimize()
    pv = scheme.real_posterior_variance(st)
    assert np.all(pv > 0)


def test_ld_dedup_by_identity():
    # two populations sharing one PackedLD object must produce ONE entry
    # in ModelData.ld (a single jit parameter — at 6M SNPs a duplicate
    # is ~6 GB of phantom HBM in XLA's compile-time check) while
    # distinct objects stay separate; ld_index maps populations to
    # entries either way
    np.random.seed(0)
    ld = dense_ld_50()
    packed = blocks.from_dense_blocks([ld], [np.arange(50)], 50)
    packed2 = blocks.from_dense_blocks([ld], [np.arange(50)], 50)
    betas = np.arange(100).reshape(2, 50).astype(float)
    std_errs = np.ones((2, 50))
    kwargs = dict(
        annotations=np.ones((50, 1)), mixture_covs=[np.eye(2)],
        scaled=False, scale_se=False, gwas_N=np.array([1e3, 1e3]),
        init_hg=np.array([0.1, 0.1]))
    shared = engine.build_model_data(betas, std_errs, [packed, packed],
                                     **kwargs)
    assert len(shared.ld) == 1 and shared.ld_index == (0, 0)
    distinct = engine.build_model_data(betas, std_errs, [packed, packed2],
                                       **kwargs)
    assert len(distinct.ld) == 2 and distinct.ld_index == (0, 1)
    # and the engine math agrees between the two representations
    s1 = synthetic.synthetic_state(shared)
    s2 = synthetic.synthetic_state(distinct)
    e1 = engine.elbo_jit(shared, s1.sigma, s1.error_scaling, s1.vi_mu,
                         s1.vi_delta, s1.hyper_delta)
    e2 = engine.elbo_jit(distinct, s2.sigma, s2.error_scaling, s2.vi_mu,
                         s2.vi_delta, s2.hyper_delta)
    assert np.isclose(float(e1), float(e2))
