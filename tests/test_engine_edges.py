"""Engine edge cases: K=1 mixture (degenerate categorical), P=3
populations (closed-form 3x3 sigma algebra), P=4 (the generic
batched-solve sigma fallback), and single-population fits."""
import numpy as np

from vilma_tpu.ops import blocks
from vilma_tpu.inference import engine


def _scheme(num_pops, num_comps, n=24, seed=0, num_its=12):
    rng = np.random.default_rng(seed)
    idx = np.abs(np.subtract.outer(np.arange(n), np.arange(n)))
    ld = 0.5 ** idx
    packed = blocks.from_dense_blocks([ld], [np.arange(n)], n)
    se = rng.uniform(0.02, 0.08, (num_pops, n))
    betas = rng.standard_normal((num_pops, n)) * 0.05
    covs = []
    scales = np.exp(np.linspace(np.log(1e-4), np.log(1e-2),
                                max(num_comps, 1)))
    for k in range(num_comps):
        a = rng.standard_normal((num_pops, num_pops))
        c = 0.2 * (a @ a.T) + num_pops * np.eye(num_pops)
        d = 1 / np.sqrt(np.diag(c))
        covs.append(scales[k] * (c * np.outer(d, d)))
    return engine.MultiPopVI(
        marginal_effects=betas, std_errs=se,
        ld_mats=[packed] * num_pops, mixture_covs=covs,
        annotations=np.ones((n, 1)), checkpoint=False, checkpoint_freq=-1,
        output='/tmp/vilma_tpu_edge', scaled=False, scale_se=False,
        gwas_N=np.full(num_pops, 1e4), init_hg=np.full(num_pops, 0.3),
        num_its=num_its)


def test_single_component_mixture():
    np.random.seed(3)
    scheme = _scheme(num_pops=2, num_comps=1)
    st = scheme.optimize()
    delta = np.asarray(st.vi_delta).T
    assert delta.shape == (24, 1)
    assert np.allclose(delta, 1.0)
    assert np.all(np.isfinite(scheme.real_posterior_mean(st)))
    assert scheme.elbo_value(st) > -np.inf


def test_three_populations_closed_form_sigma():
    np.random.seed(4)
    scheme = _scheme(num_pops=3, num_comps=3)
    st0 = scheme._initialize()
    e0 = scheme.elbo_value(st0)
    st = scheme.optimize()
    e1 = scheme.elbo_value(st)
    assert e1 > e0
    assert np.all(np.isfinite(scheme.real_posterior_variance(st)))


def test_four_populations_generic_sigma():
    np.random.seed(6)
    scheme = _scheme(num_pops=4, num_comps=2)
    st0 = scheme._initialize()
    e0 = scheme.elbo_value(st0)
    st = scheme.optimize()
    assert scheme.elbo_value(st) > e0
    assert np.all(np.isfinite(scheme.real_posterior_variance(st)))


def test_four_populations_chunked_trajectory_invariance(monkeypatch):
    """The P>=4 sigma path chunks over I at genome scale; the chunk
    length must not change the fit. Run the full engine with the chunk
    shrunk so n=24 splits into 3 chunks + a ragged tail, and require
    the trajectory to match the single-chunk run exactly."""
    from vilma_tpu.models import sigma as sigma_mod

    def _fit():
        np.random.seed(6)
        scheme = _scheme(num_pops=4, num_comps=2, num_its=6)
        st = scheme.optimize()
        return (np.asarray(scheme.real_posterior_mean(st)),
                scheme.elbo_value(st))

    pm_one, e_one = _fit()
    monkeypatch.setattr(sigma_mod, '_GENERIC_CHUNK', 10)
    pm_chunked, e_chunked = _fit()
    assert np.allclose(pm_chunked, pm_one, rtol=1e-12, atol=1e-14)
    assert np.isclose(e_chunked, e_one, rtol=1e-12)


def test_single_population():
    np.random.seed(5)
    scheme = _scheme(num_pops=1, num_comps=4)
    st0 = scheme._initialize()
    e0 = scheme.elbo_value(st0)
    st = scheme.optimize()
    assert scheme.elbo_value(st) > e0
    pm = scheme.real_posterior_mean(st)
    assert pm.shape == (1, 24)
