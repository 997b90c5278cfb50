"""Synthetic problem generation for benchmarks, sharding dry-runs, and
scale tests (no reference analog; the reference benches on `vilma sim`
outputs written to disk, which at 1M SNPs is needless IO)."""
import numpy as np

from vilma_tpu.ops import blocks, lowrank
from vilma_tpu.inference import engine


def synthetic_ld(num_loci, block_size, rank_frac=1.0, seed=0,
                 dtype=np.float64):
    """A block-diagonal LD matrix of AR(1)-like correlation blocks."""
    rng = np.random.default_rng(seed)
    factors, indices = [], []
    start = 0
    while start < num_loci:
        n = min(block_size, num_loci - start)
        rho = rng.uniform(0.3, 0.95)
        idx = np.abs(np.subtract.outer(np.arange(n), np.arange(n)))
        block = rho ** idx
        f = lowrank.factor_block(X=block, t=1.0, check_symmetric=False)
        if rank_frac < 1.0:
            r = max(1, int(f.r * rank_frac))
            order = np.argsort(f.s)[::-1][:r]
            f = lowrank.LowRankFactor(u=f.u[:, order], s=f.s[order],
                                      d=f.d, rank=int(r))
        factors.append(f)
        indices.append(np.arange(start, start + n))
        start += n
    return blocks.pack(factors, indices, num_loci, dtype=dtype)


def synthetic_problem(num_loci=1024, num_pops=2, num_components=8,
                      block_size=128, num_annotations=1, seed=0,
                      scale_se=False, dtype=np.float64, rank_frac=1.0):
    """Build (ModelData, MultiPopVI-free) synthetic fit inputs."""
    rng = np.random.default_rng(seed)
    ld = synthetic_ld(num_loci, block_size, rank_frac=rank_frac, seed=seed,
                      dtype=dtype)
    ld_mats = [ld for _ in range(num_pops)]
    std_errs = rng.uniform(0.01, 0.05, (num_pops, num_loci))
    betas = rng.standard_normal((num_pops, num_loci)) * std_errs * 2
    # exactly num_components mixture covariances (unlike the CLI grid,
    # which crosses variances x correlations into O(3K^2) components)
    scales = np.exp(np.linspace(np.log(1e-6), np.log(1e-2),
                                num_components))
    covs = []
    for k in range(num_components):
        a = rng.standard_normal((num_pops, num_pops))
        corr = 0.3 * (a @ a.T) + num_pops * np.eye(num_pops)
        d = 1 / np.sqrt(np.diag(corr))
        covs.append(scales[k] * (corr * np.outer(d, d)))
    annotations = np.zeros((num_loci, num_annotations))
    annotations[np.arange(num_loci),
                rng.integers(0, num_annotations, num_loci)] = 1
    data = engine.build_model_data(
        betas.astype(dtype), std_errs.astype(dtype), ld_mats, annotations,
        covs, scaled=False, scale_se=scale_se,
        gwas_N=np.full(num_pops, 1e5), init_hg=np.full(num_pops, 0.3),
        dtype=dtype)
    return data


def synthetic_state(data, seed=0, compact=False, epoch_b=None):
    """A fresh VIState for `data` (random but well-formed init).

    compact=True builds the [P, I] natural-mean representation (the
    production fast path for non-scale_se fits; see engine.VIState).
    epoch_b (scale_se only): build the EPOCH-HISTORY representation
    with a B=epoch_b buffer instead of the kdim [K, P, I] state — the
    production path for grid-scale scale_se fits
    (sigma.compact_exprs_epochs)."""
    import dataclasses
    import jax.numpy as jnp
    from vilma_tpu.models import sigma as sigma_mod

    dtype = data.marginal_effects.dtype
    P, I = data.marginal_effects.shape
    K = data.mixture_prec.shape[0]
    A = data.num_annotations
    rng = np.random.default_rng(seed)
    error_scaling = jnp.ones(P, dtype=dtype)
    if compact and epoch_b and data.scale_se:
        hyper = rng.uniform(0.1, 1.0, (A, K))
        hyper /= hyper.sum(axis=1, keepdims=True)
        st = engine.VIState(
            vi_mu=None, vi_delta=None, nat_grad_vi_delta=None, sigma=None,
            nat_mu=jnp.asarray(rng.standard_normal((P, I)) * 1e-2,
                               dtype=dtype),
            nat_hist=jnp.zeros((epoch_b, P, I), dtype=dtype),
            nat_hist_scale=jnp.ones((epoch_b, P), dtype=dtype),
            nat_hist_c=jnp.zeros(epoch_b, dtype=dtype),
            nat_hist_n=jnp.asarray(0, dtype=jnp.int32),
            hyper_delta=jnp.asarray(hyper, dtype=dtype),
            error_scaling=error_scaling,
            L=jnp.ones(3, dtype=dtype),
            elbo=jnp.asarray(0., dtype=dtype),
            running_elbo_delta=jnp.asarray(np.nan, dtype=dtype),
            num_err=jnp.asarray(0, dtype=jnp.int32),
        )
        e0 = engine.elbo_epoch_jit(data, st.error_scaling, st.nat_mu,
                                   st.nat_hist, st.nat_hist_scale,
                                   st.nat_hist_c, st.hyper_delta)
        return dataclasses.replace(st, elbo=e0)
    if compact:
        # scale_se fits carry per-component [K, P, I] natural means
        # (engine.VIState docstring); others share one [P, I] mean
        nat_shape = (K, P, I) if data.scale_se else (P, I)
        hyper = rng.uniform(0.1, 1.0, (A, K))
        hyper /= hyper.sum(axis=1, keepdims=True)
        st = engine.VIState(
            vi_mu=None, vi_delta=None, nat_grad_vi_delta=None, sigma=None,
            nat_mu=jnp.asarray(rng.standard_normal(nat_shape) * 1e-2,
                               dtype=dtype),
            hyper_delta=jnp.asarray(hyper, dtype=dtype),
            error_scaling=error_scaling,
            L=jnp.ones(3, dtype=dtype),
            elbo=jnp.asarray(0., dtype=dtype),
            running_elbo_delta=jnp.asarray(np.nan, dtype=dtype),
            num_err=jnp.asarray(0, dtype=jnp.int32),
        )
        e0 = engine.elbo_compact_jit(data, st.error_scaling, st.nat_mu,
                                     st.hyper_delta)
        return dataclasses.replace(st, elbo=e0)
    sig = sigma_mod.make_summaries(
        data.mixture_prec, data.log_det,
        data.scaled_ld_diags / error_scaling[:, None])
    delta = rng.uniform(0.1, 1.0, (K, I))
    delta /= delta.sum(axis=0, keepdims=True)
    hyper = rng.uniform(0.1, 1.0, (A, K))
    hyper /= hyper.sum(axis=1, keepdims=True)
    from vilma_tpu.ops import kernels
    nat_vd = kernels.fast_vi_delta_grad(jnp.asarray(hyper, dtype=dtype),
                                        data.log_det, data.annotations)
    st = engine.VIState(
        vi_mu=jnp.asarray(rng.standard_normal((K, P, I)) * 1e-3,
                          dtype=dtype),
        vi_delta=jnp.asarray(delta, dtype=dtype),
        hyper_delta=jnp.asarray(hyper, dtype=dtype),
        error_scaling=error_scaling,
        nat_grad_vi_delta=nat_vd,
        sigma=sig,
        L=jnp.ones(3, dtype=dtype),
        elbo=jnp.asarray(0., dtype=dtype),
        running_elbo_delta=jnp.asarray(np.nan, dtype=dtype),
        num_err=jnp.asarray(0, dtype=jnp.int32),
    )
    e0 = engine.elbo_jit(data, st.sigma, st.error_scaling, st.vi_mu,
                         st.vi_delta, st.hyper_delta)
    return dataclasses.replace(st, elbo=e0)
