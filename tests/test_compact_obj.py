"""Fused compact-objective prologue (ops/pallas/compact_obj.py).

The kernel re-derives, per SNP tile, what engine._objective_compact
stages as XLA ops: the closed-form component moments, the stabilized
categorical vi_delta, the posterior moments, and the beta-KL reductions
(reference variational_inference.py:452-490,632-641,868-885). Interpret
mode pins value-level parity on CPU; the Mosaic compile itself is
covered by the TPU-gated selftest (tests/test_pallas_tpu.py).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vilma_tpu.inference import engine
from vilma_tpu.ops import blocks, lowrank
from vilma_tpu.parallel import alignment, mesh as mesh_mod
from vilma_tpu.utils import synthetic


def _objective_pair(data, st):
    """(xla, pallas-interpret) evaluations of the same compact point."""
    blocks.enable_pallas(False)
    want = engine._objective_compact(data, st, st.nat_mu, st.hyper_delta)
    try:
        blocks.enable_pallas(True, interpret=True)
        got = engine._objective_compact(data, st, st.nat_mu,
                                        st.hyper_delta)
    finally:
        blocks.enable_pallas(False)
    return want, got


@pytest.mark.parametrize('num_pops', [1, 2, 3])
@pytest.mark.parametrize('num_annotations', [1, 3, 12])
@pytest.mark.parametrize('kdim', [False, True])
def test_prologue_matches_staging(num_pops, num_annotations, kdim):
    """Objective, posterior means, and matvec outputs agree with the
    staged XLA path to float64 rounding across P x A (12 annotations
    exercises the kernel's one-hot-matmul selection branch; 1 and 3 the
    broadcast/select branches). kdim runs the per-component [K, P, I]
    scale_se natural-mean state through the same kernels."""
    data = synthetic.synthetic_problem(num_loci=300, num_pops=num_pops,
                                       num_components=5, block_size=32,
                                       num_annotations=num_annotations,
                                       scale_se=kdim)
    st = synthetic.synthetic_state(data, seed=1, compact=True)
    assert st.nat_mu.ndim == (3 if kdim else 2)
    (o1, pm1, lk1), (o2, pm2, lk2) = _objective_pair(data, st)
    assert np.isclose(float(o1), float(o2), rtol=1e-11)
    # the kernel reassociates the softmax/moment sums (full-logit vs
    # last-zero convention) — agreement is relative-to-scale, not ulp
    scale = float(np.abs(np.asarray(pm1)).max())
    assert np.allclose(np.asarray(pm1), np.asarray(pm2),
                       rtol=1e-10, atol=1e-10 * scale)
    # linked goes through the Pallas MATVEC kernel too, which always
    # accumulates in f32 (block_matvec._kernel) — compare at the
    # established matvec-kernel band (see test_pallas.py)
    lscale = float(np.abs(np.asarray(lk1)).max())
    assert np.allclose(np.asarray(lk1), np.asarray(lk2),
                       atol=1e-5 * lscale)


@pytest.mark.parametrize('num_pops', [1, 2, 3])
@pytest.mark.parametrize('kdim', [False, True])
def test_delta_sums_matches_sum_annotations(num_pops, kdim):
    """The fused annotation-sum kernel equals sum_annotations over the
    XLA-derived vi_delta (the compact hyper-delta update's input), for
    both the shared and the per-component (scale_se) natural mean."""
    from vilma_tpu.ops import kernels
    data = synthetic.synthetic_problem(num_loci=300, num_pops=num_pops,
                                       num_components=5, block_size=32,
                                       num_annotations=3, scale_se=kdim)
    st = synthetic.synthetic_state(data, seed=2, compact=True)
    _, _, vi_delta = engine._derive_params(data, st.error_scaling,
                                           st.nat_mu, st.hyper_delta)
    want = np.asarray(kernels.sum_annotations(vi_delta, data.annotations,
                                              data.num_annotations))
    got = np.asarray(engine._delta_sums_fused(
        data, st.error_scaling, st.nat_mu, st.hyper_delta, True))
    assert np.allclose(got, want, rtol=1e-9, atol=1e-9 * want.max())


def test_prologue_skips_materialized_states():
    """Materialized states (the P>=4 / direct-API path) must be
    unperturbed by enabling the kernel — the dispatch lives in the
    compact objective only."""
    data = synthetic.synthetic_problem(num_loci=128, num_pops=2,
                                       num_components=3, block_size=32,
                                       num_annotations=2, scale_se=True)
    st = synthetic.synthetic_state(data)
    blocks.enable_pallas(False)
    st1, pm1 = engine.outer_step(data, st, line_search_rate=2.0)
    try:
        blocks.enable_pallas(True, interpret=True)
        engine.outer_step.clear_cache()
        st2, pm2 = engine.outer_step(data, st, line_search_rate=2.0)
    finally:
        blocks.enable_pallas(False)
        engine.outer_step.clear_cache()
    assert np.allclose(np.asarray(pm1), np.asarray(pm2),
                       rtol=1e-7, atol=1e-10)


def test_compact_trajectory_pallas_interpret_matches_xla():
    """Six outer steps of a compact fit with every fused kernel enabled
    (matvec + prologue, interpret mode) track the XLA path — guards
    kernel enablement on TPU from silently changing fit trajectories."""
    data = synthetic.synthetic_problem(num_loci=256, num_pops=2,
                                       num_components=4, block_size=64,
                                       num_annotations=2)

    def run():
        st = synthetic.synthetic_state(data, compact=True)
        for _ in range(6):
            st, pm = engine.outer_step(data, st, line_search_rate=2.0)
        return np.asarray(pm), float(st.elbo), np.asarray(st.hyper_delta)

    pm_x, elbo_x, hd_x = run()
    try:
        blocks.enable_pallas(True, interpret=True)
        engine.outer_step.clear_cache()
        pm_p, elbo_p, hd_p = run()
    finally:
        blocks.enable_pallas(False)
        engine.outer_step.clear_cache()
    scale = np.abs(pm_x).max()
    assert np.allclose(pm_p, pm_x, atol=1e-8 * scale)
    assert abs(elbo_p - elbo_x) <= 1e-8 * abs(elbo_x)
    assert np.allclose(hd_p, hd_x, rtol=1e-7, atol=1e-10)


def test_scale_se_trajectory_pallas_interpret_matches_xla():
    """Outer steps of a --learn-scaling fit (the per-component [K, P, I]
    compact state) with every fused kernel enabled track the XLA path —
    running until the error-scaling EM has fired, so the fused-pv EM
    branch (engine._update_error_scaling_compact) is covered."""
    data = synthetic.synthetic_problem(num_loci=256, num_pops=2,
                                       num_components=4, block_size=64,
                                       num_annotations=2, scale_se=True)

    def run():
        st = synthetic.synthetic_state(data, compact=True)
        em_at = None
        for it in range(40):
            st, pm = engine.outer_step(data, st, line_search_rate=2.0)
            if em_at is None and not np.allclose(
                    np.asarray(st.error_scaling), 1.0):
                em_at = it
            if em_at is not None and it >= em_at + 2:
                break
        assert em_at is not None, 'EM never fired'
        return (np.asarray(pm), float(st.elbo),
                np.asarray(st.error_scaling))

    pm_x, elbo_x, es_x = run()
    try:
        blocks.enable_pallas(True, interpret=True)
        engine.outer_step.clear_cache()
        pm_p, elbo_p, es_p = run()
    finally:
        blocks.enable_pallas(False)
        engine.outer_step.clear_cache()
    scale = np.abs(pm_x).max()
    assert np.allclose(pm_p, pm_x, atol=1e-8 * scale)
    assert abs(elbo_p - elbo_x) <= 1e-8 * abs(elbo_x)
    assert np.allclose(es_p, es_x, rtol=1e-8)


def test_sharded_compact_prologue_matches_single_device():
    """Under the shard-local mesh layout the prologue runs per-device in
    one shard_map (scalar psum only); it must reproduce the single-device
    kernel path on the real slots and keep pad slots inert."""
    num_loci = 520
    rng = np.random.default_rng(11)
    factors, indices = [], []
    bounds = [(0, 96), (96, 256), (256, 400), (400, 520)]
    for a, b in bounds:
        keep = np.arange(a, b)
        m = rng.standard_normal((keep.size, keep.size))
        factors.append(lowrank.factor_block(
            X=m @ m.T + keep.size * np.eye(keep.size), t=1.0,
            check_symmetric=False))
        indices.append(keep)
    ld = blocks.pack(factors, indices, num_loci)

    std_errs = rng.uniform(0.01, 0.05, (2, num_loci))
    betas = rng.standard_normal((2, num_loci)) * std_errs * 2
    covs = [np.eye(2) * s for s in (1e-6, 1e-4, 1e-2)]
    annotations = np.zeros((num_loci, 2))
    annotations[np.arange(num_loci), rng.integers(0, 2, num_loci)] = 1

    def build(ld_mats, b, se, annot):
        return engine.build_model_data(
            b, se, ld_mats, annot, covs, scaled=False, scale_se=False,
            gwas_N=np.full(2, 1e5), init_hg=np.full(2, 0.3))

    try:
        blocks.enable_pallas(True, interpret=True)
        engine.outer_step.clear_cache()

        data1 = build([ld, ld], betas, std_errs, annotations)
        state1 = synthetic.synthetic_state(data1, compact=True)
        st1, pm1 = engine.outer_step(data1, state1, line_search_rate=2.0)

        lmap, L, ok = alignment.compute_layout([ld], num_loci, n_shards=8)
        assert ok
        lds = alignment.relayout_ld(ld, lmap, L, n_shards=8)
        assert lds.shard_count == 8
        mesh = mesh_mod.make_mesh(n_snp=8, n_comp=1)
        with jax.set_mesh(mesh):
            data2 = build(
                [lds, lds],
                alignment.relayout_rows(betas, lmap, L, fill=0.0),
                alignment.relayout_rows(std_errs, lmap, L, fill=1.0),
                alignment.relayout_annotations(annotations, lmap, L))
            state2 = synthetic.synthetic_state(data2, compact=True)
        state2 = dataclasses.replace(
            state2,
            nat_mu=jnp.zeros_like(state2.nat_mu).at[..., lmap].set(
                state1.nat_mu),
            hyper_delta=state1.hyper_delta, L=state1.L,
            error_scaling=state1.error_scaling, elbo=state1.elbo,
            running_elbo_delta=state1.running_elbo_delta)
        sdata = mesh_mod.shard_data(data2, mesh)
        sstate = mesh_mod.shard_state(state2, mesh)
        with jax.set_mesh(mesh):
            st2, pm2 = engine.outer_step(sdata, sstate,
                                         line_search_rate=2.0)
    finally:
        blocks.enable_pallas(False)
        engine.outer_step.clear_cache()

    assert np.allclose(np.asarray(pm2)[:, lmap], np.asarray(pm1),
                       rtol=1e-9, atol=1e-11)
    pads = np.setdiff1d(np.arange(L), lmap)
    assert np.all(np.asarray(pm2)[:, pads] == 0)
