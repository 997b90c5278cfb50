"""K-chunked compact evaluation vs the materializing XLA staging route.

Production mixture grids can exceed what any [K, I]-materializing
evaluation fits in device memory (a 3-cohort -K 12 CLI grid is 42,999
PSD components — one f32[K, I] buffer is 17 GB at 100K SNPs; the
reference materializes [I, K] vi_delta and more, so such grids are
out of reach for it at any scale). The chunked route accumulates every
K-reduction with the online-softmax rescaling identity in O(kc * I)
memory (engine._chunked_moments). These tests pin its equality with
the plain route — the only semantic difference is the epsilon
probability clamp (kernels.invert_nat_cat_2D), whose effect is below
1e-10 at f64.
"""
import dataclasses

import numpy as np
import pytest

from vilma_tpu.inference import engine
from vilma_tpu.utils import synthetic


@pytest.fixture
def force_chunked(monkeypatch):
    monkeypatch.setattr(engine, '_XLA_KI_CHUNK_BYTES', 0)
    engine.outer_step.clear_cache()
    yield
    engine.outer_step.clear_cache()


def _problem(num_pops=2, K=5, scale_se=False, seed=11):
    data = synthetic.synthetic_problem(num_loci=384, num_pops=num_pops,
                                       num_components=K, block_size=32,
                                       num_annotations=3,
                                       scale_se=scale_se)
    st = synthetic.synthetic_state(data, seed=seed, compact=True,
                                   epoch_b=4 if scale_se else None)
    return data, st


@pytest.mark.parametrize('num_pops', [1, 2, 3])
def test_chunked_objective_matches_plain(num_pops, monkeypatch):
    data, st = _problem(num_pops=num_pops, K=7)
    obj_p, pm_p, lk_p = engine._objective_compact(data, st, st.nat_mu,
                                                  st.hyper_delta)
    monkeypatch.setattr(engine, '_XLA_KI_CHUNK_BYTES', 0)
    # force a chunk width smaller than K so several chunks + padding run
    monkeypatch.setattr(engine, '_chunk_kc', lambda *a: 3)
    monkeypatch.setattr(engine, '_use_chunked', lambda *a: True)
    obj_c, pm_c, lk_c = engine._objective_compact(data, st, st.nat_mu,
                                                  st.hyper_delta)
    assert np.isclose(float(obj_p), float(obj_c), rtol=1e-10)
    assert np.allclose(np.asarray(pm_p), np.asarray(pm_c), rtol=1e-9,
                       atol=1e-12)
    assert np.allclose(np.asarray(lk_p), np.asarray(lk_c), rtol=1e-9,
                       atol=1e-12)


def test_chunked_objective_epoch_matches_plain(monkeypatch):
    data, st = _problem(num_pops=2, K=6, scale_se=True)
    # advance once so the epoch machinery has a live history
    st, _ = engine.outer_step(data, st, line_search_rate=2.0)
    obj_p, pm_p, lk_p = engine._objective_epoch(data, st, st.nat_mu,
                                                st.nat_hist_c,
                                                st.hyper_delta)
    monkeypatch.setattr(engine, '_chunk_kc', lambda *a: 4)
    monkeypatch.setattr(engine, '_use_chunked', lambda *a: True)
    obj_c, pm_c, lk_c = engine._objective_epoch(data, st, st.nat_mu,
                                                st.nat_hist_c,
                                                st.hyper_delta)
    assert np.isclose(float(obj_p), float(obj_c), rtol=1e-10)
    assert np.allclose(np.asarray(pm_p), np.asarray(pm_c), rtol=1e-9,
                       atol=1e-12)
    assert np.allclose(np.asarray(lk_p), np.asarray(lk_c), rtol=1e-9,
                       atol=1e-12)


def test_chunked_delta_sums_matches_plain(monkeypatch):
    from vilma_tpu.ops import kernels
    data, st = _problem(num_pops=2, K=7)
    _, _, vi_delta = engine._derive_params(data, st.error_scaling,
                                           st.nat_mu, st.hyper_delta)
    want = kernels.sum_annotations(vi_delta, data.annotations,
                                   data.num_annotations)
    monkeypatch.setattr(engine, '_chunk_kc', lambda *a: 3)
    got = engine._delta_sums_chunked(data, st, st.nat_mu,
                                     st.hyper_delta)
    assert got.shape == want.shape
    assert np.allclose(np.asarray(want), np.asarray(got), rtol=1e-9,
                       atol=1e-12)


@pytest.mark.parametrize('scale_se', [False, True])
def test_chunked_trajectory_matches_plain(scale_se, force_chunked,
                                          monkeypatch):
    """Full outer steps under forced chunking follow the plain
    trajectory (the chunked route feeds the line search, the hyper
    update, and — for the epoch state — the EM post-vars)."""
    monkeypatch.setattr(engine, '_chunk_kc', lambda *a: 3)
    monkeypatch.setattr(engine, '_use_chunked',
                        lambda data, nat: nat.ndim == 2)
    data, st_c = _problem(num_pops=2, K=6, scale_se=scale_se, seed=5)
    trail_c = []
    for _ in range(5):
        st_c, pm = engine.outer_step(data, st_c, line_search_rate=2.0)
        trail_c.append((float(st_c.elbo), np.asarray(pm)))

    monkeypatch.setattr(engine, '_use_chunked', lambda *a: False)
    engine.outer_step.clear_cache()
    data, st_p = _problem(num_pops=2, K=6, scale_se=scale_se, seed=5)
    for i in range(5):
        st_p, pm = engine.outer_step(data, st_p, line_search_rate=2.0)
        assert np.isclose(trail_c[i][0], float(st_p.elbo), rtol=1e-9)
        assert np.allclose(trail_c[i][1], np.asarray(pm), rtol=1e-8,
                           atol=1e-11)
