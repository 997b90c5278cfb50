"""f32 fast-path accuracy: the TPU precision mode must reproduce the f64
parity path within statistical tolerance (posterior SDs are ~SE-scale;
f32 noise must stay well below them)."""
import numpy as np

from vilma_tpu.inference import engine
from vilma_tpu.utils import synthetic


def _fit(dtype):
    data = synthetic.synthetic_problem(num_loci=2048, num_pops=2,
                                       num_components=6, block_size=256,
                                       num_annotations=2, dtype=dtype,
                                       scale_se=True)
    state = synthetic.synthetic_state(data)
    for _ in range(25):
        state, pm = engine.outer_step(data, state, line_search_rate=2.0)
    post = np.asarray(engine.posterior_mean(state.vi_mu, state.vi_delta))
    return post, float(state.elbo), np.asarray(state.error_scaling)


def test_f32_matches_f64():
    post64, elbo64, esc64 = _fit(np.float64)
    post32, elbo32, esc32 = _fit(np.float32)
    scale = np.abs(post64).max()
    assert np.allclose(post32, post64, atol=2e-3 * scale + 1e-7)
    assert np.allclose(esc32, esc64, rtol=1e-3)
    assert np.isclose(elbo32, elbo64, rtol=1e-4)
