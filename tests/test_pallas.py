"""Pallas kernel parity tests (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from vilma_tpu.ops.pallas import block_matvec as pk


def test_bucket_matvec_matches_einsum():
    rng = np.random.default_rng(0)
    B, P, R = 3, 128, 128
    u = rng.standard_normal((B, P, R)).astype(np.float32)
    s = rng.uniform(0.1, 2, (B, R)).astype(np.float32)
    d = rng.uniform(0, 1, (B, P)).astype(np.float32)
    x = rng.standard_normal((B, P)).astype(np.float32)
    got = np.asarray(pk.bucket_matvec(jnp.asarray(u), jnp.asarray(s),
                                      jnp.asarray(d), jnp.asarray(x),
                                      interpret=True))
    t = np.einsum('bpr,bp->br', u, x) * s
    expect = np.einsum('bpr,br->bp', u, t) + d * x
    assert np.allclose(got, expect, atol=1e-3)


def test_supported_policy():
    import jax
    # tests run with x64 enabled, where the kernel is always refused
    # (Mosaic rejects i64 program ids)
    assert not pk.supported(1024, 512, jnp.float32)
    with jax.enable_x64(False):
        # on CPU supported() still refuses (Mosaic is TPU-only); the
        # shape/dtype policy itself:
        assert pk.supported(1024, 512, jnp.float32) == (
            jax.default_backend() != 'cpu')
        assert pk.shape_supported(1024, 512, jnp.float32)
        assert not pk.shape_supported(8, 8, jnp.float32)
        assert not pk.shape_supported(1024, 512, jnp.float64)
        assert not pk.shape_supported(8192, 8192, jnp.float32)


def test_bucket_matvec_multi_matches_einsum():
    """Multi-RHS fused kernel (one U pass for C cohorts)."""
    rng = np.random.default_rng(1)
    B, C, P, R = 2, 3, 128, 256
    u = rng.standard_normal((B, P, R)).astype(np.float32)
    s = rng.uniform(0.1, 2, (B, R)).astype(np.float32)
    d = rng.uniform(0, 1, (B, P)).astype(np.float32)
    x = rng.standard_normal((B, C, P)).astype(np.float32)
    got = np.asarray(pk.bucket_matvec_multi(
        jnp.asarray(u), jnp.asarray(s), jnp.asarray(d), jnp.asarray(x),
        interpret=True))
    t = np.einsum('bpr,bcp->bcr', u, x) * s[:, None, :]
    expect = np.einsum('bpr,bcr->bcp', u, t) + d[:, None, :] * x
    assert np.allclose(got, expect, atol=1e-3)


def test_bucket_matvec_bf16_matches_xla_path():
    """bf16 U: the kernel must agree with blocks' bf16 einsum path
    (f32 accumulation, t re-cast to bf16 before the second dot)."""
    rng = np.random.default_rng(2)
    B, C, P, R = 2, 2, 128, 128
    u = jnp.asarray(rng.standard_normal((B, P, R)), dtype=jnp.bfloat16)
    s = jnp.asarray(rng.uniform(0.1, 2, (B, R)), dtype=jnp.float32)
    d = jnp.asarray(rng.uniform(0, 1, (B, P)), dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, C, P)), dtype=jnp.float32)
    got = np.asarray(pk.bucket_matvec_multi(u, s, d, x, interpret=True))
    t = jnp.einsum('bpr,bcp->bcr', u, x.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) * s[:, None, :]
    expect = np.asarray(
        jnp.einsum('bpr,bcr->bcp', u, t.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
        + d[:, None, :] * x)
    assert np.allclose(got, expect, atol=1e-2)
    assert pk.shape_supported(1024, 512, jnp.bfloat16)

def _make_packed(row_aligned, dtype=np.float32):
    from vilma_tpu.ops import blocks, lowrank
    rng = np.random.default_rng(7)
    factors, indices = [], []
    n = 512
    starts = [0, 128, 384] if row_aligned else [0, 130, 384]
    sizes = [128, 256, 128] if row_aligned else [130, 200, 128]
    for st, sz in zip(starts, sizes):
        a = rng.standard_normal((sz, sz))
        f = lowrank.factor_block(X=(a @ a.T) / sz + np.eye(sz), t=1.0,
                                 check_symmetric=False)
        factors.append(f)
        indices.append(np.arange(st, st + sz))
    return blocks.pack(factors, indices, n, dtype=dtype)


def test_dot_integration_pallas_interpret():
    """Full dot/dot_multi through the Pallas kernel (interpret mode):
    the gather/scatter + row-aligned routing around the kernel must
    produce the XLA path's values on both layouts."""
    from vilma_tpu.ops import blocks
    rng = np.random.default_rng(8)
    for aligned in (True, False):
        ld = _make_packed(aligned)
        assert ld.row_aligned == aligned
        x = jnp.asarray(rng.standard_normal(ld.n), dtype=jnp.float32)
        x2 = jnp.stack([x, 0.5 * x - 1.0])
        blocks.enable_pallas(False)
        want = np.asarray(blocks.dot(ld, x))
        want2 = np.asarray(blocks.dot_multi(ld, x2))
        try:
            blocks.enable_pallas(True, interpret=True)
            got = np.asarray(blocks.dot(ld, x))
            got2 = np.asarray(blocks.dot_multi(ld, x2))
        finally:
            blocks.enable_pallas(False)
        assert np.allclose(got, want, atol=1e-4), aligned
        assert np.allclose(got2, want2, atol=1e-4), aligned

def test_engine_fit_pallas_interpret_matches_xla():
    """Five outer VI steps with the Pallas matvec enabled (interpret)
    must track the XLA path — guards kernel enablement on TPU from
    silently changing fit trajectories."""
    from vilma_tpu.inference import engine
    from vilma_tpu.ops import blocks
    from vilma_tpu.utils import synthetic

    data = synthetic.synthetic_problem(num_loci=256, num_pops=2,
                                       num_components=3, block_size=128,
                                       num_annotations=2,
                                       dtype=np.float32)

    def run():
        st = synthetic.synthetic_state(data)
        for _ in range(5):
            st, pm = engine.outer_step(data, st, line_search_rate=2.0)
        return np.asarray(pm), float(st.elbo)

    pm_x, elbo_x = run()
    try:
        blocks.enable_pallas(True, interpret=True)
        engine.outer_step.clear_cache()
        pm_p, elbo_p = run()
    finally:
        blocks.enable_pallas(False)
        engine.outer_step.clear_cache()
    scale = np.abs(pm_x).max()
    assert np.allclose(pm_p, pm_x, atol=1e-5 * scale)
    assert abs(elbo_p - elbo_x) <= 1e-5 * abs(elbo_x)
