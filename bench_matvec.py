"""Micro-benchmark of the block-matvec layers on the accelerator.

Separates (a) the raw bucketed contraction (no permutation), (b) the
full row-aligned dot, and (c) the Pallas fused kernel, reporting
effective HBM bandwidth against the known traffic — the evidence base
for PARITY.md's kernel decisions (XLA two-pass vs Pallas single-pass).
"""
import functools
import time

import numpy as np

print = functools.partial(print, flush=True)  # noqa: A001


def main():
    import jax
    import jax.numpy as jnp
    # NOTE: x64 deliberately OFF — with jax_enable_x64 the Mosaic TPU
    # compiler rejects the Pallas kernel (i64 func.return legalization)
    import bench
    from vilma_tpu.ops import blocks

    accel = [d for d in jax.devices() if d.platform != 'cpu']
    device = accel[0] if accel else jax.devices()[0]
    print('device:', device)

    with jax.default_device(jax.devices('cpu')[0]):
        ld = bench._cached_ld(np.float32)
    ld = jax.device_put(ld, device)
    n = ld.n
    x = jax.device_put(jnp.asarray(np.random.default_rng(0)
                                   .standard_normal(n)
                                   .astype(np.float32)), device)

    u_bytes = sum(int(np.prod(bk.u.shape)) * 4 for bk in ld.buckets)
    print(f'U payload: {u_bytes / 1e6:.0f} MB '
          f'({[tuple(bk.u.shape) for bk in ld.buckets]})')

    def timeit(fn, *args, reps=30):
        out = fn(*args)
        float(np.asarray(out).ravel()[0])
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*args)
            float(np.asarray(out).ravel()[0])
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    # (a) raw bucketed two-pass contraction on pre-gathered inputs
    big = max(ld.buckets, key=lambda b: int(np.prod(b.u.shape)))
    xb = jax.device_put(
        jnp.asarray(np.random.default_rng(1).standard_normal(
            (big.num_blocks, big.pmax)).astype(np.float32)), device)

    @jax.jit
    def raw(u, s, d, xb):
        t = jnp.einsum('bpr,bp->br', u, xb) * s
        return jnp.einsum('bpr,br->bp', u, t) + d * xb

    t_raw = timeit(raw, big.u, big.s, big.d, xb)
    big_bytes = int(np.prod(big.u.shape)) * 4
    print(f'raw bucket two-pass  : {t_raw * 1e3:7.3f} ms  '
          f'({2 * big_bytes / t_raw / 1e9:6.1f} GB/s counting U twice, '
          f'{big_bytes / t_raw / 1e9:6.1f} once)')

    # (a2) two-pass with an 8-wide zero-padded RHS: GEMV -> narrow GEMM
    # (TPU MXU lowering of batched matvecs can starve bandwidth)
    @jax.jit
    def raw_wide(u, s, d, xb):
        xw = jnp.zeros(xb.shape + (8,), xb.dtype).at[..., 0].set(xb)
        t = jnp.einsum('bpr,bpc->brc', u, xw) * s[..., None]
        return jnp.einsum('bpr,brc->bpc', u, t)[..., 0] + d * xb

    t_ww = timeit(raw_wide, big.u, big.s, big.d, xb)
    print(f'raw two-pass w8 rhs  : {t_ww * 1e3:7.3f} ms  '
          f'({2 * big_bytes / t_ww / 1e9:6.1f} GB/s counting U twice)')

    # (a3) C-vector batched: C matvecs sharing one U read (the
    # multi-cohort trick when populations share an LD panel)
    for C in (2, 4):
        xc = jax.device_put(
            jnp.asarray(np.random.default_rng(2).standard_normal(
                (big.num_blocks, big.pmax, C)).astype(np.float32)),
            device)

        @jax.jit
        def raw_multi(u, s, d, xc):
            t = jnp.einsum('bpr,bpc->brc', u, xc) * s[..., None]
            return jnp.einsum('bpr,brc->bpc', u, t) + d[..., None] * xc

        t_mc = timeit(raw_multi, big.u, big.s, big.d, xc)
        print(f'raw two-pass x{C} rhs  : {t_mc * 1e3:7.3f} ms  '
              f'({t_mc / C * 1e3:6.3f} ms per vector)')

    # (b) Pallas fused single-pass on the same bucket
    from vilma_tpu.ops.pallas import block_matvec as pk
    if accel and pk.supported(big.pmax, big.rmax, big.u.dtype):
        pallas_fn = jax.jit(pk.bucket_matvec)
        t_pal = timeit(pallas_fn, big.u, big.s, big.d, xb)
        print(f'pallas fused 1-pass  : {t_pal * 1e3:7.3f} ms  '
              f'({big_bytes / t_pal / 1e9:6.1f} GB/s, U read once)')
    else:
        print('pallas fused 1-pass  : unsupported here')

    # (b2) Pallas multi-RHS vs the XLA multi-RHS at the engine's C=2
    if accel and pk.supported(big.pmax, big.rmax, big.u.dtype):
        for C in (2, 4):
            xcm = jax.device_put(
                jnp.asarray(np.random.default_rng(3).standard_normal(
                    (big.num_blocks, C, big.pmax)).astype(np.float32)),
                device)
            pal_multi = jax.jit(pk.bucket_matvec_multi)
            t_pm = timeit(pal_multi, big.u, big.s, big.d, xcm)
            print(f'pallas multi x{C} rhs  : {t_pm * 1e3:7.3f} ms  '
                  f'({t_pm / C * 1e3:6.3f} ms per vector)')

    # (b3) bf16 U: XLA two-pass vs Pallas (the production
    # fit --ld-precision bf16 traffic)
    if accel:
        u16 = jax.device_put(jnp.asarray(big.u, jnp.bfloat16), device)

        @jax.jit
        def raw_bf16(u, s, d, xb):
            t = jnp.einsum('bpr,bp->br', u, xb.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32) * s
            return (jnp.einsum('bpr,br->bp', u, t.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                    + d * xb)

        t_r16 = timeit(raw_bf16, u16, big.s, big.d, xb)
        print(f'raw two-pass bf16 U  : {t_r16 * 1e3:7.3f} ms  '
              f'({big_bytes // 2 / t_r16 / 1e9:6.1f} GB/s, U once)')
        if pk.supported(big.pmax, big.rmax, jnp.bfloat16):
            t_p16 = timeit(jax.jit(pk.bucket_matvec), u16, big.s, big.d,
                           xb)
            print(f'pallas bf16 U        : {t_p16 * 1e3:7.3f} ms')

    # (c) full dot, XLA path (row-aligned gather/scatter included)
    blocks.enable_pallas(False)
    dot_x = jax.jit(blocks.dot)
    t_dot = timeit(dot_x, ld, x)
    print(f'full dot (XLA)       : {t_dot * 1e3:7.3f} ms  '
          f'(row_aligned={ld.row_aligned})')

    # (d) full dot with the Pallas kernel enabled
    if accel:
        blocks.enable_pallas(True)
        dot_p = jax.jit(blocks.dot)
        t_dotp = timeit(dot_p, ld, x)
        blocks.enable_pallas(False)
        print(f'full dot (Pallas)    : {t_dotp * 1e3:7.3f} ms')

    # (e) the engine-level pair (2 populations, scaled)
    @jax.jit
    def pair(ld, x):
        y0 = blocks.dot(ld, x)
        y1 = blocks.dot(ld, x * 0.5)
        return y0 + y1

    t_pair = timeit(pair, ld, x)
    print(f'2-pop pair (XLA)     : {t_pair * 1e3:7.3f} ms')

    # (f) the shared-panel multi-RHS full path the engine actually uses
    # for cohorts with one LD matrix (blocks.dot_multi)
    x2 = jnp.stack([x, x * 0.5])

    def _pair_multi(ld, x2):
        return blocks.dot_multi(ld, x2).sum(axis=0)

    t_pm2 = timeit(jax.jit(_pair_multi), ld, x2)
    print(f'2-pop dot_multi (XLA): {t_pm2 * 1e3:7.3f} ms')
    if accel:
        blocks.enable_pallas(True)
        t_pm2p = timeit(jax.jit(_pair_multi), ld, x2)
        blocks.enable_pallas(False)
        print(f'2-pop dot_multi (Pal): {t_pm2p * 1e3:7.3f} ms')


if __name__ == '__main__':
    main()
