"""Micro-benchmark of the block-matvec layers on the accelerator.

Separates (a) the raw bucketed contraction (no permutation), (b) the
full row-aligned dot, and (c) the Pallas fused kernel, reporting
effective HBM bandwidth against the known traffic — the evidence base
for PARITY.md's kernel decisions (XLA two-pass vs Pallas single-pass).

Timing methodology: each case is chained on-device with lax.fori_loop,
the output renormalized and fed back as the next input (serializing the
chain and defeating loop-invariant hoisting), with ONE synchronizing
scalar fetch per chain. Short per-call timing through the remote-TPU
tunnel is polluted by the ~30-60 ms fetch RTT (see BASELINE.md
"Measurement note"); chains are sized to ~1.5 s of device work so the
RTT amortizes below ~3%.
"""
import functools
import time

import numpy as np

print = functools.partial(print, flush=True)  # noqa: A001


def _make_timer():
    import jax
    import jax.numpy as jnp
    from jax import lax

    def timeit(fn, x0, *, target_s=1.5, probe_n=20):
        """Best per-iteration seconds for x -> fn(x) chained on device.

        fn must map x to a same-shaped y; the chain renormalizes y each
        step (a negligible reduction next to the LD traffic) so values
        stay finite over hundreds of applications.
        """
        @functools.partial(jax.jit, static_argnums=0)
        def chain(n, x):
            def body(i, x):
                y = fn(x)
                scale = lax.rsqrt(jnp.mean(jnp.square(y))
                                  + jnp.asarray(1e-30, y.dtype))
                return y * scale
            return lax.fori_loop(0, n, body, x)

        def run(n, x):
            t0 = time.perf_counter()
            out = chain(n, x)
            float(np.asarray(out).ravel()[0])    # sync through the tunnel
            return time.perf_counter() - t0

        run(probe_n, x0)                         # compile + warmup
        # the probe estimate includes the full tunnel RTT / probe_n, which
        # undersizes chains for sub-ms kernels and leaves their reported
        # times RTT-inflated; subtract the measured fetch RTT, then grow
        # the chain until one rep's wall time actually reaches the target
        rtt = min(run(0, x0) for _ in range(3))
        t_est = max((run(probe_n, x0) - rtt) / probe_n, 1e-9)
        n = max(probe_n, int(target_s / t_est))
        n = 1 << (n - 1).bit_length()            # round up to a power of
        # two so repeated runs reuse the persistent compile cache
        wall = run(n, x0)
        while wall < 0.8 * target_s and n < (1 << 20):
            n *= 2
            wall = run(n, x0)
        best = min(wall, *(run(n, x0) for _ in range(2)))
        return (best - rtt) / n

    return timeit


def main():
    import jax
    import jax.numpy as jnp
    # NOTE: x64 deliberately OFF — with jax_enable_x64 the Mosaic TPU
    # compiler rejects the Pallas kernel (i64 func.return legalization)
    import bench
    from vilma_tpu.ops import blocks

    bench._enable_compile_cache()
    accel = [d for d in jax.devices() if d.platform != 'cpu']
    device = accel[0] if accel else jax.devices()[0]
    print('device:', device)
    timeit = _make_timer()

    with jax.default_device(jax.devices('cpu')[0]):
        ld = bench._cached_ld(np.float32)
    ld = jax.device_put(ld, device)
    n = ld.n
    x = jax.device_put(jnp.asarray(np.random.default_rng(0)
                                   .standard_normal(n)
                                   .astype(np.float32)), device)

    u_bytes = sum(int(np.prod(bk.u.shape)) * bk.u.dtype.itemsize
                  for bk in ld.buckets)
    print(f'U payload: {u_bytes / 1e6:.0f} MB '
          f'({[tuple(bk.u.shape) for bk in ld.buckets]})')

    # (a) raw bucketed two-pass contraction on pre-gathered inputs
    big = max(ld.buckets, key=lambda b: int(np.prod(b.u.shape)))
    xb = jax.device_put(
        jnp.asarray(np.random.default_rng(1).standard_normal(
            (big.num_blocks, big.pmax)).astype(np.float32)), device)

    def raw(xb, u=big.u, s=big.s, d=big.d):
        t = jnp.einsum('bpr,bp->br', u, xb) * s
        return jnp.einsum('bpr,br->bp', u, t) + d * xb

    t_raw = timeit(raw, xb)
    big_bytes = int(np.prod(big.u.shape)) * big.u.dtype.itemsize
    print(f'raw bucket two-pass  : {t_raw * 1e3:7.3f} ms  '
          f'({2 * big_bytes / t_raw / 1e9:6.1f} GB/s counting U twice, '
          f'{big_bytes / t_raw / 1e9:6.1f} once)')

    # (a3) C-vector batched: C matvecs sharing one U read (the
    # multi-cohort trick when populations share an LD panel)
    for C in (2, 4):
        xc = jax.device_put(
            jnp.asarray(np.random.default_rng(2).standard_normal(
                (big.num_blocks, big.pmax, C)).astype(np.float32)),
            device)

        def raw_multi(xc, u=big.u, s=big.s, d=big.d):
            t = jnp.einsum('bpr,bpc->brc', u, xc) * s[..., None]
            return jnp.einsum('bpr,brc->bpc', u, t) + d[..., None] * xc

        t_mc = timeit(raw_multi, xc)
        print(f'raw two-pass x{C} rhs  : {t_mc * 1e3:7.3f} ms  '
              f'({t_mc / C * 1e3:6.3f} ms per vector)')

    # (b) Pallas fused single-pass on the same bucket
    from vilma_tpu.ops.pallas import block_matvec as pk
    if accel and pk.supported(big.pmax, big.rmax, big.u.dtype):
        t_pal = timeit(
            lambda xb: pk.bucket_matvec(big.u, big.s, big.d, xb), xb)
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
            t_pm = timeit(
                lambda xc: pk.bucket_matvec_multi(big.u, big.s, big.d,
                                                  xc), xcm)
            print(f'pallas multi x{C} rhs  : {t_pm * 1e3:7.3f} ms  '
                  f'({t_pm / C * 1e3:6.3f} ms per vector)')

    # (b3) bf16 U: XLA two-pass vs Pallas (the production
    # fit --ld-precision bf16 traffic)
    if accel and big.u.dtype == jnp.float32:
        u16 = jax.device_put(jnp.asarray(big.u, jnp.bfloat16), device)

        def raw_bf16(xb, u=u16, s=big.s, d=big.d):
            t = jnp.einsum('bpr,bp->br', u, xb.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32) * s
            return (jnp.einsum('bpr,br->bp', u, t.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                    + d * xb)

        t_r16 = timeit(raw_bf16, xb)
        print(f'raw two-pass bf16 U  : {t_r16 * 1e3:7.3f} ms  '
              f'({big_bytes // 2 / t_r16 / 1e9:6.1f} GB/s, U once)')
        if pk.supported(big.pmax, big.rmax, jnp.bfloat16):
            t_p16 = timeit(
                lambda xb: pk.bucket_matvec(u16, big.s, big.d, xb), xb)
            print(f'pallas bf16 U        : {t_p16 * 1e3:7.3f} ms  '
                  f'({big_bytes // 2 / t_p16 / 1e9:6.1f} GB/s, U once)')
            xcm2 = jax.device_put(
                jnp.asarray(np.random.default_rng(3).standard_normal(
                    (big.num_blocks, 2, big.pmax)).astype(np.float32)),
                device)

            def raw_bf16_m2(xc, u=u16, s=big.s, d=big.d):
                t = jnp.einsum('bpr,bcp->bcr', u,
                               xc.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32) * s[:, None]
                return (jnp.einsum('bpr,bcr->bcp', u,
                                   t.astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32)
                        + d[:, None] * xc)

            t_r16m = timeit(raw_bf16_m2, xcm2)
            print(f'raw bf16 x2 rhs      : {t_r16m * 1e3:7.3f} ms')
            t_p16m = timeit(
                lambda xc: pk.bucket_matvec_multi(u16, big.s, big.d, xc),
                xcm2)
            print(f'pallas bf16 x2 rhs   : {t_p16m * 1e3:7.3f} ms')

    # (c) full dot, XLA path (row-aligned gather/scatter included)
    blocks.enable_pallas(False)
    t_dot = timeit(lambda x: blocks.dot(ld, x), x)
    print(f'full dot (XLA)       : {t_dot * 1e3:7.3f} ms  '
          f'(row_aligned={ld.row_aligned})')

    # (d) full dot with the Pallas kernel enabled
    if accel:
        blocks.enable_pallas(True)
        t_dotp = timeit(lambda x: blocks.dot(ld, x), x)
        blocks.enable_pallas(False)
        print(f'full dot (Pallas)    : {t_dotp * 1e3:7.3f} ms')

    # (f) the shared-panel multi-RHS full path the engine actually uses
    # for cohorts with one LD matrix (blocks.dot_multi)
    x2 = jnp.stack([x, x * 0.5])
    t_pm2 = timeit(lambda x2: blocks.dot_multi(ld, x2), x2)
    print(f'2-pop dot_multi (XLA): {t_pm2 * 1e3:7.3f} ms')
    if accel:
        blocks.enable_pallas(True)
        t_pm2p = timeit(lambda x2: blocks.dot_multi(ld, x2), x2)
        blocks.enable_pallas(False)
        print(f'2-pop dot_multi (Pal): {t_pm2p * 1e3:7.3f} ms')


if __name__ == '__main__':
    main()
