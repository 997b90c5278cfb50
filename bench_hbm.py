"""Raw HBM read-bandwidth probe for the attached accelerator.

Establishes the device's true large-footprint streaming ceiling — the
denominator for every "fraction of speed of light" claim — using the
long-chain timing methodology (one on-device lax.fori_loop, a single
synchronizing scalar fetch; see PARITY.md on tunnel-RTT pollution).

Probes a simple full-array reduction at several footprints: small
enough to expose cache/locality effects, large enough to be strictly
HBM-streaming (the 100K-SNP fit's working set vs the 1M/6M ones).
"""
import functools
import os
import time

import numpy as np

print = functools.partial(print, flush=True)  # noqa: A001


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    accel = [d for d in jax.devices() if d.platform != 'cpu']
    device = accel[0] if accel else jax.devices()[0]
    print('device:', device)

    chain = int(os.environ.get('HBM_CHAIN', '30'))
    sizes = tuple(int(s) for s in os.environ.get(
        'HBM_SIZES', '64,256,1024,4096').split(','))
    for mb in sizes:
        n = mb * 1024 * 1024 // 4
        x = jax.device_put(
            jnp.asarray(np.random.default_rng(0)
                        .standard_normal(n).astype(np.float32)), device)

        @jax.jit
        def run(x):
            # chain the reductions so one dispatch covers `chain` full
            # passes; carry feeds back so XLA cannot elide any pass
            def body(i, acc):
                return acc + jnp.sum(x * (1.0 + acc * 1e-30))
            return lax.fori_loop(0, chain, body, jnp.float32(0))

        float(run(x))                      # compile + warmup
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x)
            float(out)
            best = min(best, time.perf_counter() - t0)
        bw = mb / 1024 * chain / best      # GiB read per second
        print(f'{mb:5d} MiB footprint: {bw:7.1f} GiB/s '
              f'({best / chain * 1e3:.2f} ms/pass)')
        del x


if __name__ == '__main__':
    main()
