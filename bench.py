"""Benchmark: VI coordinate-ascent iterations/s on the accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no perf numbers (BASELINE.md), so the baseline is
self-measured: the same jitted step on the host CPU in f64 (the
reference's precision; its numba kernels are also CPU machine code, so
CPU-f64 time is a reference-class anchor). The accelerator run uses the
f32 fast path. Iterations are chained on-device with lax.fori_loop so
per-call host/tunnel latency does not pollute the measurement.
"""
import json
import time

import numpy as np


def _build(dtype, backend_device, num_loci, num_components, block_size):
    import jax
    from vilma_tpu.utils import synthetic

    # build on the host CPU (f64-capable), then place on the target device
    with jax.default_device(jax.devices('cpu')[0]):
        data = synthetic.synthetic_problem(
            num_loci=num_loci, num_pops=2, num_components=num_components,
            block_size=block_size, num_annotations=4, dtype=dtype,
            rank_frac=0.5)
        state = synthetic.synthetic_state(data)
    data = jax.device_put(data, backend_device)
    state = jax.device_put(state, backend_device)
    return data, state


def _bench_steps(data, state, n_steps, device):
    import jax
    from jax import lax
    from vilma_tpu.inference import engine

    @jax.jit
    def run(data, st):
        def body(i, st):
            st, _ = engine.outer_step_impl(data, st, line_search_rate=2.0)
            return st
        return lax.fori_loop(0, n_steps, body, st)

    # warmup / compile
    out = run(data, state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(data, state)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return n_steps / dt


def main():
    import jax

    num_loci = 100_000
    num_components = 18
    block_size = 1024
    n_steps = 5

    cpu = jax.devices('cpu')[0]
    try:
        accel = [d for d in jax.devices() if d.platform != 'cpu'][0]
    except IndexError:
        accel = None

    jax.config.update('jax_enable_x64', True)
    data64, state64 = _build(np.float64, cpu, num_loci, num_components,
                             block_size)
    cpu_ips = _bench_steps(data64, state64, n_steps, cpu)

    if accel is not None:
        data32, state32 = _build(np.float32, accel, num_loci,
                                 num_components, block_size)
        accel_ips = _bench_steps(data32, state32, n_steps, accel)
        value = accel_ips
    else:
        value = cpu_ips

    print(json.dumps({
        'metric': 'vi_iterations_per_s_100k_snp_2pop_K18',
        'value': round(value, 3),
        'unit': 'iters/s',
        'vs_baseline': round(value / cpu_ips, 3),
    }))


if __name__ == '__main__':
    main()
