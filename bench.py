"""Benchmark: VI coordinate-ascent iterations/s on the accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no perf numbers (BASELINE.md), so the baseline is
self-measured: the same jitted step on the host CPU in f64 (the
reference's precision; its numba kernels are also CPU machine code, so
CPU-f64 time is a reference-class anchor). The accelerator run uses the
f32 fast path. Iterations are chained on-device with lax.fori_loop so
per-call host/tunnel latency does not pollute the measurement.

The synthetic problem's LD eigendecompositions are cached on disk
(.bench_cache/) — the one-time LAPACK factorization of ~100 blocks takes
minutes and is not what this benchmark measures.
"""
import json
import os
import time

import numpy as np

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         '.bench_cache')

# BENCH_SIZE=1m selects the genome-scale configuration; BENCH_PALLAS=1
# enables the fused Pallas block-matvec kernel on TPU.
if os.environ.get('BENCH_SIZE', '100k') == '1m':
    NUM_LOCI = 1_000_000
    METRIC = 'vi_iterations_per_s_1m_snp_2pop_K18'
else:
    NUM_LOCI = 100_000
    METRIC = 'vi_iterations_per_s_100k_snp_2pop_K18'
NUM_COMPONENTS = 18
BLOCK_SIZE = 1024
RANK_FRAC = 0.5
N_STEPS = 5


def _ld_u_dtype():
    # BENCH_LD_DTYPE=bf16 stores the LD eigenvector tensors in bfloat16
    # (halves the dominant HBM traffic; see fit --ld-precision)
    if os.environ.get('BENCH_LD_DTYPE') == 'bf16':
        import ml_dtypes
        return ml_dtypes.bfloat16
    return None


def _cached_ld(dtype):
    from vilma_tpu.ops import blocks, lowrank

    tag = f'ld_{NUM_LOCI}_{BLOCK_SIZE}_{RANK_FRAC}'
    path = os.path.join(CACHE_DIR, tag + '.npz')
    if os.path.exists(path):
        z = np.load(path)
        nb = int(z['num_blocks'])
        factors = [lowrank.LowRankFactor(u=z[f'u{i}'], s=z[f's{i}'],
                                         d=z[f'd{i}'],
                                         rank=int(z[f'r{i}']))
                   for i in range(nb)]
        indices = [z[f'ix{i}'] for i in range(nb)]
        return blocks.pack(factors, indices, NUM_LOCI, dtype=dtype,
                           u_dtype=_ld_u_dtype())

    rng = np.random.default_rng(0)
    factors, indices = [], []
    start = 0
    while start < NUM_LOCI:
        n = min(BLOCK_SIZE, NUM_LOCI - start)
        rho = rng.uniform(0.3, 0.95)
        idx = np.abs(np.subtract.outer(np.arange(n), np.arange(n)))
        f = lowrank.factor_block(X=rho ** idx, t=1.0,
                                 check_symmetric=False)
        r = max(1, int(f.r * RANK_FRAC))
        order = np.argsort(f.s)[::-1][:r]
        f = lowrank.LowRankFactor(u=np.ascontiguousarray(f.u[:, order]),
                                  s=f.s[order], d=f.d, rank=int(r))
        factors.append(f)
        indices.append(np.arange(start, start + n))
        start += n
    os.makedirs(CACHE_DIR, exist_ok=True)
    payload = {'num_blocks': len(factors)}
    for i, (f, ix) in enumerate(zip(factors, indices)):
        payload.update({f'u{i}': f.u, f's{i}': f.s, f'd{i}': f.d,
                        f'r{i}': f.rank, f'ix{i}': ix})
    np.savez(path, **payload)
    from vilma_tpu.ops import blocks
    return blocks.pack(factors, indices, NUM_LOCI, dtype=dtype,
                       u_dtype=_ld_u_dtype())


def _build(dtype, device):
    import jax
    from vilma_tpu.inference import engine
    from vilma_tpu.utils import synthetic

    with jax.default_device(jax.devices('cpu')[0]):
        ld = _cached_ld(dtype)
        rng = np.random.default_rng(1)
        P = 2
        std_errs = rng.uniform(0.01, 0.05, (P, NUM_LOCI))
        betas = rng.standard_normal((P, NUM_LOCI)) * std_errs * 2
        scales = np.exp(np.linspace(np.log(1e-6), np.log(1e-2),
                                    NUM_COMPONENTS))
        covs = []
        for k in range(NUM_COMPONENTS):
            a = rng.standard_normal((P, P))
            corr = 0.3 * (a @ a.T) + P * np.eye(P)
            d = 1 / np.sqrt(np.diag(corr))
            covs.append(scales[k] * (corr * np.outer(d, d)))
        annotations = np.zeros((NUM_LOCI, 4))
        annotations[np.arange(NUM_LOCI),
                    rng.integers(0, 4, NUM_LOCI)] = 1
        data = engine.build_model_data(
            betas.astype(dtype), std_errs.astype(dtype), [ld, ld],
            annotations, covs, scaled=False, scale_se=False,
            gwas_N=np.full(P, 1e5), init_hg=np.full(P, 0.3), dtype=dtype)
        state = synthetic.synthetic_state(data)
    data = jax.device_put(data, device)
    state = jax.device_put(state, device)
    return data, state


def _bench_steps(data, state, n_steps):
    import jax
    from jax import lax
    from vilma_tpu.inference import engine

    @jax.jit
    def run(data, st):
        def body(i, st):
            st, _ = engine.outer_step_impl(data, st, line_search_rate=2.0)
            return st
        return lax.fori_loop(0, n_steps, body, st)

    # NOTE: block_until_ready does not reliably synchronize through
    # remote-TPU tunnels; fetching a scalar to the host does.
    out = run(data, state)       # compile + warmup
    float(out.elbo)
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(data, out)
        float(out.elbo)
        best = min(best, time.perf_counter() - t0)
    return n_steps / best


def accel_main():
    """Accelerator leg, run in a subprocess so a hung remote compile
    cannot take down the whole benchmark."""
    import jax
    _enable_compile_cache()
    jax.config.update('jax_enable_x64', True)
    accel = [d for d in jax.devices() if d.platform != 'cpu'][0]
    if os.environ.get('BENCH_PALLAS') == '1':
        from vilma_tpu.ops import blocks
        blocks.enable_pallas(True)
    data32, state32 = _build(np.float32, accel)
    print('ACCEL_IPS', _bench_steps(data32, state32, N_STEPS), flush=True)


def _run_accel_subprocess(timeout_s=None):
    if timeout_s is None:
        # the 1M config spends ~25 min in host-side pack + tunnel
        # transfer before a single step runs
        timeout_s = 2900 if NUM_LOCI >= 1_000_000 else 1500
    import subprocess
    import sys
    env = dict(os.environ)
    env['PYTHONPATH'] = (os.path.dirname(os.path.abspath(__file__))
                         + os.pathsep + env.get('PYTHONPATH', ''))
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--accel'],
            capture_output=True, text=True, timeout=timeout_s, env=env)
        for line in out.stdout.splitlines():
            if line.startswith('ACCEL_IPS'):
                return float(line.split()[1])
    except subprocess.TimeoutExpired:
        pass
    return None


def _enable_compile_cache():
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    except Exception:
        pass


def main():
    import jax
    _enable_compile_cache()
    jax.config.update('jax_enable_x64', True)

    cpu = jax.devices('cpu')[0]
    have_accel = any(d.platform != 'cpu' for d in jax.devices())

    # BENCH_CPU_IPS short-circuits the (slow, deterministic) host-CPU f64
    # baseline leg with a previously measured value, so the accelerator
    # leg can be re-run alone; measured values are recorded in BASELINE.md
    if os.environ.get('BENCH_CPU_IPS'):
        cpu_ips = float(os.environ['BENCH_CPU_IPS'])
    else:
        data64, state64 = _build(np.float64, cpu)
        cpu_ips = _bench_steps(data64, state64, N_STEPS)

    value = cpu_ips
    if have_accel:
        accel_ips = _run_accel_subprocess()
        if accel_ips is not None:
            value = accel_ips

    print(json.dumps({
        'metric': METRIC,
        'value': round(value, 3),
        'unit': 'iters/s',
        'vs_baseline': round(value / cpu_ips, 3),
    }))


if __name__ == '__main__':
    import sys
    if '--accel' in sys.argv:
        accel_main()
    else:
        main()
