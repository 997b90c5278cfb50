"""One-off: decompose the genome-scale bench setup cost.

Stages timed (mirrors bench._build): packed-LD cache load, synthetic
sumstats, LD host->device transfer, on-device build_model_data
(precompute jit), synthetic_state. Each stage ends with a scalar fetch
so transfer/compute time bills to the right stage (block_until_ready
does not synchronize through the remote-TPU tunnel).

Run: PYTHONPATH=/root/repo:$PYTHONPATH BENCH_SIZE=1m python profile_setup.py
(append, never overwrite, PYTHONPATH — see .claude/skills/verify/SKILL.md)
"""
import os
import time

import numpy as np

import bench


def main():
    import jax
    bench._enable_compile_cache()
    jax.config.update('jax_enable_x64', True)
    accel = [d for d in jax.devices() if d.platform != 'cpu'][0]
    t0 = time.perf_counter()
    float(jax.device_put(np.ones(8), accel)[0])
    t1 = time.perf_counter()
    print(f'device init: {t1 - t0:.1f}s', flush=True)

    from vilma_tpu.inference import engine
    from vilma_tpu.utils import synthetic

    with jax.default_device(jax.devices('cpu')[0]):
        ld = bench._cached_ld(np.float32)
        t2 = time.perf_counter()
        print(f'packed-LD cache load: {t2 - t1:.1f}s', flush=True)

        rng = np.random.default_rng(1)
        P = 2
        N = bench.NUM_LOCI
        std_errs = rng.uniform(0.01, 0.05, (P, N))
        betas = rng.standard_normal((P, N)) * std_errs * 2
        scales = np.exp(np.linspace(np.log(1e-6), np.log(1e-2),
                                    bench.NUM_COMPONENTS))
        covs = []
        for k in range(bench.NUM_COMPONENTS):
            a = rng.standard_normal((P, P))
            corr = 0.3 * (a @ a.T) + P * np.eye(P)
            d = 1 / np.sqrt(np.diag(corr))
            covs.append(scales[k] * (corr * np.outer(d, d)))
        annotations = np.zeros((N, 4))
        annotations[np.arange(N), rng.integers(0, 4, N)] = 1
        t3 = time.perf_counter()
        print(f'synthetic sumstats: {t3 - t2:.1f}s', flush=True)

    ld = jax.device_put(ld, accel)
    for bk in ld.buckets:
        float(bk.u[0, 0, 0].astype(np.float32))
    t4 = time.perf_counter()
    print(f'LD transfer: {t4 - t3:.1f}s', flush=True)

    with jax.default_device(accel):
        data = engine.build_model_data(
            betas.astype(np.float32), std_errs.astype(np.float32),
            [ld, ld], annotations, covs, scaled=False, scale_se=False,
            gwas_N=np.full(P, 1e5), init_hg=np.full(P, 0.3),
            dtype=np.float32)
        float(data.inverse_betas[0, 0])
        t5 = time.perf_counter()
        print(f'build_model_data (on device): {t5 - t4:.1f}s', flush=True)
        state = synthetic.synthetic_state(data)
        float(state.vi_mu[0, 0, 0])
        t6 = time.perf_counter()
        print(f'synthetic_state: {t6 - t5:.1f}s', flush=True)
    print(f'SETUP TOTAL: {t6 - t0:.1f}s', flush=True)

    if os.environ.get('PROFILE_STEP'):
        import jax as _jax
        step = _jax.jit(lambda d, s: engine.outer_step_impl(
            d, s, line_search_rate=2.0)[0])
        state2 = step(data, state)
        float(state2.elbo)
        t7 = time.perf_counter()
        print(f'first outer_step (compile+run): {t7 - t6:.1f}s',
              flush=True)
        for i in range(3):
            ta = time.perf_counter()
            state2 = step(data, state2)
            float(state2.elbo)
            print(f'outer_step: {time.perf_counter() - ta:.3f}s',
                  flush=True)


if __name__ == '__main__':
    main()
