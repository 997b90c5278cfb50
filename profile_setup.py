"""One-off: decompose the 1M-SNP bench setup cost (pack + transfer).

Stages timed: .npz factor-cache load, blocks.pack, build_model_data on
host CPU, jax.device_put to the TPU, first on-device scalar fetch.
Run: PYTHONPATH=/root/repo BENCH_SIZE=1m python profile_setup.py
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

    from vilma_tpu.inference import engine
    from vilma_tpu.utils import synthetic

    t0 = time.perf_counter()
    with jax.default_device(jax.devices('cpu')[0]):
        ld = bench._cached_ld(np.float32)
        t1 = time.perf_counter()
        print(f'npz load + pack: {t1 - t0:.1f}s', flush=True)

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
        t2 = time.perf_counter()
        print(f'synthetic sumstats: {t2 - t1:.1f}s', flush=True)

        data = engine.build_model_data(
            betas.astype(np.float32), std_errs.astype(np.float32),
            [ld, ld], annotations, covs, scaled=False, scale_se=False,
            gwas_N=np.full(P, 1e5), init_hg=np.full(P, 0.3),
            dtype=np.float32)
        t3 = time.perf_counter()
        print(f'build_model_data (CPU): {t3 - t2:.1f}s', flush=True)
        state = synthetic.synthetic_state(data)
        t4 = time.perf_counter()
        print(f'synthetic_state: {t4 - t3:.1f}s', flush=True)

    data = jax.device_put(data, accel)
    state = jax.device_put(state, accel)
    t5 = time.perf_counter()
    print(f'device_put dispatch: {t5 - t4:.1f}s', flush=True)
    # force completion of the transfer with a scalar fetch per leaf class
    float(np.asarray(data.ld[0].buckets[0].u)[0, 0, 0])
    float(np.asarray(state.vi_mu)[0, 0, 0])
    t6 = time.perf_counter()
    print(f'transfer completion: {t6 - t5:.1f}s', flush=True)
    print(f'TOTAL: {t6 - t0:.1f}s', flush=True)


if __name__ == '__main__':
    main()
