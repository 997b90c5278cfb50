"""Worker process for the multi-host equivalence test.

Launched by tests/test_distributed.py: N of these form a jax.distributed
CPU cluster (4 simulated devices each), load the LD schema with
per-process block ownership (parallel.distributed.load_ld_sharded), run a
full MultiPopVI fit under the global mesh, and compare the posterior
means against the single-process golden the parent computed.

Usage: distributed_worker.py <pid> <nproc> <port> <schema> <expected.npy>
       [devices_per_process]
"""
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    schema, expected_path = sys.argv[4], sys.argv[5]
    n_dev = int(sys.argv[6]) if len(sys.argv) > 6 else 4

    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '')
        + f' --xla_force_host_platform_device_count={n_dev}')
    import jax
    # the environment may pin jax_platforms to a TPU plugin, overriding
    # JAX_PLATFORMS (see tests/conftest.py) — force CPU before any backend
    # or coordination-service use
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                               num_processes=nproc, process_id=pid)

    import numpy as np
    import pandas as pd
    from jax.sharding import Mesh
    from vilma_tpu.parallel import distributed
    from vilma_tpu.inference import MultiPopVI

    assert jax.process_count() == nproc
    devices = distributed.process_contiguous_devices()
    mesh = Mesh(np.asarray(devices).reshape(1, len(devices)),
                axis_names=('comp', 'snp'))

    variants = pd.read_csv(schema + '.extract', sep='\t')
    np.random.seed(0)
    ld, missing = distributed.load_ld_sharded(
        schema, variants, denylist=[], ldthresh=1.0, mesh=mesh)

    n = variants.shape[0]
    rng = np.random.default_rng(1)
    std_errs = rng.uniform(0.01, 0.05, (2, n))
    betas = rng.standard_normal((2, n)) * std_errs * 2
    covs = [np.eye(2) * s for s in (1e-6, 1e-4, 1e-2)]
    annotations = np.ones((n, 1))

    vi = MultiPopVI(marginal_effects=betas, std_errs=std_errs,
                    ld_mats=[ld, ld], annotations=annotations,
                    mixture_covs=covs, checkpoint=False,
                    gwas_N=np.full(2, 1e5), init_hg=np.full(2, 0.3),
                    num_its=5, mesh=mesh)
    vi.optimize()
    got = vi.real_posterior_mean()

    expected = np.load(expected_path)
    max_diff = float(np.max(np.abs(got - expected)))
    denom = np.maximum(np.abs(expected), 1e-12)
    max_rel = float(np.max(np.abs(got - expected) / denom))
    if np.allclose(got, expected, rtol=1e-8, atol=1e-10):
        print(f'OK pid={pid} max_diff={max_diff:.3e} max_rel={max_rel:.3e}')
    else:
        print(f'MISMATCH pid={pid} max_diff={max_diff:.3e} '
              f'max_rel={max_rel:.3e}')
        sys.exit(1)


if __name__ == '__main__':
    main()
