"""Per-evaluation cost across problem sizes — the pod-scaling check.

The BASELINE.md pod-scaling model predicts multi-host speedup from
single-chip per-iteration times at the per-device sizes (1M/N SNPs).
Outer-iteration times carry a trajectory confounder: the line-search
trial count per iteration can differ between problem instances. This
tool times ONE compact beta-objective evaluation (the unit the line
search repeats; fused prologue + LD matvec + reductions) at each size,
chained on-device with a serializing dependency so XLA cannot batch or
CSE the chain — a trajectory-independent per-device compute measure.

Run (TPU): python tools/eval_scaling.py [loci ...]
defaults: 250000 500000 1000000
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def time_size(num_loci, n_evals=200):
    import subprocess
    env = dict(os.environ, BENCH_LOCI=str(num_loci), EVAL_CHILD='1')
    env['PYTHONPATH'] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep
        + env.get('PYTHONPATH', ''))
    out = subprocess.run([sys.executable, os.path.abspath(__file__),
                          str(n_evals)],
                         capture_output=True, text=True, timeout=3000,
                         env=env)
    for line in out.stdout.splitlines():
        if line.startswith('EVAL_MS'):
            return float(line.split()[1])
    raise RuntimeError(out.stderr[-2000:])


def child():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import bench
    from vilma_tpu.inference import engine
    from vilma_tpu.ops import blocks

    n_evals = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    bench._enable_compile_cache()
    os.environ.setdefault('BENCH_LD_DTYPE', 'bf16')
    accel = [d for d in jax.devices() if d.platform != 'cpu']
    if accel and os.environ.get('BENCH_PALLAS', '1') != '0':
        blocks.enable_pallas(True)
    device = accel[0] if accel else jax.devices()[0]
    dtype = np.float32 if accel else np.float64
    data, st = bench._build(dtype, device)

    @jax.jit
    def chain(data, st, n):
        def body(i, carry):
            nat, acc = carry
            obj, _, _ = engine._objective_compact(data, st, nat,
                                                  st.hyper_delta)
            # serialize: the next evaluation's input depends on this
            # one's output (a vanishing perturbation keeps values sane)
            return nat + 1e-30 * obj, acc + obj
        return lax.fori_loop(0, n, body,
                             (st.nat_mu, jnp.zeros((), st.nat_mu.dtype)))

    _, acc = chain(data, st, 3)     # compile + warm
    float(acc)
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        _, acc = chain(data, st, n_evals)
        float(acc)
        best = min(best, (time.perf_counter() - t0) / n_evals)
    print(f'EVAL_MS {best * 1e3:.4f}', flush=True)


def main():
    sizes = ([int(float(s)) for s in sys.argv[1:]]
             or [250_000, 500_000, 1_000_000])
    base = None
    print(f'{"SNPs":>10} {"ms/evaluation":>14} {"ns/SNP":>8} '
          f'{"eff vs largest":>15}')
    rows = []
    for n in sizes:
        ms = time_size(n)
        rows.append((n, ms))
    big_n, big_ms = rows[-1]
    for n, ms in rows:
        eff = big_ms / (ms * (big_n / n))
        print(f'{n:>10,} {ms:>14.3f} {ms * 1e6 / n:>8.1f} '
              f'{eff:>14.1%}')


if __name__ == '__main__':
    if os.environ.get('EVAL_CHILD'):
        child()
    else:
        main()
