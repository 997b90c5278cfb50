"""Decompose the compact-path outer_step cost on the accelerator.

Times each stage of the compact evaluation (fused prologue kernel, LD
matvec, full objective, beta trial, hyper-delta update, full outer_step)
on the bench problem, so optimization targets the real residue.
"""
import functools
import time

import numpy as np

print = functools.partial(print, flush=True)  # noqa: A001


def _fetch(x):
    return float(np.asarray(x).ravel()[0])


def main():
    import os

    import jax
    import jax.numpy as jnp

    import bench
    from vilma_tpu.inference import engine
    from vilma_tpu.ops import blocks

    bench._enable_compile_cache()
    accel = [d for d in jax.devices() if d.platform != 'cpu']
    if not accel:
        jax.config.update('jax_enable_x64', True)
    if accel and os.environ.get('BENCH_PALLAS', '1') != '0':
        blocks.enable_pallas(True)
        print('pallas: enabled')
    device = accel[0] if accel else jax.devices()[0]
    dtype = np.float32 if accel else np.float64
    print('device:', device, 'dtype:', dtype.__name__)

    data, state = bench._build(dtype, device)

    z = jax.jit(lambda: jnp.zeros(()))
    _fetch(z())
    t0 = time.perf_counter()
    for _ in range(5):
        _fetch(z())
    rtt = (time.perf_counter() - t0) / 5
    print(f'fetch round-trip     : {rtt * 1e3:8.2f} ms')

    def timeit(fn, *args, reps=50):
        out = fn(*args)
        _fetch(jax.tree.leaves(out)[0])
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*args)
            _fetch(jax.tree.leaves(out)[0])
            best = min(best, (time.perf_counter() - t0 - rtt) / reps)
        return best

    # 1. fused prologue alone
    @jax.jit
    def prologue(data, st):
        return engine._prologue_fused(data, st.error_scaling, st.nat_mu,
                                      st.hyper_delta, False)

    if blocks.pallas_flags()[0] and engine._prologue_supported(
            data, state.nat_mu):
        t = timeit(prologue, data, state)
        print(f'fused prologue       : {t * 1e3:8.2f} ms')

    # 2. the matvec pair on posterior means
    @jax.jit
    def matvec(data, pm):
        return engine._ld_scaled_dot(data, pm)[1]

    pm0 = jnp.asarray(np.asarray(data.marginal_effects))
    t_mv = timeit(matvec, data, pm0)
    print(f'matvec (multi-RHS)   : {t_mv * 1e3:8.2f} ms')

    # 3. one full compact objective evaluation
    @jax.jit
    def objective(data, st):
        return engine._objective_compact(data, st, st.nat_mu,
                                         st.hyper_delta)[0]

    t_obj = timeit(objective, data, state)
    print(f'objective evaluation : {t_obj * 1e3:8.2f} ms')

    # 4. one beta trial (grad + sum_betas + objective)
    @jax.jit
    def one_trial(data, st):
        obj0, pm, lk = engine._objective_compact(data, st, st.nat_mu,
                                                 st.hyper_delta)
        out = engine._update_beta_compact(data, st, obj0, pm, lk, 2.0)
        return out[2]

    t_trial = timeit(one_trial, data, state)
    print(f'obj + 1 beta trial   : {t_trial * 1e3:8.2f} ms')

    # 5. hyper-delta update (the non-kernelized _derive_params path)
    @jax.jit
    def hyper(data, st):
        return engine._update_hyper_delta_compact(data, st, st.elbo)[2]

    t_h = timeit(hyper, data, state)
    print(f'hyper-delta update   : {t_h * 1e3:8.2f} ms')

    # 6. full outer step
    @jax.jit
    def outer(data, st):
        st2, _ = engine.outer_step_impl(data, st, line_search_rate=2.0)
        return st2

    t_outer = timeit(outer, data, state, reps=20)
    print(f'full outer_step      : {t_outer * 1e3:8.2f} ms')


if __name__ == '__main__':
    main()
