"""Decompose the outer_step iteration cost on the accelerator.

Answers PARITY.md's round-2 question: where do ~20 ms/iter go when the
parts sum to ~7 ms? Times each layer (matvec pair, objective eval, one
beta trial, full outer_step) and counts how many beta-loop iterations /
line-search trials actually execute per outer iteration — if the loop
runs 5-8 objective evaluations, the gap is algorithmic repetition (each
evaluation is near memory-bound), not while-loop carry overhead.

CPU-safe; run on TPU (one process at a time) for the real numbers.
"""
import functools
import time

import numpy as np

print = functools.partial(print, flush=True)  # noqa: A001 — survive SIGTERM


def _fetch(x):
    return float(np.asarray(x).ravel()[0])


def main():
    import os

    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    from vilma_tpu.inference import engine
    from vilma_tpu.ops import blocks

    bench._enable_compile_cache()
    accel = [d for d in jax.devices() if d.platform != 'cpu']
    if not accel:
        jax.config.update('jax_enable_x64', True)  # CPU f64 parity mode
    # accelerator mode stays x64-OFF like fit --precision f32 / the bench
    # accel leg (x64 also disqualifies the Pallas kernel).
    # BENCH_PALLAS default matches bench.py's accel leg (ON unless '0')
    # so this decomposition times the same program the benchmark ran.
    if accel and os.environ.get('BENCH_PALLAS', '1') != '0':
        blocks.enable_pallas(True)
        print('pallas: enabled')
    device = accel[0] if accel else jax.devices()[0]
    dtype = np.float32 if accel else np.float64
    print('device:', device, 'dtype:', dtype.__name__)

    data, state = bench._build(dtype, device)

    # one synchronizing fetch per timed batch costs a tunnel round-trip
    # (~tens of ms, jittery); measure it and use enough reps that the
    # residual RTT/reps bias is negligible (see PARITY.md "Lazy vi_sigma
    # summaries" postscript: 5-step bench chains were RTT-dominated)
    z = jax.jit(lambda: jnp.zeros(()))
    _fetch(z())
    t0 = time.perf_counter()
    for _ in range(5):
        _fetch(z())
    rtt = (time.perf_counter() - t0) / 5
    print(f'fetch round-trip      : {rtt * 1e3:8.2f} ms '
          '(subtracted per timed batch)')

    def timeit(fn, *args, reps=100):
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

    # 1. the block matvec pair
    @jax.jit
    def matvec_pair(data, pm):
        return engine._ld_scaled_dot(data, pm)[1]

    pm0 = jnp.asarray(np.asarray(data.marginal_effects))
    t_mv = timeit(matvec_pair, data, pm0)
    print(f'matvec pair          : {t_mv * 1e3:8.2f} ms')

    # 2. one full beta-objective evaluation (matvecs + reductions)
    @jax.jit
    def objective(data, st):
        return engine._beta_objective_terms(
            data, st.sigma, st.error_scaling, st.vi_mu, st.vi_delta,
            st.hyper_delta)[0]

    t_obj = timeit(objective, data, state)
    print(f'objective evaluation : {t_obj * 1e3:8.2f} ms')

    # 3. one beta trial (nat-grad step + closed-form vi_delta + objective)
    @jax.jit
    def one_trial(data, st):
        obj0, pm, lk = engine._beta_objective_terms(
            data, st.sigma, st.error_scaling, st.vi_mu, st.vi_delta,
            st.hyper_delta)
        out = engine._update_beta(data, st, obj0, pm, lk, 2.0)
        return out[3]

    t_trial = timeit(one_trial, data, state)
    print(f'obj + 1 beta update  : {t_trial * 1e3:8.2f} ms')

    # 4. the full outer step
    @jax.jit
    def outer(data, st):
        st2, _ = engine.outer_step_impl(data, st, line_search_rate=2.0)
        return st2

    t_outer = timeit(outer, data, state)
    print(f'full outer_step      : {t_outer * 1e3:8.2f} ms')

    # 5. count beta iterations + line-search trials per outer iteration
    # (instrumented copy of engine._beta_loop with counters in the carry)
    import dataclasses

    def counted_beta_loop(data, st, conv_tol):
        obj0, pm0, lk0 = engine._beta_objective_terms(
            data, st.sigma, st.error_scaling, st.vi_mu, st.vi_delta,
            st.hyper_delta)

        def body(carry):
            (vi_mu, vi_delta, L0, orig_obj, pm, lk, it, trials, _) = carry
            L0 = jnp.maximum(1., L0 / 1.25)
            cur = dataclasses.replace(st, vi_mu=vi_mu, vi_delta=vi_delta,
                                      L=st.L.at[0].set(L0))
            vi_mu, vi_delta, L1, new_obj, pm, lk, _err = engine._update_beta(
                data, cur, orig_obj, pm, lk, 2.0)
            # trials this update = 1 + number of L doublings
            n_tr = 1 + jnp.round(
                jnp.log(jnp.maximum(L1 / jnp.maximum(L0, 1e-30), 1.))
                / np.log(2.0)).astype(jnp.int32)
            done = jnp.logical_or(
                jnp.abs(new_obj - orig_obj) <= conv_tol,
                jnp.logical_or(L1 == 1., L1 > engine.L_MAX))
            return (vi_mu, vi_delta, L1, new_obj, pm, lk, it + 1,
                    trials + n_tr, done)

        def cond(carry):
            it, done = carry[6], carry[8]
            return jnp.logical_and(it < engine.MAX_NUM_ITERS,
                                   jnp.logical_not(done))

        out = lax.while_loop(cond, body, (
            st.vi_mu, st.vi_delta, st.L[0], obj0, pm0, lk0,
            jnp.asarray(0), jnp.asarray(0), jnp.asarray(False)))
        return out[6], out[7]

    counted = jax.jit(counted_beta_loop)
    st = state
    outer_j = jax.jit(lambda d, s: engine.outer_step_impl(d, s, 2.0))
    print('per-outer-iteration beta loop: iters, line-search trials')
    for i in range(8):
        conv_tol = jnp.where(jnp.isnan(st.running_elbo_delta), jnp.inf,
                             0.1 * st.running_elbo_delta)
        its, trials = counted(data, st, conv_tol)
        st, _ = outer_j(data, st)
        print(f'  outer it {i}: beta_iters={int(its):2d} '
              f'trials={int(trials):2d}')


if __name__ == '__main__':
    main()
