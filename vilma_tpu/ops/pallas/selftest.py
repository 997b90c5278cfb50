"""On-device self-test of the Mosaic block-matvec kernel.

Interpret-mode tests cannot catch Mosaic compile rejections: round 2's
kernel passed every interpret-mode test yet never compiled on real TPU
(Mosaic tiling rules; commit 7fa2c7e). This module compiles the kernel
ON THE ATTACHED DEVICE for every supported (pmax, rmax, dtype) tier and
checks the numerics against a float64 numpy oracle, so a tiling/lowering
regression fails loudly instead of shipping silently. Run it via
`python bench.py --selftest` or the TPU-gated pytest
(tests/test_pallas_tpu.py).
"""
import numpy as np
import jax.numpy as jnp

from vilma_tpu.ops.pallas import block_matvec as pk
from vilma_tpu.ops.pallas import compact_obj as co

# every (pmax, rmax) tier blocks.pack can produce for supported dtypes,
# up to the kernel's VMEM tile cap (shape_supported re-checks it)
_PMAX_TIERS = (128, 256, 512, 1024, 2048)
_RMAX_TIERS = (128, 256, 512, 1024)
# Dual tolerances (normalized max error):
#  * vs the XLA two-pass on the SAME device: both paths feed the MXU the
#    same operand dtypes, so they agree to rounding-reassociation noise
#    (~7e-8 measured) — this is the tight kernel-correctness gate;
#  * vs a float64 numpy oracle: a sanity band only, because the TPU MXU
#    evaluates f32 matmuls at DEFAULT precision (decomposed bf16 passes,
#    ~3e-3 observed) — it catches grossly wrong results, not rounding.
_TOL_XLA = 1e-6
_TOL_ORACLE = {'float32': 1e-2, 'bfloat16': 3e-2}


def configs():
    for dtype in (jnp.float32, jnp.bfloat16):
        for pmax in _PMAX_TIERS:
            for rmax in _RMAX_TIERS:
                if rmax > pmax:
                    continue
                if pk.shape_supported(pmax, rmax, dtype):
                    yield pmax, rmax, dtype


def _xla_path(u, s, d, x):
    """The production XLA two-pass (blocks._bucket_dot_multi's math)."""
    if u.dtype == jnp.bfloat16:
        t = jnp.einsum('bpr,bcp->bcr', u, x.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        t = t * s[:, None, :]
        return (jnp.einsum('bpr,bcr->bcp', u, t.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
                + d[:, None, :] * x)
    t = jnp.einsum('bpr,bcp->bcr', u, x) * s[:, None, :]
    return jnp.einsum('bpr,bcr->bcp', u, t) + d[:, None, :] * x


def _oracle(u, s, d, x):
    u64 = np.asarray(u, dtype=np.float64)
    t = np.einsum('bpr,bcp->bcr', u64, np.asarray(x, np.float64))
    t = t * np.asarray(s, np.float64)[:, None, :]
    return (np.einsum('bpr,bcr->bcp', u64, t)
            + np.asarray(d, np.float64)[:, None, :]
            * np.asarray(x, np.float64))


def run_one(pmax, rmax, dtype, B=3, C=2, seed=0):
    """Compile + run the kernel for one tier.

    Returns (normalized err vs the XLA device path, vs the f64 oracle)."""
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((B, pmax, rmax)).astype(np.float32)
    s = rng.uniform(0.1, 2.0, (B, rmax)).astype(np.float32)
    d = rng.uniform(0.0, 0.5, (B, pmax)).astype(np.float32)
    x = rng.standard_normal((B, C, pmax)).astype(np.float32)
    u_dev = jnp.asarray(u, dtype=dtype)
    s_dev, d_dev, x_dev = map(jnp.asarray, (s, d, x))
    got = np.asarray(pk.bucket_matvec_multi(u_dev, s_dev, d_dev, x_dev))
    xla = np.asarray(_xla_path(u_dev, s_dev, d_dev, x_dev))
    want = _oracle(np.asarray(u_dev, np.float64), s, d, x)
    scale = np.max(np.abs(want)) + 1e-30
    return (float(np.max(np.abs(got - xla)) / scale),
            float(np.max(np.abs(got - want)) / scale))


def prologue_configs():
    """(P, K, A, kdim) tiers of the compact-objective prologue kernel:
    every cohort count, small and large component counts (the tile
    picker changes regime), each annotation-selection branch
    (broadcast / masked select / one-hot matmul), and both natural-mean
    layouts (shared [P, I] and the per-component scale_se [K, P, I])."""
    for P in (1, 2, 3):
        for K in (2, 18, 200):
            for A in (1, 4, 24):
                for kdim in (False, True):
                    if co.shape_supported(P, K, jnp.dtype(jnp.float32),
                                          kdim=kdim):
                        yield P, K, A, kdim


def run_prologue_one(P, K, A, I=9000, seed=0, kdim=False):
    """Compile + run the prologue for one tier vs its XLA re-derivation.

    Returns the normalized max error over (post_means, post_vars, kl)."""
    rng = np.random.default_rng(seed)
    covs = []
    for k in range(K):
        m = rng.standard_normal((P, P))
        covs.append((m @ m.T + P * np.eye(P))
                    * np.exp(rng.uniform(-8, -2)))
    prec = np.linalg.inv(np.asarray(covs))
    log_det = np.linalg.slogdet(np.asarray(covs))[1]
    hyper = rng.dirichlet(np.ones(K), size=A)
    ann = rng.integers(0, A + 1, I)       # includes padding slots
    dterm = rng.uniform(0.5, 3.0, (P, I))
    nat_shape = (K, P, I) if kdim else (P, I)
    nat = rng.standard_normal(nat_shape) * 5

    coeffs = co.build_coeffs(jnp.asarray(prec, jnp.float32),
                             jnp.asarray(log_det, jnp.float32))
    scores_t = jnp.asarray(
        (np.log(hyper) - 0.5 * log_det).T, jnp.float32)
    args = (coeffs, scores_t, jnp.asarray(ann),
            jnp.asarray(dterm, jnp.float32),
            jnp.asarray(nat, jnp.float32))
    pm, pv, kl = co.prologue(*args, num_annotations=A)
    pm_i, pv_i, kl_i = co.prologue(*args, num_annotations=A,
                                   interpret=True)
    sm = co.delta_sums(*args, num_annotations=A)
    sm_i = co.delta_sums(*args, num_annotations=A, interpret=True)
    err = 0.0
    for got, want in ((pm, pm_i), (pv, pv_i), (sm, sm_i)):
        scale = np.max(np.abs(np.asarray(want))) + 1e-30
        err = max(err, float(np.max(np.abs(np.asarray(got)
                                           - np.asarray(want))) / scale))
    err = max(err, abs(float(kl) - float(kl_i))
              / (abs(float(kl_i)) + 1e-30))
    return err


def epoch_configs():
    """(P, K, A, B) tiers of the EPOCH-HISTORY prologue kernel
    (compact_obj.prologue_epochs): every cohort count, the production
    grid regime (K~600), each epoch bucket size the engine grows
    through (engine._EPOCH_BUCKETS)."""
    for P in (1, 2, 3):
        for K in (18, 600):
            for B in (4, 16, 48):
                A = 4
                if co.shape_supported(P, K, jnp.dtype(jnp.float32),
                                      epochs=B):
                    yield P, K, A, B


def run_epoch_one(P, K, A, B, I=9000, seed=0):
    """Compile + run the epoch kernels for one tier vs interpret mode.

    Returns the normalized max error over (post_means, post_vars, kl,
    delta_sums)."""
    rng = np.random.default_rng(seed)
    covs = []
    for k in range(K):
        m = rng.standard_normal((P, P))
        covs.append((m @ m.T + P * np.eye(P))
                    * np.exp(rng.uniform(-8, -2)))
    prec = np.linalg.inv(np.asarray(covs))
    log_det = np.linalg.slogdet(np.asarray(covs))[1]
    hyper = rng.dirichlet(np.ones(K), size=A)
    ann = rng.integers(0, A + 1, I)
    sld = rng.uniform(0.5, 3.0, (P, I))
    u = rng.standard_normal((P, I)) * 5
    hist = rng.standard_normal((B, P, I)) * 5
    inv_scales = rng.uniform(0.7, 1.4, (B + 1, P))
    hist_c = rng.uniform(0.0, 1.0, B)

    coeffs = co.build_coeffs(jnp.asarray(prec, jnp.float32),
                             jnp.asarray(log_det, jnp.float32))
    scores_t = jnp.asarray(
        (np.log(hyper) - 0.5 * log_det).T, jnp.float32)
    args = (coeffs, scores_t, jnp.asarray(ann),
            jnp.asarray(sld, jnp.float32),
            jnp.asarray(u, jnp.float32),
            jnp.asarray(hist, jnp.float32),
            jnp.asarray(inv_scales, jnp.float32),
            jnp.asarray(hist_c, jnp.float32))
    pm, pv, kl = co.prologue_epochs(*args, num_annotations=A)
    pm_i, pv_i, kl_i = co.prologue_epochs(*args, num_annotations=A,
                                          interpret=True)
    sm = co.delta_sums_epochs(*args, num_annotations=A)
    sm_i = co.delta_sums_epochs(*args, num_annotations=A,
                                interpret=True)
    err = 0.0
    for got, want in ((pm, pm_i), (pv, pv_i), (sm, sm_i)):
        scale = np.max(np.abs(np.asarray(want))) + 1e-30
        err = max(err, float(np.max(np.abs(np.asarray(got)
                                           - np.asarray(want))) / scale))
    err = max(err, abs(float(kl) - float(kl_i))
              / (abs(float(kl_i)) + 1e-30))
    return err


_TOL_PROLOGUE = 1e-4   # f32 kernel vs f32 interpret: transcendental and
#                        reduction reassociation noise on ~1e5-scale sums


def run_selftest(verbose=print):
    """Compile/check every supported tier on the attached TPU.

    Returns the list of (pmax, rmax, dtype_name, normalized_err).
    Raises RuntimeError on any compile failure or tolerance violation.
    """
    import jax
    if jax.default_backend() == 'cpu':
        raise RuntimeError('selftest needs a non-CPU backend '
                           '(interpret mode cannot catch Mosaic '
                           'compile rejections)')
    results, failures = [], []
    for P, K, A, kdim in prologue_configs():
        tag = 'prologueK' if kdim else 'prologue'
        try:
            err = run_prologue_one(P, K, A, kdim=kdim)
        except Exception as exc:          # Mosaic compile rejection
            failures.append(f'{tag} P={P} K={K} A={A}: '
                            f'{type(exc).__name__}: {exc}')
            continue
        results.append((P, K, f'{tag}_A{A}', err))
        ok = err <= _TOL_PROLOGUE
        if verbose:
            verbose(f'selftest {tag:9s} P={P} K={K:4d} A={A:3d} '
                    f'err={err:.3e} {"ok" if ok else "FAIL"}')
        if not ok:
            failures.append(f'{tag} P={P} K={K} A={A}: err {err:.3e} '
                            f'(tol {_TOL_PROLOGUE:.0e})')
    for P, K, A, B in epoch_configs():
        try:
            err = run_epoch_one(P, K, A, B)
        except Exception as exc:          # Mosaic compile rejection
            failures.append(f'epochs P={P} K={K} B={B}: '
                            f'{type(exc).__name__}: {exc}')
            continue
        results.append((P, K, f'epochs_B{B}', err))
        ok = err <= _TOL_PROLOGUE
        if verbose:
            verbose(f'selftest epochs    P={P} K={K:4d} B={B:3d} '
                    f'err={err:.3e} {"ok" if ok else "FAIL"}')
        if not ok:
            failures.append(f'epochs P={P} K={K} B={B}: err {err:.3e} '
                            f'(tol {_TOL_PROLOGUE:.0e})')
    for pmax, rmax, dtype in configs():
        name = jnp.dtype(dtype).name
        try:
            err_xla, err_oracle = run_one(pmax, rmax, dtype)
        except Exception as exc:          # Mosaic compile rejection
            failures.append(f'{name} P={pmax} R={rmax}: '
                            f'{type(exc).__name__}: {exc}')
            continue
        results.append((pmax, rmax, name, err_xla))
        ok = err_xla <= _TOL_XLA and err_oracle <= _TOL_ORACLE[name]
        if verbose:
            verbose(f'selftest {name:9s} P={pmax:5d} R={rmax:5d} '
                    f'err_xla={err_xla:.3e} err_f64={err_oracle:.3e} '
                    f'{"ok" if ok else "FAIL"}')
        if not ok:
            failures.append(f'{name} P={pmax} R={rmax}: err vs XLA '
                            f'{err_xla:.3e} (tol {_TOL_XLA:.0e}), vs f64 '
                            f'{err_oracle:.3e} '
                            f'(tol {_TOL_ORACLE[name]:.0e})')
    if failures:
        raise RuntimeError('Pallas kernel selftest failed:\n  '
                           + '\n  '.join(failures))
    if not results:
        raise RuntimeError('Pallas kernel selftest ran zero configs '
                           '(supported() rejected everything)')
    return results
