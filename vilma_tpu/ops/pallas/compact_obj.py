"""Pallas TPU kernel: fused compact-objective prologue.

One beta-objective evaluation of the compact [P, I] natural-mean state
(engine._objective_compact) splits into a prologue — derive the per-SNP
categorical vi_delta and the posterior moments from nat_mu — and a tail
(the LD matvec + the likelihood reduction). The prologue's math is
K mixture components of closed-form P<=3 algebra per SNP
(models/sigma.compact_exprs + kernels.fast_invert_nat_vi_delta +
the three beta-KL reductions; reference variational_inference.py:452-490,
632-641, 868-885 and numerics.py:132-146,198-213).

Staged as XLA ops the prologue streams ~2.3 GB of [K, I]-shaped
intermediates from HBM per evaluation at 1M SNPs (profiled r3: XLA
materializes vi_delta, the [K, P, I] component means, and the softmax
workspace between fusions) — larger than the LD matvec it feeds. This
kernel computes the whole prologue in ONE pass over the SNP axis: per
[*, T] tile every [K, T] quantity lives only in VMEM/registers, so HBM
traffic drops to the [P, I] inputs and outputs (~50 MB at 1M SNPs).

Outputs per tile: post_means [P, T], post_vars [P, T], and the summed
beta-KL scalar (delta KL + precision quadratic form + covariance terms),
accumulated across the sequential TPU grid.

Masking follows the XLA staging exactly: SNPs whose annotation id ==
num_annotations (mesh padding slots, parallel/padding.py) contribute
zero to the KL scalar; their moments are computed but inert downstream
(nat_mu is zero there, and fast_likelihood's diag weights are zero).
"""
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vilma_tpu.utils.config import epsilon


def _pick_tile(K, kdim=False, P=1, epochs=0):
    """SNP-tile width: ~14 [K, T] f32 temporaries must fit a ~6 MB VMEM
    budget alongside the in/out tiles and Mosaic's workspace. With a
    per-component natural-mean input (kdim — the scale_se state) the
    rank-3 [K, P, T] nat tile costs 8 more [K, T] buffers (the P axis
    sublane-pads to 8). The epoch-history state adds the [B, P, T]
    history tile (B * 8 sublane-padded rows of T lanes) plus a fixed
    allowance for the per-epoch solve temporaries."""
    budget = 6 * 1024 * 1024
    rows = 14 + (8 if kdim else 0)
    if epochs:
        # the [B, P, T] history tile (B * 8 sublane-padded rows) plus a
        # small allowance for the epoch-loop accumulator; the per-epoch
        # solve temporaries are reused across the unrolled loop, not
        # resident, so they do not scale the budget (validated on
        # hardware by selftest.epoch_configs up to K=600, B=48)
        rows += 4 + -(-epochs * 8 // max(K, 1))
    t = budget // (rows * 4 * max(K, 1))
    t = min(4096, (t // 128) * 128)
    return t if t >= 128 else None


def shape_supported(P, K, dtype, kdim=False, epochs=0):
    return dtype == jnp.dtype(jnp.float32) and P in (1, 2, 3) \
        and _pick_tile(K, kdim=kdim, P=P, epochs=epochs) is not None


def supported(P, K, dtype, kdim=False, epochs=0):
    """Whether the fused prologue applies here and now (mirrors
    block_matvec.supported: Mosaic is TPU-only and rejects x64)."""
    if jax.default_backend() != 'tpu':
        return False
    if jax.config.jax_enable_x64:
        return False
    return shape_supported(P, K, dtype, kdim=kdim, epochs=epochs)


def _sigma_apply(P, c, dt, n):
    """y = (prec_k + diag(dt))^{-1} @ n via the closed-form P<=3
    algebra (models/sigma.apply_sigma), vectorized over K: c are the
    [K, 1] prior-precision coefficient columns, dt/n are P rows of
    [*, T] tiles. Returns the P rows of y."""
    if P == 1:
        a = c[0] + dt[0]
        return [n[0] * (1.0 / a)]
    if P == 2:
        a = c[0] + dt[0]
        b = c[1]
        d = c[2] + dt[1]
        inv = 1.0 / (a * d - b * b)
        return [(d * n[0] - b * n[1]) * inv,
                (a * n[1] - b * n[0]) * inv]
    pa = c[0] + dt[0]
    pb, pc = c[1], c[2]
    pd = c[3] + dt[1]
    pe = c[4]
    pf = c[5] + dt[2]
    A3 = pd * pf - pe * pe
    B3 = pc * pe - pb * pf
    C3 = pb * pe - pc * pd
    D3 = pa * pf - pc * pc
    E3 = pb * pc - pa * pe
    F3 = pa * pd - pb * pb
    inv = 1.0 / (pa * A3 + pb * B3 + pc * C3)
    return [(A3 * n[0] + B3 * n[1] + C3 * n[2]) * inv,
            (B3 * n[0] + D3 * n[1] + E3 * n[2]) * inv,
            (C3 * n[0] + E3 * n[1] + F3 * n[2]) * inv]


def _select_scores(scores_ref, ann, A, K, T):
    """SEL[k, t] = scores[ann_t, k] (annotation-selected mixture
    weights; scores_ref holds scores.T = [K, A]). Tiny A: masked column
    broadcasts; larger A: one [K,A]x[A,T] MXU matmul against the
    one-hot annotation matrix."""
    if A == 1:
        return jnp.broadcast_to(scores_ref[:, 0:1], (K, T))
    if A <= 8:
        sel = jnp.broadcast_to(scores_ref[:, A - 1:A], (K, T))
        for a in range(A - 1):
            sel = jnp.where(ann == a, scores_ref[:, a:a + 1], sel)
        return sel
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (A, T), 0)
              == ann).astype(scores_ref.dtype)
    return jnp.dot(scores_ref[...], onehot,
                   preferred_element_type=scores_ref.dtype)


def _derive_tile_epochs(coeffs_ref, scores_ref, ann, sld_ref, u_ref,
                        hist_ref, isc_ref, c_ref, *, P, A, eps):
    """Per-tile derivation for the EPOCH-HISTORY scale_se state
    (sigma.compact_exprs_epochs): the per-component means accumulate
    over the B+1 epochs' closed-form solves — mu_k = sum_e c_e *
    sigma_k^{(e)} v_e + sigma_k^{(cur)} u — entirely in VMEM/registers,
    with the per-epoch diag terms formed in-register from the raw
    scaled_ld_diags tile and the [B+1, P] inverse-scaling table
    (row 0 = current). isc_ref/c_ref live in SMEM."""
    K = coeffs_ref.shape[0]
    T = ann.shape[1]
    sel = _select_scores(scores_ref, ann, A, K, T)

    c = [coeffs_ref[:, j:j + 1] for j in range(coeffs_ref.shape[1])]
    sld = [sld_ref[p:p + 1, :] for p in range(P)]
    dt = [sld[p] * isc_ref[0, p] for p in range(P)]
    u = [u_ref[p:p + 1, :] for p in range(P)]
    y = _sigma_apply(P, c, dt, u)
    B = hist_ref.shape[0]

    # a sequential fori_loop (not an unrolled Python loop): Mosaic
    # stack-allocates each unrolled iteration's solve temporaries
    # separately, which blew the 16M scoped-vmem limit at P=3, K=600 —
    # the loop keeps ONE epoch's temporaries live for any B
    def _epoch_body(e, y):
        row = hist_ref[pl.dslice(e, 1), :, :]           # [1, P, T]
        dte = [sld[p] * isc_ref[e + 1, p] for p in range(P)]
        v = [row[0, p:p + 1, :] for p in range(P)]
        ye = _sigma_apply(P, c, dte, v)
        ce = c_ref[e]
        return tuple(y[p] + ce * ye[p] for p in range(P))

    y = list(jax.lax.fori_loop(0, B, _epoch_body, tuple(y)))

    # current-scaling stats + the natural means nat = (prec + dt) @ y
    if P == 1:
        a = c[0] + dt[0]
        ldp = c[1]
        inv = 1.0 / a
        diag = [inv]
        logdet = jnp.log(a)
        matches = c[0] * inv
        nat = [a * y[0]]
        quadform = c[0] * y[0] * y[0]
    elif P == 2:
        a = c[0] + dt[0]
        b = c[1]
        d = c[2] + dt[1]
        ldp = c[3]
        det = a * d - b * b
        inv = 1.0 / det
        diag = [d * inv, a * inv]
        logdet = jnp.log(det)
        matches = (c[0] * d - 2 * c[1] * b + c[2] * a) * inv
        nat = [a * y[0] + b * y[1], b * y[0] + d * y[1]]
        quadform = (c[0] * y[0] * y[0] + 2 * c[1] * y[0] * y[1]
                    + c[2] * y[1] * y[1])
    else:
        pa = c[0] + dt[0]
        pb, pc = c[1], c[2]
        pd = c[3] + dt[1]
        pe = c[4]
        pf = c[5] + dt[2]
        ldp = c[6]
        A3 = pd * pf - pe * pe
        D3 = pa * pf - pc * pc
        F3 = pa * pd - pb * pb
        B3 = pc * pe - pb * pf
        C3 = pb * pe - pc * pd
        E3 = pb * pc - pa * pe
        det = pa * A3 + pb * B3 + pc * C3
        inv = 1.0 / det
        diag = [A3 * inv, D3 * inv, F3 * inv]
        logdet = jnp.log(det)
        matches = (c[0] * A3 + c[3] * D3 + c[5] * F3
                   + 2 * (c[1] * B3 + c[2] * C3 + c[4] * E3)) * inv
        nat = [pa * y[0] + pb * y[1] + pc * y[2],
               pb * y[0] + pd * y[1] + pe * y[2],
               pc * y[0] + pe * y[1] + pf * y[2]]
        quadform = (c[0] * y[0] * y[0] + c[3] * y[1] * y[1]
                    + c[5] * y[2] * y[2]
                    + 2 * (c[1] * y[0] * y[1] + c[2] * y[0] * y[2]
                           + c[4] * y[1] * y[2]))

    quad = nat[0] * y[0]
    for p in range(1, P):
        quad = quad + nat[p] * y[p]

    z = 0.5 * (quad - logdet) + sel                        # [K, T]
    m = jnp.max(z, axis=0, keepdims=True)
    ez = jnp.exp(z - m)
    den = jnp.sum(ez, axis=0, keepdims=True)
    vd = jnp.maximum(ez / den, eps)
    log_vd = jnp.maximum(z - m - jnp.log(den), math.log(eps))
    return dict(sel=sel, y=y, diag=diag, logdet=logdet, ldp=ldp,
                quadform=quadform, matches=matches, vd=vd, log_vd=log_vd)


def _derive_tile(coeffs_ref, scores_ref, ann, nat_ref, dterm_ref,
                 *, P, A, eps, kdim=False):
    """Shared per-tile derivation: closed-form component algebra +
    stabilized categorical vi_delta (every array [K, T] or [1, T],
    VMEM-resident).

    kdim: the natural mean is per-component (the scale_se [K, P, I]
    state, passed as [P*K, T] tiles with row p*K + k) — the identical
    algebra runs with [K, T] rows in place of the broadcast [1, T]
    rows (models/sigma._nat_row)."""
    K = coeffs_ref.shape[0]
    T = ann.shape[1]

    # SEL[k, t] = scores[ann_t, k] (the annotation-selected mixture
    # weights; scores_ref holds scores.T = [K, A]). Tiny A: masked
    # column broadcasts; larger A: one [K,A]x[A,T] MXU matmul against
    # the one-hot annotation matrix.
    if A == 1:
        sel = jnp.broadcast_to(scores_ref[:, 0:1], (K, T))
    elif A <= 8:
        sel = jnp.broadcast_to(scores_ref[:, A - 1:A], (K, T))
        for a in range(A - 1):
            sel = jnp.where(ann == a, scores_ref[:, a:a + 1], sel)
    else:
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (A, T), 0)
                  == ann).astype(scores_ref.dtype)
        sel = jnp.dot(scores_ref[...], onehot,
                      preferred_element_type=scores_ref.dtype)

    # closed-form per-(k, i) sigma algebra (models/sigma.compact_exprs),
    # vectorized over K: coefficient columns broadcast [K,1] x [1,T]
    c = [coeffs_ref[:, j:j + 1] for j in range(coeffs_ref.shape[1])]
    if kdim:
        # rank-3 [K, P, T] tile of the scale_se state: slice the P
        # (sublane) axis in-register — the state streams from HBM in
        # its native layout, no host-side transpose copy per evaluation
        n = [nat_ref[:, p, :] for p in range(P)]
    else:
        n = [nat_ref[p:p + 1, :] for p in range(P)]
    dt = [dterm_ref[p:p + 1, :] for p in range(P)]
    if P == 1:
        a = c[0] + dt[0]
        ldp = c[1]
        inv = 1.0 / a
        y = [n[0] * inv]
        diag = [inv]
        logdet = jnp.log(a)
        quad = y[0] * n[0]
        quadform = c[0] * y[0] * y[0]
        matches = c[0] * inv
    elif P == 2:
        a = c[0] + dt[0]
        b = c[1]
        d = c[2] + dt[1]
        ldp = c[3]
        det = a * d - b * b
        inv = 1.0 / det
        y = [(d * n[0] - b * n[1]) * inv, (a * n[1] - b * n[0]) * inv]
        diag = [d * inv, a * inv]
        logdet = jnp.log(det)
        quad = y[0] * n[0] + y[1] * n[1]
        quadform = (c[0] * y[0] * y[0] + 2 * c[1] * y[0] * y[1]
                    + c[2] * y[1] * y[1])
        matches = (c[0] * d - 2 * c[1] * b + c[2] * a) * inv
    else:
        pa = c[0] + dt[0]
        pb, pc = c[1], c[2]
        pd = c[3] + dt[1]
        pe = c[4]
        pf = c[5] + dt[2]
        ldp = c[6]
        # symmetric-3x3 adjugate (models/sigma._adjugate3)
        A3 = pd * pf - pe * pe
        B3 = pc * pe - pb * pf
        C3 = pb * pe - pc * pd
        D3 = pa * pf - pc * pc
        E3 = pb * pc - pa * pe
        F3 = pa * pd - pb * pb
        det = pa * A3 + pb * B3 + pc * C3
        inv = 1.0 / det
        y = [(A3 * n[0] + B3 * n[1] + C3 * n[2]) * inv,
             (B3 * n[0] + D3 * n[1] + E3 * n[2]) * inv,
             (C3 * n[0] + E3 * n[1] + F3 * n[2]) * inv]
        diag = [A3 * inv, D3 * inv, F3 * inv]
        logdet = jnp.log(det)
        quad = y[0] * n[0] + y[1] * n[1] + y[2] * n[2]
        quadform = (c[0] * y[0] * y[0] + c[3] * y[1] * y[1]
                    + c[5] * y[2] * y[2]
                    + 2 * (c[1] * y[0] * y[1] + c[2] * y[0] * y[2]
                           + c[4] * y[1] * y[2]))
        matches = (c[0] * A3 + c[3] * D3 + c[5] * F3
                   + 2 * (c[1] * B3 + c[2] * C3 + c[4] * E3)) * inv

    # stabilized categorical inversion over the FULL logits
    # z_k = 0.5*(quad_k - logdet_k) + scores[a, k]; identical to the
    # reference's last-component-zero convention with max floored at 0
    # (kernels.invert_nat_cat_2D): both equal softmax(z) over all K.
    z = 0.5 * (quad - logdet) + sel                        # [K, T]
    m = jnp.max(z, axis=0, keepdims=True)
    ez = jnp.exp(z - m)
    den = jnp.sum(ez, axis=0, keepdims=True)
    vd = jnp.maximum(ez / den, eps)
    log_vd = jnp.maximum(z - m - jnp.log(den), math.log(eps))
    return dict(sel=sel, y=y, diag=diag, logdet=logdet, ldp=ldp,
                quadform=quadform, matches=matches, vd=vd, log_vd=log_vd)


def _kernel(coeffs_ref, scores_ref, ann_ref, dterm_ref, nat_ref,
            pm_ref, pv_ref, kl_ref, *, P, A, eps, kdim=False):
    ann = ann_ref[...]                                     # [1, T] int32
    d = _derive_tile(coeffs_ref, scores_ref, ann, nat_ref, dterm_ref,
                     P=P, A=A, eps=eps, kdim=kdim)
    vd, y, diag = d['vd'], d['y'], d['diag']
    sel, ldp, logdet = d['sel'], d['ldp'], d['logdet']
    quadform, matches, log_vd = d['quadform'], d['matches'], d['log_vd']

    pm = [jnp.sum(vd * y[p], axis=0, keepdims=True) for p in range(P)]
    pv = [jnp.sum(vd * (diag[p] + y[p] * y[p]), axis=0, keepdims=True)
          - pm[p] * pm[p] for p in range(P)]
    pm_ref[...] = jnp.concatenate(pm, axis=0)
    pv_ref[...] = jnp.concatenate(pv, axis=0)

    # beta KL: delta KL + 0.5*quadform + 0.5*(logdet_prior - logdet_sigma
    # + matches), all vi_delta-weighted and masked to real SNPs.
    # log hyper_delta[a, k] = scores[a, k] + 0.5*logdet_prior[k].
    log_hd = sel + 0.5 * ldp
    ss = ldp + logdet + matches
    per_k = vd * ((log_vd - log_hd) + 0.5 * quadform + 0.5 * ss)
    mask = (ann < A).astype(per_k.dtype)                   # [1, T]
    # Mosaic rejects scalar stores to VMEM: keep the accumulator [1, 1]
    kl_tile = jnp.sum(per_k * mask).reshape(1, 1).astype(kl_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        kl_ref[...] = jnp.zeros((1, 1), kl_ref.dtype)

    kl_ref[...] += kl_tile


def _prep_launch(kernel, coeffs, scores_t, annotations, dterm, nat_mu,
                 num_annotations):
    """Launch prep shared by every compact-objective kernel: tile-pad
    the [*, I] operands (pad slots carry the sentinel annotation id
    `num_annotations` and an inert dterm of 1.0 — `_derive_tile` drops
    them), bind the kernel's static parameters, and build the canonical
    SNP-grid + in_specs contract.

    nat_mu may be the shared [P, I] natural mean or the per-component
    [K, P, I] scale_se state; the latter streams in its NATIVE layout
    as rank-3 [K, P, T] tiles (a host-side transpose copy per
    evaluation would cost more than the fusion saves — measured).

    Returns (kern, grid, in_specs, args, ipad, T)."""
    K, A = scores_t.shape
    kdim = nat_mu.ndim == 3
    P, I = nat_mu.shape[-2:]
    assert A == num_annotations
    T = _pick_tile(K, kdim=kdim, P=P)
    ipad = -(-I // T) * T
    if ipad != I:
        pad = ipad - I
        annotations = jnp.pad(annotations, (0, pad),
                              constant_values=num_annotations)
        dterm = jnp.pad(dterm, ((0, 0), (0, pad)), constant_values=1.0)
        widths = [(0, 0)] * (nat_mu.ndim - 1) + [(0, pad)]
        nat_mu = jnp.pad(nat_mu, widths)
    ann2 = annotations[None, :].astype(jnp.int32)
    eps = float(epsilon(nat_mu.dtype))
    kern = functools.partial(kernel, P=P, A=A, eps=eps, kdim=kdim)
    ncol = coeffs.shape[1]
    nat_spec = (pl.BlockSpec((K, P, T), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM) if kdim
                else pl.BlockSpec((P, T), lambda i: (0, i),
                                  memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((K, ncol), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),         # coeffs
        pl.BlockSpec((K, A), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),         # scores.T
        pl.BlockSpec((1, T), lambda i: (0, i),
                     memory_space=pltpu.VMEM),         # annotations
        pl.BlockSpec((P, T), lambda i: (0, i),
                     memory_space=pltpu.VMEM),         # dterm
        nat_spec,                                      # nat_mu
    ]
    args = (coeffs, scores_t, ann2, dterm, nat_mu)
    return kern, (ipad // T,), in_specs, args, ipad, T


def prologue(coeffs, scores_t, annotations, dterm, nat_mu, *,
             num_annotations, interpret=False):
    """Fused (post_means, post_vars, beta_kl) of a compact parameter point.

    Args:
        coeffs: [K, ncol] f32 — per-component prior-precision upper
            triangle followed by the prior log-determinant (see
            `build_coeffs`).
        scores_t: [K, A] f32 — (log hyper_delta - 0.5*log_det).T.
        annotations: [I] integer annotation ids (== num_annotations on
            padding slots).
        dterm: [P, I] f32 — scaled_ld_diags / error_scaling.
        nat_mu: [P, I] f32 — the compact natural mean — or [K, P, I]
            for the per-component scale_se state.
    Returns:
        (post_means [P, I], post_vars [P, I], beta_kl scalar), all f32.
    """
    P, I = nat_mu.shape[-2:]
    K, A = scores_t.shape
    kern, grid, in_specs, args, ipad, T = _prep_launch(
        _kernel, coeffs, scores_t, annotations, dterm, nat_mu,
        num_annotations)
    pm, pv, kl = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((P, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, ipad), nat_mu.dtype),
            jax.ShapeDtypeStruct((P, ipad), nat_mu.dtype),
            jax.ShapeDtypeStruct((1, 1), nat_mu.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * K * ipad,
            bytes_accessed=4 * ipad * (4 * P + 1),
            transcendentals=3 * K * ipad),
        interpret=interpret,
    )(*args)
    return pm[:, :I], pv[:, :I], kl[0, 0]


def _moments_kl_epilogue(d, ann, P, A, pm_ref, pv_ref, kl_ref):
    """Shared kernel tail: posterior moments + the accumulated beta-KL
    scalar from a derive-tile dict (see _kernel for the math notes)."""
    vd, y, diag = d['vd'], d['y'], d['diag']
    sel, ldp, logdet = d['sel'], d['ldp'], d['logdet']
    quadform, matches, log_vd = d['quadform'], d['matches'], d['log_vd']

    pm = [jnp.sum(vd * y[p], axis=0, keepdims=True) for p in range(P)]
    pv = [jnp.sum(vd * (diag[p] + y[p] * y[p]), axis=0, keepdims=True)
          - pm[p] * pm[p] for p in range(P)]
    pm_ref[...] = jnp.concatenate(pm, axis=0)
    pv_ref[...] = jnp.concatenate(pv, axis=0)

    log_hd = sel + 0.5 * ldp
    ss = ldp + logdet + matches
    per_k = vd * ((log_vd - log_hd) + 0.5 * quadform + 0.5 * ss)
    mask = (ann < A).astype(per_k.dtype)                   # [1, T]
    kl_tile = jnp.sum(per_k * mask).reshape(1, 1).astype(kl_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        kl_ref[...] = jnp.zeros((1, 1), kl_ref.dtype)

    kl_ref[...] += kl_tile


def _epochs_kernel(coeffs_ref, scores_ref, ann_ref, sld_ref, u_ref,
                   hist_ref, isc_ref, c_ref, pm_ref, pv_ref, kl_ref,
                   *, P, A, eps):
    ann = ann_ref[...]                                     # [1, T] int32
    d = _derive_tile_epochs(coeffs_ref, scores_ref, ann, sld_ref, u_ref,
                            hist_ref, isc_ref, c_ref, P=P, A=A, eps=eps)
    _moments_kl_epilogue(d, ann, P, A, pm_ref, pv_ref, kl_ref)


def _sums_epochs_kernel(coeffs_ref, scores_ref, ann_ref, sld_ref, u_ref,
                        hist_ref, isc_ref, c_ref, sums_ref,
                        *, P, A, eps):
    ann = ann_ref[...]
    d = _derive_tile_epochs(coeffs_ref, scores_ref, ann, sld_ref, u_ref,
                            hist_ref, isc_ref, c_ref, P=P, A=A, eps=eps)
    vd = d['vd']                                           # [K, T]
    T = ann.shape[1]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (A, T), 0)
              == ann).astype(vd.dtype)
    s_tile = jax.lax.dot_general(
        vd, onehot, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=sums_ref.dtype)             # [K, A]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    sums_ref[...] += s_tile


def _prep_launch_epochs(kernel, coeffs, scores_t, annotations, sld,
                        nat_u, hist_v, inv_scales, hist_c,
                        num_annotations):
    """Launch prep for the epoch kernels: operands are the raw
    scaled_ld_diags [P, I], the current-epoch accumulator [P, I], the
    [B, P, I] history, the [B+1, P] inverse scalings (row 0 = current)
    and [B] coefficients (both SMEM-resident scalars)."""
    K, A = scores_t.shape
    B, P, I = hist_v.shape
    assert A == num_annotations
    T = _pick_tile(K, P=P, epochs=B)
    ipad = -(-I // T) * T
    if ipad != I:
        pad = ipad - I
        annotations = jnp.pad(annotations, (0, pad),
                              constant_values=num_annotations)
        sld = jnp.pad(sld, ((0, 0), (0, pad)), constant_values=1.0)
        nat_u = jnp.pad(nat_u, ((0, 0), (0, pad)))
        hist_v = jnp.pad(hist_v, ((0, 0), (0, 0), (0, pad)))
    ann2 = annotations[None, :].astype(jnp.int32)
    eps = float(epsilon(nat_u.dtype))
    kern = functools.partial(kernel, P=P, A=A, eps=eps)
    ncol = coeffs.shape[1]
    in_specs = [
        pl.BlockSpec((K, ncol), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),         # coeffs
        pl.BlockSpec((K, A), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),         # scores.T
        pl.BlockSpec((1, T), lambda i: (0, i),
                     memory_space=pltpu.VMEM),         # annotations
        pl.BlockSpec((P, T), lambda i: (0, i),
                     memory_space=pltpu.VMEM),         # scaled_ld_diags
        pl.BlockSpec((P, T), lambda i: (0, i),
                     memory_space=pltpu.VMEM),         # nat_u
        pl.BlockSpec((B, P, T), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),         # hist
        pl.BlockSpec(memory_space=pltpu.SMEM),         # inv_scales
        pl.BlockSpec(memory_space=pltpu.SMEM),         # hist_c
    ]
    args = (coeffs, scores_t, ann2, sld, nat_u, hist_v,
            inv_scales, hist_c)
    return kern, (ipad // T,), in_specs, args, ipad, T


def prologue_epochs(coeffs, scores_t, annotations, sld, nat_u, hist_v,
                    inv_scales, hist_c, *, num_annotations,
                    interpret=False):
    """Fused (post_means, post_vars, beta_kl) of an epoch-history
    parameter point (sigma.compact_exprs_epochs semantics).

    Args beyond `prologue`'s: sld [P, I] raw scaled_ld_diags;
    nat_u [P, I] current-epoch accumulator; hist_v [B, P, I];
    inv_scales [B+1, P] (row 0 = 1/current error_scaling, row e+1 =
    1/epoch-e scaling); hist_c [B] coefficients."""
    B, P, I = hist_v.shape
    K, A = scores_t.shape
    kern, grid, in_specs, args, ipad, T = _prep_launch_epochs(
        _epochs_kernel, coeffs, scores_t, annotations, sld, nat_u,
        hist_v, inv_scales, hist_c, num_annotations)
    pm, pv, kl = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((P, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, ipad), nat_u.dtype),
            jax.ShapeDtypeStruct((P, ipad), nat_u.dtype),
            jax.ShapeDtypeStruct((1, 1), nat_u.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(20 * (B + 1) + 40) * K * ipad,
            bytes_accessed=4 * ipad * ((B + 3) * P + 1),
            transcendentals=3 * K * ipad),
        interpret=interpret,
    )(*args)
    return pm[:, :I], pv[:, :I], kl[0, 0]


def delta_sums_epochs(coeffs, scores_t, annotations, sld, nat_u, hist_v,
                      inv_scales, hist_c, *, num_annotations,
                      interpret=False):
    """Per-annotation sums of the derived vi_delta for the epoch state:
    [A, K] (see delta_sums)."""
    B, P, I = hist_v.shape
    K, A = scores_t.shape
    kern, grid, in_specs, args, ipad, _ = _prep_launch_epochs(
        _sums_epochs_kernel, coeffs, scores_t, annotations, sld, nat_u,
        hist_v, inv_scales, hist_c, num_annotations)
    sums = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((K, A), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, A), nat_u.dtype),
        cost_estimate=pl.CostEstimate(
            flops=(20 * (B + 1) + 30) * K * ipad + 2 * K * A * ipad,
            bytes_accessed=4 * ipad * ((B + 3) * P + 1),
            transcendentals=3 * K * ipad),
        interpret=interpret,
    )(*args)
    return sums.T


def _sums_kernel(coeffs_ref, scores_ref, ann_ref, dterm_ref, nat_ref,
                 sums_ref, *, P, A, eps, kdim=False):
    ann = ann_ref[...]                                     # [1, T] int32
    d = _derive_tile(coeffs_ref, scores_ref, ann, nat_ref, dterm_ref,
                     P=P, A=A, eps=eps, kdim=kdim)
    vd = d['vd']                                           # [K, T]
    T = ann.shape[1]
    # S[k, a] = sum_{t: ann_t == a} vd[k, t] — one MXU contraction per
    # tile against the one-hot annotation matrix; padding slots
    # (ann == A) select no column and drop out, matching the XLA
    # kernels.sum_annotations semantics.
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (A, T), 0)
              == ann).astype(vd.dtype)
    s_tile = jax.lax.dot_general(
        vd, onehot, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=sums_ref.dtype)             # [K, A]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    sums_ref[...] += s_tile


def delta_sums(coeffs, scores_t, annotations, dterm, nat_mu, *,
               num_annotations, interpret=False):
    """Per-annotation sums of the derived vi_delta: [A, K].

    The compact hyper-delta update (engine._update_hyper_delta_compact,
    reference variational_inference.py:825-860) needs only
    sum_annotations(vi_delta) — this computes it straight from the
    compact natural mean without materializing vi_delta (the XLA
    _derive_params route streams ~2 GB of [K, *, I] intermediates at
    1M SNPs for what is one [A, K] table). nat_mu: [P, I] or the
    per-component [K, P, I] scale_se state."""
    P = nat_mu.shape[-2]
    K, A = scores_t.shape
    kern, grid, in_specs, args, ipad, _ = _prep_launch(
        _sums_kernel, coeffs, scores_t, annotations, dterm, nat_mu,
        num_annotations)
    sums = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((K, A), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, A), nat_mu.dtype),
        cost_estimate=pl.CostEstimate(
            flops=50 * K * ipad + 2 * K * A * ipad,
            bytes_accessed=4 * ipad * (2 * P + 1),
            transcendentals=3 * K * ipad),
        interpret=interpret,
    )(*args)
    return sums.T


def build_coeffs(mixture_prec, log_det):
    """[K, ncol] kernel coefficient table: the upper triangle of each
    component's prior precision, then the prior log-determinant."""
    P = mixture_prec.shape[1]
    cols = [mixture_prec[:, p, q]
            for p in range(P) for q in range(p, P)]
    cols.append(log_det)
    return jnp.stack(cols, axis=1)
