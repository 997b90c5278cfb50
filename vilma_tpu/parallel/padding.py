"""SNP-axis and block-axis padding for even mesh sharding.

XLA sharding requires dimension sizes divisible by the mesh axis (SURVEY.md
section 7.3 item 2: ragged blocks on a rigid accelerator). Padding SNPs are
constructed to be *exactly* inert:

  * beta = 0, SE = 1, ld_diag = 0, adj_marginal = 0  -> zero likelihood
    contribution (identical to the reference's missing-LD SNPs,
    variational_inference.py:254-259);
  * annotation id = num_annotations (a sentinel) -> excluded from
    sum_annotations and the delta KL (see ops/kernels.py);
  * no LD block covers them -> natural gradients vanish, vi_mu stays 0.

Padding blocks (for the bucket axis) are all-zero with sentinel perm, so
they scatter nothing.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp


def _round_up(n, m):
    return -(-n // m) * m


def _pad_axis(arr, axis, target, value=0.0):
    pad = target - arr.shape[axis]
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths, constant_values=value)


def _pad_ld(ld, new_n, block_multiple):
    """Extend sentinel slots to new_n and pad bucket block counts."""
    new_buckets = []
    for bk in ld.buckets:
        B = bk.num_blocks
        B_new = _round_up(B, block_multiple)
        perm = jnp.where(bk.perm == ld.n, new_n, bk.perm)
        seq = jnp.where(bk.seq == ld.n, new_n, bk.seq)
        bk = dataclasses.replace(
            bk,
            u=_pad_axis(bk.u, 0, B_new),
            s=_pad_axis(bk.s, 0, B_new),
            inv_s=_pad_axis(bk.inv_s, 0, B_new),
            d=_pad_axis(bk.d, 0, B_new),
            perm=_pad_axis(perm, 0, B_new, value=new_n),
            # pad blocks gather row 0 (zero contribution: their u/d are 0)
            # and scatter to the trash row
            grows=_pad_axis(bk.grows, 0, B_new, value=0),
            srows=_pad_axis(bk.srows, 0, B_new, value=-1),
            seq=_pad_axis(seq, 0, B_new, value=new_n),
        )
        new_buckets.append(bk)
    return dataclasses.replace(ld, buckets=tuple(new_buckets), n=new_n)


def pad_model_data(data, multiple):
    """Pad a ModelData's SNP axis (and bucket block axes) to `multiple`.

    Returns (padded ModelData, original num_loci)."""
    P, I = data.marginal_effects.shape
    I_new = _round_up(I, multiple)

    def pad_pi(x, value=0.0):
        return _pad_axis(x, 1, I_new, value)

    new_ld = tuple(_pad_ld(ld, I_new, multiple) for ld in data.ld)
    return dataclasses.replace(
        data,
        marginal_effects=pad_pi(data.marginal_effects),
        std_errs=pad_pi(data.std_errs, 1.0),
        scalings=pad_pi(data.scalings, 1.0),
        ld_diags=pad_pi(data.ld_diags),
        scaled_ld_diags=pad_pi(data.scaled_ld_diags),
        adj_marginal_effects=pad_pi(data.adj_marginal_effects),
        inverse_betas=pad_pi(data.inverse_betas),
        annotations=_pad_axis(data.annotations, 0, I_new,
                              value=data.num_annotations),
        ld=new_ld,
    ), I
