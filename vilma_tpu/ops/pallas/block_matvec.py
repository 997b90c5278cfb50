"""Pallas TPU kernel: fused low-rank block matvec.

The hottest op in the VI loop (SURVEY.md section 3.2) is the
block-diagonal LD matvec  y_b = U_b (s_b * (U_b^T x_b)) + d_b * x_b  over
all blocks b. It is HBM-bandwidth-bound: the U_b tensors dominate traffic
(Pmax*Rmax elements vs Pmax for everything else). XLA expresses it as two
batched matmuls and reads each U_b from HBM twice; this kernel streams
each U_b tile through VMEM once and performs both contractions (MXU) plus
the elementwise tail (VPU) in one pass — halving the dominant HBM
traffic.

Grid: one program per block, with the U tile double-buffered by the
Pallas pipeline ((1, P, R) blocks). The small per-block vectors (s, d, x,
y) are held in VMEM in full (hundreds of KB for ~100 blocks) and indexed
by program id.
"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(s_ref, d_ref, x_ref, u_ref, y_ref):
    b = pl.program_id(0)
    u = u_ref[0]                                  # [P, R]
    x = x_ref[b][None, :]                         # [1, P]
    t = jnp.dot(x, u, preferred_element_type=jnp.float32)   # [1, R]
    t = t * s_ref[b][None, :]
    y = jax.lax.dot_general(
        t, u, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [1, P]
    y_ref[b, :] = (y + d_ref[b][None, :] * x)[0]


def supported(pmax, rmax, dtype):
    """Whether the fused kernel applies to this bucket."""
    if dtype != jnp.float32:
        return False
    if jax.config.jax_enable_x64:
        # Mosaic rejects the kernel under x64 (i64 program ids fail
        # func.return legalization); the f32 fast path never enables x64
        return False
    if pmax * rmax * 4 > 8 * 1024 * 1024:   # U tile must fit VMEM (2 bufs)
        return False
    return pmax >= 128 and rmax >= 128


def bucket_matvec(u, s, d, x, interpret=False):
    """y[b] = u[b] @ (s[b] * (u[b].T @ x[b])) + d[b] * x[b].

    Args:
        u: [B, P, R]; s: [B, R]; d, x: [B, P].
    Returns: [B, P].
    """
    B, P, R = u.shape
    return pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # s (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # d (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x (full)
            pl.BlockSpec((1, P, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # u (per-block tile)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * P * R,
            bytes_accessed=4 * B * (P * R + R + 3 * P),
            transcendentals=0),
        interpret=interpret,
    )(s, d, x, u)
