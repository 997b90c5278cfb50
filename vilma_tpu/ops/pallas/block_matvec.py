"""Pallas TPU kernel: fused low-rank block matvec.

The hottest op in the VI loop (SURVEY.md section 3.2) is the
block-diagonal LD matvec  y_b = U_b (s_b * (U_b^T x_b)) + d_b * x_b  over
all blocks b. It is HBM-bandwidth-bound: the U_b tensors dominate traffic
(Pmax*Rmax elements vs Pmax for everything else). XLA expresses it as two
batched matmuls and reads each U_b from HBM twice; this kernel loads each
U_b tile into VMEM once and performs both contractions (MXU) plus the
elementwise tail (VPU) in one pass — a ~2x reduction of the dominant HBM
traffic.

Grid: one program per block. A [Pmax, Rmax] f32 tile must fit VMEM
(<= 16MB), true for all bucket tiers (max 8192 x 8192 would not, but tiers
above 2048 x 2048 fall back to XLA; see `supported`).
"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(u_ref, s_ref, d_ref, x_ref, y_ref):
    u = u_ref[0]                        # [P, R]
    x = x_ref[:]                        # [1, P]
    t = jnp.dot(x, u, preferred_element_type=jnp.float32)   # [1, R]
    t = t * s_ref[:]
    y = jax.lax.dot_general(
        t, u, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [1, P]
    y_ref[:] = y + d_ref[:] * x


def supported(pmax, rmax, dtype):
    """Whether the fused kernel applies to this bucket."""
    if dtype != jnp.float32:
        return False
    if pmax * rmax * 4 > 8 * 1024 * 1024:   # tile must fit VMEM comfortably
        return False
    return pmax >= 128 and rmax >= 128


def bucket_matvec(u, s, d, x, interpret=False):
    """y[b] = u[b] @ (s[b] * (u[b].T @ x[b])) + d[b] * x[b].

    Args:
        u: [B, P, R]; s: [B, R]; d, x: [B, P].
    Returns: [B, P].
    """
    B, P, R = u.shape
    grid = (B,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, P, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * P * R,
            bytes_accessed=4 * B * (P * R + R + 3 * P),
            transcendentals=0),
        interpret=interpret,
    )(u, s, d, x)
