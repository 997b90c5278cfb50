"""Pallas TPU kernel: fused low-rank block matvec, single U pass.

The hottest op in the VI loop (SURVEY.md section 3.2) is the
block-diagonal LD matvec  y_b = U_b (s_b * (U_b^T x_b)) + d_b * x_b  over
all blocks b. At genome scale it is HBM-bandwidth-bound and the U_b
tensors dominate traffic (Pmax*Rmax elements vs Pmax for everything
else). XLA expresses it as two batched matmuls and streams each U_b from
HBM twice per matvec; this kernel streams each U_b tile through VMEM
once and performs both contractions (MXU) plus the elementwise tail
(VPU) in one pass — halving the dominant traffic. It also takes C
right-hand sides at once (cohorts sharing an LD panel,
blocks.dot_multi), so C cohorts cost ONE U pass instead of 2*C.

bf16 U is supported (the production `fit --ld-precision bf16` path):
contractions run on the MXU with f32 accumulation, and the intermediate
t = s * (U^T x) is re-cast to bf16 before the second contraction to
match the XLA path's numerics (blocks._bucket_dot).

Grid: one program per block. EVERY operand is tiled per block (the old
kernel held s/d/x/y fully in VMEM — tens of MB at 6M SNPs); the Pallas
pipeline double-buffers the U tile so the next block's DMA overlaps the
current block's compute.
"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(s_ref, d_ref, x_ref, u_ref, y_ref):
    u = u_ref[0]                                  # [P, R] (f32 or bf16)
    x = x_ref[0]                                  # [C, P] f32
    t = jnp.dot(x.astype(u.dtype), u,
                preferred_element_type=jnp.float32)         # [C, R]
    t = t * s_ref[0]                              # s tile is [1, R]
    y = jax.lax.dot_general(
        t.astype(u.dtype), u,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [C, P]
    y_ref[0] = (y + d_ref[0] * x).astype(y_ref.dtype)       # d tile [1, P]


def shape_supported(pmax, rmax, dtype):
    """Whether the kernel's tiling applies to this bucket shape/dtype."""
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    # two pipeline buffers of the U tile plus the s/d/x/y tiles and
    # Mosaic's stack must fit the 16 MB VMEM: an 8 MB U tile was measured
    # to need 16.12 MB total and fail scoped-vmem allocation on v5e
    # (caught by ops/pallas/selftest.py), so cap the tile at 7 MB
    if pmax * rmax * itemsize > 7 * 1024 * 1024:
        return False
    return pmax % 128 == 0 and rmax % 128 == 0


def supported(pmax, rmax, dtype):
    """Whether the fused kernel applies to this bucket here and now."""
    if jax.default_backend() != 'tpu':
        # Mosaic compiles for TPU only; CPU/GPU callers use the XLA path
        # (or interpret mode, which bypasses this check)
        return False
    if jax.config.jax_enable_x64:
        # Mosaic rejects the kernel under x64 (i64 program ids fail
        # func.return legalization); the f32 fast path never enables x64
        return False
    return shape_supported(pmax, rmax, dtype)


def bucket_matvec_multi(u, s, d, x, interpret=False):
    """y[b, c] = u[b] @ (s[b] * (u[b].T @ x[b, c])) + d[b] * x[b, c].

    Args:
        u: [B, P, R] (f32 or bf16); s: [B, R]; d: [B, P]; x: [B, C, P].
    Returns: [B, C, P] in x.dtype.
    """
    B, P, R = u.shape
    C = x.shape[1]
    # Mosaic requires each block's last two dims to be (8,128)-divisible
    # or equal to the array dims; carry s/d with a singleton middle axis
    # so their [1, 1, *] tiles are legal.
    return pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),      # s
            pl.BlockSpec((1, 1, P), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),      # d
            pl.BlockSpec((1, C, P), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),      # x
            pl.BlockSpec((1, P, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),      # u (streamed)
        ],
        out_specs=pl.BlockSpec((1, C, P), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, P), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * C * P * R,
            bytes_accessed=u.dtype.itemsize * B * P * R
            + 4 * B * (R + P + 2 * C * P),
            transcendentals=0),
        interpret=interpret,
    )(s[:, None, :], d[:, None, :], x, u)


def bucket_matvec(u, s, d, x, interpret=False):
    """Single-RHS form: u [B, P, R]; s [B, R]; d, x [B, P] -> [B, P]."""
    return bucket_matvec_multi(u, s, d, x[:, None, :],
                               interpret=interpret)[:, 0, :]
