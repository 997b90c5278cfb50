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

Grid: one program per GROUP of blocks. Grouping several blocks into one
~4 MB U tile matters at genome scale: with one 1024x512 bf16 block
(1 MB) per grid step the 1M-SNP bucket runs ~1000 steps whose per-step
overhead (~2 us of DMA issue + semaphore latency) dominated the ~1.3 us
the HBM stream itself needs — measured 3.08 ms for a 1.02 GB U pass
(~330 GB/s). Grouped tiles amortize that overhead; the Pallas pipeline
still double-buffers so the next group's DMA overlaps this group's
compute. Ragged tails (num_blocks % group != 0) rely on Pallas'
out-of-range masking: reads of the pad region are unused garbage, pad
writes are dropped.
"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# target bytes of U per grid step (two pipeline buffers of this plus the
# s/d/x/y tiles and Mosaic's stack must fit the 16 MB VMEM; an 8 MB tile
# was measured to need 16.12 MB total and fail scoped-vmem allocation on
# v5e — caught by ops/pallas/selftest.py)
_TILE_BYTES = 4 * 1024 * 1024
_TILE_CAP = 7 * 1024 * 1024


def _group(pmax, rmax, dtype):
    """Blocks per grid step for this bucket shape."""
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    return max(1, _TILE_BYTES // (pmax * rmax * itemsize))


def _kernel(s_ref, d_ref, x_ref, u_ref, y_ref):
    u = u_ref[...]                                # [G, P, R] (f32 or bf16)
    x = x_ref[...]                                # [G, C, P] f32
    t = jax.lax.dot_general(
        x.astype(u.dtype), u,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # [G, C, R]
    t = t * s_ref[...]                            # s tile is [G, 1, R]
    y = jax.lax.dot_general(
        t.astype(u.dtype), u,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # [G, C, P]
    y_ref[...] = (y + d_ref[...] * x).astype(y_ref.dtype)  # d tile [G, 1, P]


def shape_supported(pmax, rmax, dtype):
    """Whether the kernel's tiling applies to this bucket shape/dtype."""
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    g = _group(pmax, rmax, dtype)
    if g * pmax * rmax * itemsize > _TILE_CAP:
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
    G = min(_group(P, R, u.dtype), B)
    # Mosaic requires each block's last two dims to be (8,128)-divisible
    # or equal to the array dims; carry s/d with a singleton middle axis
    # so their [G, 1, *] tiles are legal.
    return pl.pallas_call(
        _kernel,
        grid=(pl.cdiv(B, G),),
        in_specs=[
            pl.BlockSpec((G, 1, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),      # s
            pl.BlockSpec((G, 1, P), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),      # d
            pl.BlockSpec((G, C, P), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),      # x
            pl.BlockSpec((G, P, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),      # u (streamed)
        ],
        out_specs=pl.BlockSpec((G, C, P), lambda b: (b, 0, 0),
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
