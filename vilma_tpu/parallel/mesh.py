"""Device-mesh sharding for the VI engine.

The reference is single-process shared-memory (SURVEY.md section 2.4); the
TPU-native parallel decomposition is designed from the math instead:

  * `snp` axis: LD blocks are independent, so every [*, I] tensor (and the
    packed block buckets) shards along the SNP/block axis — the sequence-
    parallel/data-parallel analog. Cross-device communication is only the
    scalar psums of ELBO terms and the [A, K] segment sums, plus boundary
    gathers for the genome<->block permutation.
  * `comp` axis: the K mixture components are independent in all heavy
    [K, P, I] tensors and contract only in O(I) reductions — the tensor-
    parallel analog. hyper_delta and mixture_prec stay replicated.

Everything uses jax.sharding.NamedSharding under jit: XLA's SPMD
partitioner inserts the collectives (psum over ICI, all-gathers for the
permutation), and the same program runs on 1 chip or a multi-host mesh via
jax.distributed.
"""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_snp=None, n_comp=1, devices=None):
    """Create a ('comp', 'snp') mesh over `devices`.

    Defaults to all available devices on the snp axis (block sharding
    scales with problem size; component sharding helps at very large K).
    """
    if devices is None:
        devices = jax.devices()
    if n_snp is None:
        n_snp = len(devices) // n_comp
    devices = np.asarray(devices[:n_comp * n_snp]).reshape(n_comp, n_snp)
    return Mesh(devices, axis_names=('comp', 'snp'))


def pad_to_multiple(x, multiple, axis, fill=0.0):
    """Pad `axis` of x up to a multiple (host-side, for even sharding)."""
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - size)
    return np.pad(x, widths, constant_values=fill)


def _spec_for(name, ndim, mesh):
    """PartitionSpec for a named engine array (see engine.ModelData /
    engine.VIState field comments for shapes)."""
    has_comp = mesh.shape['comp'] > 1
    comp = 'comp' if has_comp else None
    specs = {
        # ModelData [P, I] arrays
        'marginal_effects': P(None, 'snp'),
        'std_errs': P(None, 'snp'),
        'scalings': P(None, 'snp'),
        'ld_diags': P(None, 'snp'),
        'scaled_ld_diags': P(None, 'snp'),
        'adj_marginal_effects': P(None, 'snp'),
        'inverse_betas': P(None, 'snp'),
        'annotations': P('snp'),
        'chi_stat': P(),
        'ld_ranks': P(),
        'annotation_counts': P(),
        'mixture_prec': P(comp),
        'log_det': P(comp),
        # VIState
        'vi_mu': P(comp, None, 'snp'),
        'vi_delta': P('snp', comp),
        'hyper_delta': P(None, comp),
        'error_scaling': P(),
        'nat_grad_vi_delta': P('snp'),
        'L': P(),
        'elbo': P(),
        'running_elbo_delta': P(),
        'num_err': P(),
        # SigmaSummaries
        'log_det_sigma': P(comp, 'snp'),
        'sigma_summary': P('snp', comp),
        'diag': P(comp, None, 'snp'),
        'matches': P('snp', comp),
        # PackedLD buckets: shard the block axis
        'u': P('snp'),
        'grows': P('snp'),
        'srows': P('snp'),
        's': P('snp'),
        'inv_s': P('snp'),
        'd': P('snp'),
        'perm': P('snp'),
    }
    spec = specs.get(name)
    if spec is None:
        spec = P()
    return NamedSharding(mesh, spec)


def _shard_dataclass(obj, mesh):
    import dataclasses
    updates = {}
    for f in dataclasses.fields(obj):
        val = getattr(obj, f.name)
        if isinstance(val, jax.Array) or isinstance(val, np.ndarray):
            sharding = _spec_for(f.name, np.ndim(val), mesh)
            updates[f.name] = jax.device_put(val, sharding)
        elif dataclasses.is_dataclass(val):
            updates[f.name] = _shard_dataclass(val, mesh)
        elif isinstance(val, tuple) and val and dataclasses.is_dataclass(
                val[0]):
            updates[f.name] = tuple(_shard_dataclass(v, mesh) for v in val)
    return dataclasses.replace(obj, **updates)


def shard_data(data, mesh):
    """Place a ModelData pytree onto the mesh with engine shardings.

    Note: bucket block counts and the I axis need not be divisible by the
    mesh — XLA pads uneven shards — but even divisions avoid stragglers.
    """
    return _shard_dataclass(data, mesh)


def shard_state(state, mesh):
    """Place a VIState pytree onto the mesh with engine shardings."""
    return _shard_dataclass(state, mesh)
