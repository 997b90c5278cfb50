"""Mesh-sharding tests on a simulated 8-device CPU mesh.

The reference has nothing distributed (SURVEY.md section 2.4); these tests
validate the TPU-native parallel decomposition: the full jitted VI step
runs under block/SNP sharding (+ component sharding) and produces the same
numbers as the single-device run.
"""
import numpy as np
import pytest
import jax

from vilma_tpu.inference import engine
from vilma_tpu.parallel import mesh as mesh_mod
from vilma_tpu.utils import synthetic


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 simulated devices')


def _problem():
    data = synthetic.synthetic_problem(num_loci=256, num_pops=2,
                                       num_components=2, block_size=16,
                                       num_annotations=2)
    state = synthetic.synthetic_state(data)
    return data, state


def test_sharded_step_matches_unsharded():
    data, state = _problem()
    st1, pm1 = engine.outer_step(data, state, line_search_rate=2.0)

    mesh = mesh_mod.make_mesh(n_snp=8, n_comp=1)
    sdata = mesh_mod.shard_data(data, mesh)
    sstate = mesh_mod.shard_state(state, mesh)
    with jax.set_mesh(mesh):
        st2, pm2 = engine.outer_step(sdata, sstate, line_search_rate=2.0)

    assert np.allclose(np.asarray(pm1), np.asarray(pm2), rtol=1e-10,
                       atol=1e-12)
    # elbo is tracked via accumulated deltas of ~1e9 magnitude; reduction
    # reassociation across shards gives ~1e-6 absolute differences
    assert np.allclose(float(st1.elbo), float(st2.elbo), rtol=1e-8)
    assert np.allclose(np.asarray(st1.hyper_delta),
                       np.asarray(st2.hyper_delta), rtol=1e-10)


def test_comp_sharded_mesh():
    data, state = _problem()
    st1, pm1 = engine.outer_step(data, state, line_search_rate=2.0)
    mesh = mesh_mod.make_mesh(n_snp=4, n_comp=2)
    sdata = mesh_mod.shard_data(data, mesh)
    sstate = mesh_mod.shard_state(state, mesh)
    with jax.set_mesh(mesh):
        st2, pm2 = engine.outer_step(sdata, sstate, line_search_rate=2.0)
    assert np.allclose(np.asarray(pm1), np.asarray(pm2), rtol=1e-10,
                       atol=1e-12)


def test_dryrun_multichip():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        'graft_entry', os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            '__graft_entry__.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
