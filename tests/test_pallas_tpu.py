"""TPU-hardware gate for the Mosaic block-matvec kernel.

Skipped under the CPU-pinned CI conftest; on a machine with a TPU
attached, run it directly:

    JAX_PLATFORMS='' python -m pytest tests/test_pallas_tpu.py -q

(or `python bench.py --selftest`). Rationale in
vilma_tpu/ops/pallas/selftest.py: round 2 shipped a kernel that passed
every interpret-mode test but never compiled on real TPU.
"""
import jax
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() == 'cpu',
    reason='needs TPU hardware (interpret-mode cannot catch Mosaic '
           'compile rejections); run bench.py --selftest on a TPU VM')


def test_kernel_compiles_and_matches_oracle_on_device():
    from vilma_tpu.ops.pallas import selftest
    results = selftest.run_selftest(verbose=None)
    assert len(results) >= 8
