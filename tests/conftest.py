"""Test configuration: CPU backend with a simulated 8-device mesh and x64.

Multi-chip TPU hardware is not available in CI; collectives/sharding tests
run against XLA's host-platform device simulation (SURVEY.md section 4).
Parity tests against the reference's float64 goldens need x64.
"""
import os

# force, not setdefault: the host environment may carry a TPU plugin
# platform (e.g. JAX_PLATFORMS=axon), and CLI tests spawn subprocesses
# that inherit os.environ — without the override they would silently
# run golden-parity fits on the accelerator (slow, f32, wrong tier)
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The environment may pre-import jax and pin jax_platforms to a TPU plugin
# (overriding JAX_PLATFORMS); force CPU explicitly before any backend use.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
