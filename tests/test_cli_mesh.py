"""CLI-level sharded fit: --mesh snp=8 must reproduce the single-device
golden outputs (on the simulated 8-device CPU mesh)."""
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

DATA = os.path.join(os.environ.get('VILMA_REF', '/root/reference'),
                    'tests', 'test_data')

pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason='reference fixtures unavailable')


def d(fname):
    return os.path.join(DATA, fname)


def run_cli(*cli_args):
    env = dict(os.environ)
    env['PYTHONPATH'] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep
        + env.get('PYTHONPATH', ''))
    flags = env.get('XLA_FLAGS', '')
    if 'host_platform_device_count' not in flags:
        env['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()
    return subprocess.call([sys.executable, '-m', 'vilma_tpu.frontend']
                           + list(cli_args), env=env)


def test_cli_fit_mesh_matches_golden(tmp_path):
    out = str(tmp_path / 'vilma_run_mesh')
    assert run_cli('fit',
                   '--ld-schema', d('ld_manifest.tsv'),
                   '--sumstats', d('good_sumstats_beta.tsv'),
                   '--output', out,
                   '-K', '80',
                   '--ldthresh', '0.8',
                   '--init-hg', '0.2',
                   '--samplesizes', '10e3',
                   '--names', 'test_cohort',
                   '--learn-scaling',
                   '--mesh', 'snp=8',
                   '--extract', d('good_variants.tsv')) == 0
    truth = pd.read_csv(d('copy_vilma_run.estimates.tsv'), sep='\t',
                        header=0)
    cli = pd.read_csv(out + '.estimates.tsv', sep='\t', header=0)
    for col in truth.columns:
        if truth[col].dtype.kind in 'fc':
            assert np.allclose(truth[col], cli[col], rtol=1e-4,
                               atol=1e-10), col
        else:
            assert (truth[col] == cli[col]).all(), col
