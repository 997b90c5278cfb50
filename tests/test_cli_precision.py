"""--precision auto resolution (round-2 review: a default `fit` on an
accelerator VM must not silently run the f64 CPU path)."""
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from vilma_tpu.commands import fit as fit_mod

REF = os.environ.get('VILMA_REF', '/root/reference')
DATA = os.path.join(REF, 'tests', 'test_data')


def test_auto_resolves_f32_with_accelerator(monkeypatch):
    monkeypatch.setattr(fit_mod, '_accelerator_available', lambda: True)
    assert fit_mod._resolve_precision('auto') == 'f32'


def test_auto_resolves_f64_without_accelerator(monkeypatch):
    monkeypatch.setattr(fit_mod, '_accelerator_available', lambda: False)
    assert fit_mod._resolve_precision('auto') == 'f64'


def test_explicit_choices_pass_through(monkeypatch):
    # explicit --precision must never be second-guessed (nor pay a probe)
    def boom():
        raise AssertionError('probe must not run for explicit choices')
    monkeypatch.setattr(fit_mod, '_accelerator_available', boom)
    assert fit_mod._resolve_precision('f32') == 'f32'
    assert fit_mod._resolve_precision('f64') == 'f64'


def test_probe_short_circuits_on_cpu_platforms(monkeypatch):
    # JAX_PLATFORMS=cpu answers without spawning a probe subprocess
    monkeypatch.setenv('JAX_PLATFORMS', 'cpu')

    def boom(*a, **k):
        raise AssertionError('no subprocess expected')
    monkeypatch.setattr(subprocess, 'run', boom)
    assert fit_mod._accelerator_available() is False


@pytest.mark.skipif(not os.path.isdir(DATA),
                    reason='reference fixtures unavailable')
def test_cli_default_precision_is_f64_on_cpu(tmp_path):
    """End-to-end: under a cpu-pinned environment the default (auto)
    resolves to the f64 parity path and the run still matches the
    reference golden."""
    out = str(tmp_path / 'vilma_run')
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep
        + env.get('PYTHONPATH', ''))
    log_path = str(tmp_path / 'fit.log')
    code = subprocess.call(
        [sys.executable, '-m', 'vilma_tpu.frontend', 'fit',
         '--logfile', log_path, '--verbose',
         '--ld-schema', os.path.join(DATA, 'ld_manifest.tsv'),
         '--sumstats', os.path.join(DATA, 'good_sumstats_beta.tsv'),
         '--output', out,
         '-K', '80', '--ldthresh', '0.8', '--init-hg', '0.2',
         '--samplesizes', '10e3', '--names', 'test_cohort',
         '--extract', os.path.join(DATA, 'good_variants.tsv'),
         '--num-its', '12'],
        env=env)
    assert code == 0
    with open(log_path) as fh:
        log = fh.read()
    assert 'Selected --precision f64' in log
    # the resolved-f64 run must produce float64 outputs
    est = pd.read_csv(out + '.estimates.tsv', sep='\t', header=0)
    assert np.isfinite(est['posterior_test_cohort']).all()
