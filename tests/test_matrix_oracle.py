"""Property tests: PackedLD vs the reference BlockDiagonalMatrix oracle.

Random multi-block, permuted, missing-index problems; every public matrix
operation compared directly against the reference implementation imported
in-process (tests/reference_oracle.py).
"""
import os

import numpy as np
import pytest

from vilma_tpu.ops import blocks

pytestmark = pytest.mark.skipif(
    not os.path.isdir('/root/reference/src'),
    reason='reference tree unavailable')


def _random_problem(rng, sizes, n_missing, t=1.0):
    from tests import reference_oracle
    reference_oracle.install()
    from vilma import matrix_structures as ref_ms

    total = sum(sizes)
    n = total + n_missing
    order = rng.permutation(n)
    ref_blocks, factors_dense, idx_lists = [], [], []
    off = 0
    for sz in sizes:
        a = rng.standard_normal((sz, max(1, sz - rng.integers(0, 2))))
        x = a @ a.T / a.shape[1]
        d = np.diag(1 / np.sqrt(np.diag(x) + 1e-9))
        x = d @ x @ d
        ref_blocks.append(ref_ms.LowRankMatrix(X=x, t=t))
        factors_dense.append(x)
        idx_lists.append(order[off:off + sz])
        off += sz
    perm = np.concatenate(idx_lists + [order[total:]])
    missing = np.array(sorted(order[total:]), dtype=int)
    ref_mat = ref_ms.BlockDiagonalMatrix(ref_blocks, perm=perm,
                                         missing=missing)
    mine = blocks.from_dense_blocks(factors_dense, idx_lists, n, t=t)
    return ref_mat, mine, n


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('t', [1.0, 0.8])
def test_ops_match_reference(seed, t):
    rng = np.random.default_rng(seed)
    sizes = list(rng.integers(3, 12, size=4))
    ref_mat, mine, n = _random_problem(rng, sizes, n_missing=3, t=t)
    v = rng.standard_normal(n)

    assert np.allclose(ref_mat.dot(v), np.asarray(mine.dot(v)), atol=1e-9)
    assert np.allclose(ref_mat.diag(), np.asarray(mine.diag()), atol=1e-9)
    assert np.allclose(ref_mat.inverse.dot(v),
                       np.asarray(mine.inverse.dot(v)), atol=1e-7)
    reg = rng.uniform(0.1, 1.0, size=n)
    assert np.allclose(ref_mat.ridge_inverse_dot(v, reg),
                       np.asarray(mine.ridge_inverse_dot(v, reg)),
                       atol=1e-8)
    assert np.allclose(ref_mat.ridge_inverse_dot(v, 0.37),
                       np.asarray(mine.ridge_inverse_dot(v, 0.37)),
                       atol=1e-8)
    assert ref_mat.get_rank() == mine.get_rank()
    for i in range(0, n, 3):
        assert np.allclose(ref_mat.dot_i(v, i), float(mine.dot_i(v, i)),
                           atol=1e-9)
    # matrix_power inherits the reference's perm-forgetting behavior
    half_ref = ref_mat.matrix_power(0.5)
    half_mine = mine.matrix_power(0.5)
    assert np.allclose(half_ref.dot(v), np.asarray(half_mine.dot(v)),
                       atol=1e-8)
