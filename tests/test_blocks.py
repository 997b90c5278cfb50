"""Unit tests for the packed block-matrix core.

Mirrors the reference's structured-matrix test tier
(reference tests/test.py:28-477): every operation validated against dense
numpy ground truth on small random symmetric matrices, including permutation
semantics, missing-index zero semantics, pseudo-inverse behavior, and rank
conventions.
"""
import numpy as np
import pytest

from vilma_tpu.ops import blocks, lowrank


def random_symmetric(n, rng, rank=None):
    if rank is None:
        rank = n
    a = rng.standard_normal((n, rank))
    return a @ a.T / rank


def test_eigh_threshold_reconstructs():
    rng = np.random.default_rng(0)
    x = random_symmetric(5, rng)
    u, s = lowrank.eigh_threshold(x, 1.0)
    # ldthresh=1 keeps everything nonnegative; x is PSD so full reconstruction
    assert np.allclose((u * s) @ u.T, x)


def test_eigh_threshold_truncates():
    rng = np.random.default_rng(1)
    x = random_symmetric(6, rng)
    for t in [0.99, 0.9, 0.5, 0.1]:
        u, s = lowrank.eigh_threshold(x, t)
        assert np.all(s >= 1 - np.sqrt(t))


def test_eigh_threshold_sentinel():
    # matrix with all eigenvalues below threshold -> rank-0 sentinel
    x = np.eye(4) * 1e-6
    u, s = lowrank.eigh_threshold(x, 0.5)
    assert u.shape == (4, 1)
    assert np.allclose(s, 0)


def test_rank_conventions():
    rng = np.random.default_rng(2)
    x = random_symmetric(5, rng, rank=3)
    f = lowrank.factor_block(X=x, t=1.0)
    assert f.rank == np.linalg.matrix_rank(x, tol=1e-8)
    sentinel = lowrank.factor_block(X=np.eye(4) * 1e-8, t=0.5)
    assert sentinel.rank == 0


def test_factor_requires_symmetric():
    with pytest.raises(ValueError):
        lowrank.factor_block(X=np.arange(9.).reshape(3, 3))


def test_factor_rejects_both_inputs():
    with pytest.raises(ValueError):
        lowrank.factor_block(X=np.eye(2), u=np.eye(2))
    with pytest.raises(ValueError):
        lowrank.factor_block(u=np.eye(2))


def _make_packed(rng, sizes, n=None, permute=True, t=1.0):
    """Build dense ground truth + PackedLD with a random permutation."""
    total = sum(sizes)
    if n is None:
        n = total + 3   # leave 3 missing indices
    order = rng.permutation(n) if permute else np.arange(n)
    idx_lists, dense_blocks = [], []
    off = 0
    for sz in sizes:
        dense_blocks.append(random_symmetric(sz, rng))
        idx_lists.append(order[off:off + sz])
        off += sz
    ld = blocks.from_dense_blocks(dense_blocks, idx_lists, n, t=t)
    dense = np.zeros((n, n))
    for x, ix in zip(dense_blocks, idx_lists):
        dense[np.ix_(ix, ix)] = x
    return ld, dense, order[total:]


def test_dot_matches_dense():
    rng = np.random.default_rng(3)
    ld, dense, missing = _make_packed(rng, [5, 3, 7])
    v = rng.standard_normal(dense.shape[0])
    assert np.allclose(np.asarray(ld.dot(v)), dense @ v)


def test_dot_mixed_bucket_sizes():
    rng = np.random.default_rng(4)
    ld, dense, _ = _make_packed(rng, [2, 9, 33, 5])
    assert len(ld.buckets) >= 2
    v = rng.standard_normal(dense.shape[0])
    assert np.allclose(np.asarray(ld.dot(v)), dense @ v)


def test_dot_missing_rows_are_zero():
    rng = np.random.default_rng(5)
    ld, dense, missing = _make_packed(rng, [4, 4])
    v = rng.standard_normal(dense.shape[0])
    out = np.asarray(ld.dot(v))
    assert np.allclose(out[list(missing)], 0)
    assert sorted(ld.missing) == sorted(missing.tolist())


def test_dot_i():
    rng = np.random.default_rng(6)
    ld, dense, _ = _make_packed(rng, [5, 3])
    v = rng.standard_normal(dense.shape[0])
    for i in range(dense.shape[0]):
        assert np.allclose(float(ld.dot_i(v, i)), (dense @ v)[i])


def test_diag():
    rng = np.random.default_rng(7)
    ld, dense, _ = _make_packed(rng, [5, 6])
    assert np.allclose(np.asarray(ld.diag()), np.diag(dense))


def test_inverse_dot_pseudoinverse():
    rng = np.random.default_rng(8)
    # include a rank-deficient block: pinv semantics
    ld, dense, _ = _make_packed(rng, [5, 4])
    v = rng.standard_normal(dense.shape[0])
    expect = np.linalg.pinv(dense, hermitian=True) @ v
    assert np.allclose(np.asarray(ld.inverse.dot(v)), expect, atol=1e-8)


def test_inverse_dot_singular_block():
    rng = np.random.default_rng(9)
    x = random_symmetric(5, rng, rank=2)   # singular block
    ld = blocks.from_dense_blocks([x], [np.arange(5)], 5)
    v = rng.standard_normal(5)
    expect = np.linalg.pinv(x, hermitian=True) @ v
    assert np.allclose(np.asarray(ld.inverse.dot(v)), expect, atol=1e-8)


def test_ridge_inverse_dot_scalar_and_vector():
    rng = np.random.default_rng(10)
    ld, dense, missing = _make_packed(rng, [5, 3, 8])
    n = dense.shape[0]
    v = rng.standard_normal(n)
    for reg in [0.5, rng.uniform(0.1, 1.0, size=n)]:
        got = np.asarray(ld.ridge_inverse_dot(v, reg))
        regv = np.zeros(n) + reg
        expect = np.zeros(n)
        live = np.setdiff1d(np.arange(n), missing)
        sub = dense[np.ix_(live, live)] + np.diag(regv[live])
        expect[live] = np.linalg.solve(sub, v[live])
        assert np.allclose(got, expect, atol=1e-8)
        assert np.allclose(got[list(missing)], 0)


def test_ridge_inverse_dot_truncated():
    # after eigenvalue truncation the block is low-rank + ridge: Woodbury path
    rng = np.random.default_rng(11)
    x = random_symmetric(6, rng)
    f = lowrank.factor_block(X=x, t=0.5)
    ld = blocks.pack([f], [np.arange(6)], 6)
    v = rng.standard_normal(6)
    approx = f.dense()
    expect = np.linalg.solve(approx + 0.3 * np.eye(6), v)
    got = np.asarray(ld.ridge_inverse_dot(v, 0.3))
    assert np.allclose(got, expect, atol=1e-8)


def test_ridge_inverse_dot_chunked_solve(monkeypatch):
    """The genome-scale chunked Woodbury solve (bounded [C,R,R] temps)
    must be bitwise-equivalent to the single-chunk form: per-block
    results are independent, so chunk boundaries change nothing."""
    rng = np.random.default_rng(21)
    # one bucket of many same-size blocks, so chunking actually splits it
    ld, dense, missing = _make_packed(rng, [6] * 11)
    n = dense.shape[0]
    v = rng.standard_normal(n)
    reg = rng.uniform(0.1, 1.0, size=n)
    whole = np.asarray(blocks.ridge_inverse_dot(ld, v, reg))
    # force ~3-block chunks (rmax is small, so elems // r^2 covers 3)
    rmax = max(bk.rmax for bk in ld.buckets)
    monkeypatch.setattr(blocks, '_WOODBURY_CHUNK_ELEMS', 3 * rmax * rmax)
    chunked = np.asarray(blocks.ridge_inverse_dot(ld, v, reg))
    assert np.array_equal(whole, chunked)

    live = np.setdiff1d(np.arange(n), missing)
    expect = np.zeros(n)
    sub = dense[np.ix_(live, live)] + np.diag(reg[live])
    expect[live] = np.linalg.solve(sub, v[live])
    assert np.allclose(chunked, expect, atol=1e-8)


def test_matrix_power():
    # unpermuted matrix (missing at the end): powers match dense powers
    rng = np.random.default_rng(12)
    ld, dense, missing = _make_packed(rng, [5, 4], permute=False)
    v = rng.standard_normal(dense.shape[0])
    sq = ld.matrix_power(2)
    assert np.allclose(np.asarray(sq.dot(v)), dense @ dense @ v)
    half = ld.matrix_power(0.5)
    assert np.allclose(np.asarray(half.dot(np.asarray(half.dot(v)))),
                       dense @ v, atol=1e-8)


def test_matrix_power_forgets_permutation():
    # reference semantics: BlockDiagonalMatrix.matrix_power rebuilds the
    # matrix without perm (matrix_structures.py:410-416), so block results
    # land at sequential offsets regardless of the genome permutation
    rng = np.random.default_rng(24)
    sizes = [5, 4]
    ld, dense, missing = _make_packed(rng, sizes, permute=True)
    v = rng.standard_normal(dense.shape[0])
    # expected: blocks squared at sequential offsets, zeros at the end
    sq = ld.matrix_power(2)
    got = np.asarray(sq.dot(v))
    live = np.setdiff1d(np.arange(dense.shape[0]), missing)
    # recover per-block dense in insertion order from the packed object
    expect = np.zeros_like(v)
    perm_all = np.concatenate(
        [np.asarray(bk.perm).reshape(-1) for bk in ld.buckets])
    # sequential composition equals the permuted-submatrix square applied
    # in block coordinates
    seq_dense = np.zeros((dense.shape[0], dense.shape[0]))
    offset = 0
    for bk in ld.buckets:
        for b in range(bk.num_blocks):
            rows = np.asarray(bk.perm)[b]
            rows = rows[rows < dense.shape[0]]
            sub = dense[np.ix_(rows, rows)]
            nb = len(rows)
            seq = np.asarray(bk.seq)[b][:nb]
            seq_dense[np.ix_(seq, seq)] = sub @ sub
            offset += nb
    expect = seq_dense @ v
    assert np.allclose(got, expect)


def test_get_rank():
    rng = np.random.default_rng(13)
    full = random_symmetric(5, rng)
    lowr = random_symmetric(6, rng, rank=2)
    ld = blocks.from_dense_blocks([full, lowr],
                                  [np.arange(5), np.arange(5, 11)], 12)
    assert ld.get_rank() == 5 + 2


def test_rank_monotone_in_threshold():
    rng = np.random.default_rng(14)
    x = random_symmetric(8, rng)
    ranks = []
    for t in [1.0, 0.9, 0.5, 0.1, 0.01]:
        f = lowrank.factor_block(X=x, t=t)
        ranks.append(f.rank)
    assert all(a >= b for a, b in zip(ranks, ranks[1:]))


def test_inverted_not_implemented_contracts():
    rng = np.random.default_rng(15)
    ld, dense, _ = _make_packed(rng, [4])
    inv = ld.inverse
    with pytest.raises(NotImplementedError):
        inv.dot_i(np.ones(dense.shape[0]), 0)
    with pytest.raises(NotImplementedError):
        inv.ridge_inverse_dot(np.ones(dense.shape[0]), 1.0)
    with pytest.raises(NotImplementedError):
        inv.diag()
    # double inversion round-trips
    v = rng.standard_normal(dense.shape[0])
    assert np.allclose(np.asarray(inv.inverse.dot(v)), np.asarray(ld.dot(v)))


def test_pack_rejects_duplicates():
    with pytest.raises(ValueError):
        blocks.from_dense_blocks([np.eye(2), np.eye(2)],
                                 [np.array([0, 1]), np.array([1, 2])], 4)


def test_to_dense_roundtrip():
    rng = np.random.default_rng(16)
    ld, dense, _ = _make_packed(rng, [3, 5])
    assert np.allclose(blocks.to_dense(ld), dense)


def test_packed_is_jittable():
    import jax

    rng = np.random.default_rng(17)
    ld, dense, _ = _make_packed(rng, [5, 3])
    v = rng.standard_normal(dense.shape[0])

    @jax.jit
    def f(ld, v):
        return blocks.dot(ld, v)

    assert np.allclose(np.asarray(f(ld, v)), dense @ v)


def test_inverse_dot_invertible_diag():
    """Woodbury branch for blocks with an invertible diagonal component
    (reference matrix_structures.py:187-196, tests/test.py:138-143)."""
    rng = np.random.default_rng(21)
    x = random_symmetric(5, rng)
    f = lowrank.factor_block(X=x, t=1.0)
    d = rng.random(5) + 0.5
    f = lowrank.LowRankFactor(u=f.u, s=f.s, d=d, rank=5)
    ld = blocks.pack([f], [np.arange(5)], 5)
    v = rng.standard_normal(5)
    expect = np.linalg.inv(x + np.diag(d)) @ v
    assert np.allclose(np.asarray(ld.inverse.dot(v)), expect, atol=1e-10)


def test_inverse_dot_invertible_diag_rank0_sentinel():
    """Woodbury with the rank-0 sentinel block (s == 0): the matrix is
    just diag(d)."""
    rng = np.random.default_rng(22)
    f = lowrank.factor_block(X=np.zeros((4, 4)), t=0.5,
                             check_symmetric=False)
    d = rng.random(4) + 0.5
    f = lowrank.LowRankFactor(u=f.u, s=f.s, d=d, rank=4)
    ld = blocks.pack([f], [np.arange(4)], 4)
    v = rng.standard_normal(4)
    assert np.allclose(np.asarray(ld.inverse.dot(v)), v / d, atol=1e-12)


def test_inverse_dot_mixed_diag():
    """Mixed zero/nonzero diagonal: dense reconstruction + pinv
    (reference matrix_structures.py:169-185, tests/test.py:145-152)."""
    rng = np.random.default_rng(23)
    x = random_symmetric(4, rng, rank=2)
    f = lowrank.factor_block(X=x, t=1.0)
    d = np.array([0., 0., 2., 3.])
    f = lowrank.LowRankFactor(u=f.u, s=f.s, d=d, rank=4)
    ld = blocks.pack([f], [np.arange(4)], 4)
    v = rng.standard_normal(4)
    reconst = x + np.diag(d)
    expect = np.linalg.pinv(reconst, hermitian=True) @ v
    assert np.allclose(np.asarray(ld.inverse.dot(v)), expect, atol=1e-8)


def test_inverse_dot_mixed_blocks_per_matrix():
    """One matrix mixing all three per-block inverse_dot branches."""
    rng = np.random.default_rng(24)
    x1 = random_symmetric(5, rng)
    f1 = lowrank.factor_block(X=x1, t=1.0)               # d == 0
    x2 = random_symmetric(3, rng)
    f2 = lowrank.factor_block(X=x2, t=1.0)
    d2 = rng.random(3) + 0.5
    f2 = lowrank.LowRankFactor(u=f2.u, s=f2.s, d=d2, rank=3)  # Woodbury
    ld = blocks.pack([f1, f2], [np.arange(5), np.arange(5, 8)], 9)
    v = rng.standard_normal(9)
    dense = np.zeros((9, 9))
    dense[:5, :5] = x1
    dense[5:8, 5:8] = x2 + np.diag(d2)
    expect = np.linalg.pinv(dense, hermitian=True) @ v
    got = np.asarray(ld.inverse.dot(v))
    assert np.allclose(got, expect, atol=1e-8)
    assert got[8] == 0.0                                # missing index


def test_dot_i_with_diag_missing_and_mixed_buckets():
    """O(block) dot_i: nonzero diagonals, missing indices, permutation,
    and blocks spread over multiple bucket tiers
    (reference matrix_structures.py:154-157,333-347,
    tests/test.py:112-126,257-277)."""
    rng = np.random.default_rng(25)
    n = 5 + 33 + 2               # two tiers + 2 missing slots
    order = rng.permutation(n)
    x1 = random_symmetric(5, rng)
    f1 = lowrank.factor_block(X=x1, t=1.0)
    d1 = rng.random(5)
    f1 = lowrank.LowRankFactor(u=f1.u, s=f1.s, d=d1, rank=5)
    x2 = random_symmetric(33, rng)
    f2 = lowrank.factor_block(X=x2, t=1.0)
    ix1, ix2 = order[:5], order[5:38]
    ld = blocks.pack([f1, f2], [ix1, ix2], n)
    assert len(ld.buckets) == 2
    dense = np.zeros((n, n))
    dense[np.ix_(ix1, ix1)] = x1 + np.diag(d1)
    dense[np.ix_(ix2, ix2)] = x2
    v = rng.standard_normal(n)
    expect = dense @ v
    for i in range(n):
        assert np.isclose(ld.dot_i(v, i), expect[i])


def test_dot_multi_matches_stacked_dot():
    """dot_multi (one U pass for C vectors) must equal per-vector dot
    exactly — the engine batches cohorts sharing an LD panel through it
    (engine._ld_scaled_dot)."""
    rng = np.random.default_rng(21)
    ld, dense, _ = _make_packed(rng, [5, 9, 33, 4])
    vs = rng.standard_normal((3, dense.shape[0]))
    got = np.asarray(blocks.dot_multi(ld, vs))
    want = np.stack([np.asarray(blocks.dot(ld, v)) for v in vs])
    # batched dot_general may re-associate the reduction: tiny ulp-level
    # differences from the per-vector path are expected
    assert np.allclose(got, want, rtol=1e-13, atol=1e-13)
    assert np.allclose(got, vs @ dense.T)
    # C == 1 degenerates to the single-vector path
    one = np.asarray(blocks.dot_multi(ld, vs[:1]))
    assert np.array_equal(one[0], np.asarray(blocks.dot(ld, vs[0])))


def test_dot_multi_row_aligned():
    """The 128-aligned contiguous-block fast path, multi-RHS."""
    import jax.numpy as jnp
    rng = np.random.default_rng(22)
    sizes = [128, 256, 128]
    idx_lists, dense_blocks = [], []
    off = 0
    for sz in sizes:
        dense_blocks.append(random_symmetric(sz, rng))
        idx_lists.append(np.arange(off, off + sz))
        off += sz
    n = off
    ld = blocks.from_dense_blocks(dense_blocks, idx_lists, n, t=1.0)
    assert ld.row_aligned
    dense = np.zeros((n, n))
    for x, ix in zip(dense_blocks, idx_lists):
        dense[np.ix_(ix, ix)] = x
    vs = rng.standard_normal((2, n))
    got = np.asarray(blocks.dot_multi(ld, jnp.asarray(vs)))
    want = np.stack([np.asarray(blocks.dot(ld, jnp.asarray(v)))
                     for v in vs])
    assert np.allclose(got, want, rtol=1e-13, atol=1e-13)
    assert np.allclose(got, vs @ dense.T)
