"""Matching stack vs OpenCV BFMatcher oracle + pallas-vs-jnp equivalence."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from sfm_mvs_pipeline_tpu.ops import matching as M
from sfm_mvs_pipeline_tpu.ops import pairs as PR


def _rand_desc(rng, n, d=128):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return np.abs(x)


def test_two_nn_vs_bfmatcher(rng):
    dq = _rand_desc(rng, 300)
    dt = _rand_desc(rng, 250)
    # make some true matches so the ratio test passes sometimes
    dt[:100] = dq[:100] + rng.normal(size=(100, 128)).astype(np.float32) * 0.01

    valid_q = np.ones(300, bool)
    valid_t = np.ones(250, bool)
    bi, bsq, ssq = M.two_nn_jnp(
        jnp.asarray(dq), jnp.asarray(dt), jnp.asarray(valid_q), jnp.asarray(valid_t)
    )
    mask = M.ratio_test_mask(bsq, ssq, jnp.asarray(valid_q), ratio=0.7)

    bf = cv2.BFMatcher(cv2.NORM_L2)
    knn = bf.knnMatch(dq, dt, k=2)
    cv_pass = {}
    for m2 in knn:
        if len(m2) == 2 and m2[0].distance < 0.7 * m2[1].distance:
            cv_pass[m2[0].queryIdx] = m2[0].trainIdx

    ours = {int(q): int(bi[q]) for q in np.nonzero(np.asarray(mask))[0]}
    assert ours == cv_pass


def test_hamming_expansion_matches_cv(rng):
    dq = rng.integers(0, 256, size=(100, 32), dtype=np.uint8)
    dt = rng.integers(0, 256, size=(120, 32), dtype=np.uint8)
    dt[:40] = dq[:40]
    for i in range(40):  # flip a few bits
        dt[i, i % 32] ^= 3

    eq = M.expand_binary_descriptors(jnp.asarray(dq))
    et = M.expand_binary_descriptors(jnp.asarray(dt))
    bi, bsq, ssq = M.two_nn_jnp(
        eq, et, jnp.ones(100, bool), jnp.ones(120, bool)
    )
    # |a-b|^2 = 4 * hamming
    bf = cv2.BFMatcher(cv2.NORM_HAMMING)
    knn = bf.knnMatch(dq, dt, k=2)
    for q, m2 in enumerate(knn):
        assert int(bi[q]) == m2[0].trainIdx
        assert float(bsq[q]) == pytest.approx(4.0 * m2[0].distance)
        assert float(ssq[q]) == pytest.approx(4.0 * m2[1].distance)


def test_pallas_interpret_matches_jnp(rng):
    from sfm_mvs_pipeline_tpu.ops.pallas.match_kernel import two_nn_pallas

    dq = jnp.asarray(_rand_desc(rng, 300))
    dt = jnp.asarray(_rand_desc(rng, 280))
    vq = jnp.asarray(np.arange(300) < 290)
    vt = jnp.asarray(np.arange(280) < 270)

    bi_j, b_j, s_j = M.two_nn_jnp(dq, dt, vq, vt)
    bi_p, b_p, s_p = two_nn_pallas(dq, dt, vq, vt, interpret=True)

    # off-TPU the kernel keeps f32 HIGHEST dots (the bf16 hi|lo split is
    # TPU-only, where the MXU accumulates in f32), so the CPU interpret
    # path is exact vs the jnp oracle
    np.testing.assert_array_equal(np.asarray(bi_p)[:290], np.asarray(bi_j)[:290])
    np.testing.assert_allclose(np.asarray(b_p)[:290], np.asarray(b_j)[:290], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_p)[:290], np.asarray(s_j)[:290], rtol=1e-5)


def test_split3_operand_accuracy(rng):
    """The kernel's exact mode uses the 3-term bf16 split
    [q_hi|q_lo|q_hi].[t_hi|t_hi|t_lo] = qhi.thi + qlo.thi + qhi.tlo.
    Pin the FORMULA's accuracy in pure numpy emulation of the MXU
    (bf16-rounded operands, f32 products/accumulation): ~1e-6 relative,
    vs ~1e-3 for a plain bf16 pass — the r3 ADVICE finding was that the
    old 2-term split only achieved the plain-bf16 level."""
    import jax

    def to_bf16(x):
        return np.asarray(jnp.asarray(x, jnp.float32).astype(jnp.bfloat16), np.float32)

    q = np.abs(rng.normal(size=(256, 128))).astype(np.float32) * 20.0
    t = np.abs(rng.normal(size=(256, 128))).astype(np.float32) * 20.0
    exact = q.astype(np.float64) @ t.astype(np.float64).T

    q_hi = to_bf16(q)
    q_lo = to_bf16(q - q_hi)
    t_hi = to_bf16(t)
    t_lo = to_bf16(t - t_hi)

    plain = q_hi @ t_hi.T
    split3 = q_hi @ t_hi.T + q_lo @ t_hi.T + q_hi @ t_lo.T

    rel_plain = np.abs(plain - exact) / np.abs(exact)
    rel_split3 = np.abs(split3 - exact) / np.abs(exact)
    assert rel_plain.max() > 1e-4  # plain bf16 really is ~1e-3-class
    assert rel_split3.max() < 1e-5, f"split3 max rel err {rel_split3.max()}"


def test_pallas_exact_mode_interpret(rng):
    """exact=True must preserve the contract on the off-TPU branch too."""
    from sfm_mvs_pipeline_tpu.ops.pallas.match_kernel import two_nn_pallas

    dq = jnp.asarray(_rand_desc(rng, 300))
    dt = jnp.asarray(_rand_desc(rng, 280))
    vq = jnp.ones(300, bool)
    vt = jnp.ones(280, bool)
    bi_j, b_j, s_j = M.two_nn_jnp(dq, dt, vq, vt)
    bi_p, b_p, s_p = two_nn_pallas(dq, dt, vq, vt, interpret=True, exact=True)
    np.testing.assert_array_equal(np.asarray(bi_p), np.asarray(bi_j))
    np.testing.assert_allclose(np.asarray(b_p), np.asarray(b_j), rtol=1e-5)


def test_fused_batch_matches_jnp(rng):
    """The fused batched TPU fast path (two_nn_batch_fused: one Pallas
    dispatch for all pairs, scalar-prefetched pair table, in-kernel operand
    prep + |q|^2 add-back) must agree with the jnp oracle pair by pair."""
    from sfm_mvs_pipeline_tpu.ops.pallas.match_kernel import (
        two_nn_batch_fused,
    )

    S, F, D = 3, 200, 128
    descs = jnp.asarray(
        rng.integers(0, 128, size=(S, F, D)).astype(np.float32)
    )
    valid = jnp.asarray(rng.random((S, F)) > 0.1)
    pairs = jnp.asarray([(0, 1), (2, 0), (1, 2)], jnp.int32)
    bi_f, b_f, s_f = two_nn_batch_fused(descs, valid, pairs, interpret=True)
    for k, (a, b) in enumerate(((0, 1), (2, 0), (1, 2))):
        bi_j, b_j, s_j = M.two_nn_jnp(descs[a], descs[b], valid[a], valid[b])
        m_j = np.asarray(M.ratio_test_mask(b_j, s_j, valid[a]))
        m_p = np.asarray(M.ratio_test_mask(b_f[k], s_f[k], valid[a]))
        np.testing.assert_array_equal(m_p, m_j)
        np.testing.assert_array_equal(
            np.asarray(bi_f[k])[m_j], np.asarray(bi_j)[m_j]
        )
        np.testing.assert_allclose(
            np.asarray(b_f[k])[m_j], np.asarray(b_j)[m_j], rtol=1e-6
        )


def test_distinct_filter():
    best_idx = jnp.asarray([2, 2, 1, 3], dtype=jnp.int32)
    mask = jnp.asarray([True, True, True, False])
    out = np.asarray(M.distinct_filter(best_idx, mask))
    # target 2 claimed twice -> both dropped; 1 once -> kept; last masked out
    assert list(out) == [False, False, True, False]


def test_match_pairs_batch(rng):
    S, F, D = 4, 64, 32
    descs = np.abs(rng.normal(size=(S, F, D))).astype(np.float32)
    descs[1, :32] = descs[0, :32] + 0.001 * rng.normal(size=(32, D)).astype(np.float32)
    valid = np.ones((S, F), bool)
    pairs = PR.unordered_pairs(S)
    bi, mask = M.match_pairs_batch(
        jnp.asarray(descs), jnp.asarray(valid), jnp.asarray(pairs), backend="jnp"
    )
    assert bi.shape == (len(pairs), F)
    m01 = np.asarray(mask[0])
    assert m01[:32].sum() >= 30  # the planted matches survive


def test_pair_policies():
    assert len(PR.unordered_pairs(5)) == 10
    v = PR.video_pairs(5, sequence_length=3)
    assert [tuple(p) for p in v] == [
        (0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4),
    ]
    g = PR.grid_pairs(6, row_length=3, sequence_length=2)
    # 2x3 grid: right-neighbor + down-neighbor pairs
    expected = {(0, 1), (1, 2), (3, 4), (4, 5), (0, 3), (1, 4), (2, 5)}
    assert {tuple(p) for p in g} == expected
