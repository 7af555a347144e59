"""Direct equivalence tests for the production TPU matcher kernel
(ops/pallas_matching.descriptor_top2_pallas) against the XLA reference
implementation (ops/matching.descriptor_top2), run in Pallas interpret
mode on the CPU backend.

This is the path sfm/matching.py takes on real TPU hardware, so it needs
first-class coverage: exact tile multiples, ragged sizes that force row
padding, and the <2-real-references edge case where zero-padded rows
(inner product 0 -> distance 2) become the runner-up.

Reference semantics being replaced: libs/sfm/nearest_neighbor.cc SSE
inner-product loops (dist^2 = 2 - 2*dot for unit descriptors,
nearest_neighbor.h:20-45).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mve_tpu.ops.matching import descriptor_top2
from mve_tpu.ops.pallas_matching import descriptor_top2_pallas, TM, TN
from mve_tpu.sfm.matching import MatchingOptions, oneway_match, _pad_rows


def _unit_descriptors(n, d=128, seed=0, nonneg=True):
    rng = np.random.RandomState(seed)
    x = rng.rand(n, d).astype(np.float32) if nonneg else (
        rng.randn(n, d).astype(np.float32))
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.parametrize("n1,n2", [(TM, TN), (2 * TM, 2 * TN)])
def test_pallas_matches_xla_exact_tiles(n1, n2):
    q = _unit_descriptors(n1, seed=1)
    r = _unit_descriptors(n2, seed=2)
    idx_p, d1_p, d2_p = descriptor_top2_pallas(
        jnp.asarray(q), jnp.asarray(r), interpret=True, bf16=False)
    idx_x, d1_x, d2_x = descriptor_top2(jnp.asarray(q), jnp.asarray(r))
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(d1_p), np.asarray(d1_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_x), atol=1e-5)


@pytest.mark.parametrize("n1,n2", [(37, 91), (300, 700), (TM + 1, TN - 1)])
def test_pallas_matches_xla_ragged(n1, n2):
    """Ragged sizes go through the same row padding sfm/matching.py uses."""
    q = _unit_descriptors(n1, seed=3)
    r = _unit_descriptors(n2, seed=4)
    qp = _pad_rows(q, TM)
    rp = _pad_rows(r, TN)
    idx_p, d1_p, d2_p = descriptor_top2_pallas(
        jnp.asarray(qp), jnp.asarray(rp), interpret=True, bf16=False)
    idx_p = np.asarray(idx_p)[:n1]
    d1_p = np.asarray(d1_p)[:n1]
    d2_p = np.asarray(d2_p)[:n1]
    idx_x, d1_x, d2_x = descriptor_top2(
        jnp.asarray(_pad_rows(q)), jnp.asarray(_pad_rows(r)), n_refs=n2)
    idx_x = np.asarray(idx_x)[:n1]
    d1_x = np.asarray(d1_x)[:n1]
    d2_x = np.asarray(d2_x)[:n1]
    np.testing.assert_array_equal(idx_p, idx_x)
    np.testing.assert_allclose(d1_p, d1_x, atol=1e-5)
    # Second-best may legitimately differ: the XLA path masks padded
    # reference rows to -inf while the Pallas path sees them as dist-2
    # zero vectors. For non-negative (SIFT-like) descriptors every real
    # dot >= 0 >= padded dot, so the runner-up agrees whenever >= 2 real
    # refs exist.
    np.testing.assert_allclose(d2_p, d2_x, atol=1e-5)


def test_pallas_single_real_reference_padding_edge():
    """With one real reference, the Pallas runner-up is a padded zero row
    (distance exactly 2); the Lowe ratio in oneway_match must then reject
    nothing incorrectly — documented edge in sfm/matching.py."""
    q = _unit_descriptors(5, seed=5)
    r = q[:1] + 0.0
    qp = _pad_rows(q, TM)
    rp = _pad_rows(r, TN)
    idx, d1, d2 = descriptor_top2_pallas(
        jnp.asarray(qp), jnp.asarray(rp), interpret=True, bf16=False)
    idx = np.asarray(idx)[:5]
    d1 = np.asarray(d1)[:5]
    d2 = np.asarray(d2)[:5]
    assert (idx == 0).all()
    np.testing.assert_allclose(d2, 2.0, atol=1e-6)
    # Query 0 is identical to the lone reference: d1 == 0 passes any ratio.
    np.testing.assert_allclose(d1[0], 0.0, atol=1e-5)


def test_oneway_match_pallas_path_equals_xla_path(monkeypatch):
    """End-to-end: the sfm.matching dispatch produces identical matches
    through the Pallas (interpret) and XLA paths on SIFT-like data."""
    rng = np.random.RandomState(7)
    d1 = _unit_descriptors(123, seed=8)
    perm = rng.permutation(123)
    d2 = d1[perm] + rng.rand(123, 128).astype(np.float32) * 0.02
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    opts = MatchingOptions(lowe_ratio_threshold=0.8)

    monkeypatch.delenv("MVE_TPU_FORCE_PALLAS_INTERPRET", raising=False)
    ref = oneway_match(opts, d1, d2)
    monkeypatch.setenv("MVE_TPU_FORCE_PALLAS_INTERPRET", "1")
    got = oneway_match(opts, d1, d2)
    np.testing.assert_array_equal(got, ref)
    # Sanity: the matcher actually recovers the permutation.
    assert (got == np.argsort(perm)).mean() > 0.95
