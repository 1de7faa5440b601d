"""Random-hyperplane LSH near-dup: recall vs brute-force ground truth.

VERDICT r1 flagged embedding_cosine_dups' first-k-dims sign bucket for
its recall bound (a high-cosine pair can disagree on a near-zero dim's
sign).  embedding_rh_lsh_dups is the proper Charikar fix; these tests
pin (a) generator determinism, (b) zero false positives (every emitted
pair really is >= threshold, exact), (c) recall strictly above the
sign-bit heuristic and >= 0.9 against the exact all-pairs truth.
"""

import numpy as np
import pytest

from mvtspark.operators.dedup import rh_planes

THRESHOLD = 0.42


def test_rh_planes_deterministic_dyadic():
    a = rh_planes(24, 64)
    b = rh_planes(24, 64)
    assert a.shape == (24, 64)
    assert np.array_equal(a, b)
    # exact dyadic rationals: scaling by 2^20 yields integers, so the
    # decimal repr embedded in the oracle SQL round-trips bit-for-bit
    scaled = a * (1 << 20)
    assert np.array_equal(scaled, np.rint(scaled))
    assert float(np.max(a)) < 1.0 and float(np.min(a)) >= -1.0
    # a different seed yields different planes
    assert not np.array_equal(a, rh_planes(24, 64, seed=7))


@pytest.fixture(scope="module")
def truth(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    v = np.array([r.embedding for r in rows], dtype=np.float64)
    n = v / np.linalg.norm(v, axis=1, keepdims=True)
    cos = n @ n.T
    iu = np.triu_indices(len(ids), 1)
    pairs = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(*iu)
        if cos[i, j] >= THRESHOLD
    }
    return emb, pairs


def test_rh_lsh_recall_and_precision(spark, truth):
    from mvtspark.operators.dedup import (
        embedding_cosine_dups,
        embedding_rh_lsh_dups,
    )

    emb, true_pairs = truth
    assert true_pairs, "fixture data must contain pairs at the threshold"

    got = {
        (r.vec_a, r.vec_b)
        for r in embedding_rh_lsh_dups(emb, threshold=THRESHOLD).collect()
    }
    # exact-cosine verify stage => no false positives
    assert got <= true_pairs
    recall = len(got) / len(true_pairs)
    assert recall >= 0.9

    sign_got = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_dups(
            emb, threshold=THRESHOLD, sign_bits=4
        ).collect()
    }
    assert len(got) > len(sign_got)
