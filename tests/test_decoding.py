"""Viterbi vs brute-force path enumeration on tiny cases
(reference decoding.py:124-187 semantics)."""

import itertools

import numpy as np
import pytest

from pii_core.decoding import NEG, bio_transitions, softmax, split_label, viterbi_bio

LABELS5 = ["O", "B-A", "I-A", "B-B", "I-B"]


def brute_force(emissions, labels, force_o_mask=None):
    t, c = emissions.shape
    trans = bio_transitions(labels)
    start_bad = [split_label(lab)[0] == "I" for lab in labels]
    em = emissions.copy()
    if force_o_mask is not None:
        for ti in range(t):
            if force_o_mask[ti]:
                em[ti, :] = NEG
                em[ti, labels.index("O")] = 0.0
    best, best_score = None, -np.inf
    for path in itertools.product(range(c), repeat=t):
        score = em[0, path[0]] + (NEG if start_bad[path[0]] else 0.0)
        for i in range(1, t):
            score += trans[path[i - 1], path[i]] + em[i, path[i]]
        if score > best_score:
            best, best_score = list(path), score
    return best


@pytest.mark.parametrize("seed", range(10))
@pytest.mark.parametrize("t", [1, 2, 4, 6])
def test_viterbi_matches_brute_force(seed, t):
    rng = np.random.RandomState(seed)
    em = rng.randn(t, len(LABELS5)).astype(np.float32) * 3
    got = viterbi_bio(em, LABELS5, o_id=0)
    want = brute_force(em, LABELS5)
    assert got == want


def test_viterbi_force_o_mask():
    rng = np.random.RandomState(7)
    em = rng.randn(5, len(LABELS5)).astype(np.float32) * 3
    mask = np.array([True, False, False, True, False])
    got = viterbi_bio(em, LABELS5, o_id=0, force_o_mask=mask)
    want = brute_force(em, LABELS5, mask)
    assert got == want
    assert got[0] == 0 and got[3] == 0


def test_never_starts_with_I():
    em = np.full((3, 5), 0.0, dtype=np.float32)
    em[:, 2] = 10.0  # I-A everywhere is tempting
    path = viterbi_bio(em, LABELS5, o_id=0)
    assert path[0] != 2
    # legal continuation: B-A then I-A I-A
    assert path == [1, 2, 2]


def test_I_only_follows_same_type():
    trans = bio_transitions(LABELS5)
    # B-A -> I-B forbidden; B-A -> I-A allowed
    assert trans[1, 4] == NEG
    assert trans[1, 2] == 0.0
    # O -> I-A forbidden; anything -> O / -> B-* allowed
    assert trans[0, 2] == NEG
    assert (trans[:, 0] == 0.0).all()
    assert (trans[:, 1] == 0.0).all()
    assert (trans[:, 3] == 0.0).all()


def test_malformed_labels_stay_forbidden():
    labels = ["O", "B-A", "I-A", "garbage"]
    trans = bio_transitions(labels)
    assert (trans[3, :] == NEG).all()
    assert (trans[:, 3] == NEG).all()
    assert trans[0, 0] == 0.0


@pytest.mark.parametrize("seed", range(5))
def test_malformed_label_never_wins_under_deep_negative_scores(seed):
    # Regression: with strongly negative emissions over enough steps the
    # accumulated path score sinks below -1e4; a malformed column whose DP
    # next-score was a CONSTANT -1e4 (instead of gbest - 1e4, the dense
    # transition-matrix semantics) would then win max(score).
    labels = ["O", "B-A", "I-A", "garbage"]
    rng = np.random.RandomState(seed)
    t = 6
    em = (rng.randn(t, len(labels)) * 3 - 4000).astype(np.float32)
    em[:, 3] += 10  # make the malformed column the per-row argmax bait
    got = viterbi_bio(em, labels, o_id=0)
    assert 3 not in got
    assert got == brute_force(em, labels)


def test_viterbi_batch_identical_paths_ties_included():
    """viterbi_bio_batch must return element-identical paths to per-sequence
    viterbi_bio — including on tie-heavy matrices where the tie-breaks (first
    max; I-column prefers the B predecessor) decide the path."""
    from pii_core.decoding import viterbi_bio_batch

    rng = np.random.RandomState(3)
    ems, masks = [], []
    for i in range(120):
        t = int(rng.randint(0, 30))
        em = (rng.randn(t, len(LABELS5)) * 2).astype(np.float32)
        if i % 2:
            em = np.round(em)  # heavy ties: defeats the argmax shortcut
        if i % 5 == 0 and t:
            em[rng.randint(0, t)] = 0.0  # a full-row tie
        mask = (rng.rand(t) < 0.3) if (i % 7 == 0 and t) else None
        ems.append(em)
        masks.append(mask)
    want = [viterbi_bio(e, LABELS5, 0, m) for e, m in zip(ems, masks)]
    assert viterbi_bio_batch(ems, LABELS5, 0, masks) == want


def test_viterbi_batch_malformed_and_deep_negative():
    # same dense-DP semantics for malformed columns as the single-seq DP
    from pii_core.decoding import viterbi_bio_batch

    labels = ["O", "B-A", "I-A", "garbage"]
    rng = np.random.RandomState(11)
    ems = []
    for _ in range(8):
        em = (rng.randn(6, len(labels)) * 3 - 4000).astype(np.float32)
        em[:, 3] += 10
        ems.append(em)
    got = viterbi_bio_batch(ems, labels, 0)
    for em, path in zip(ems, got):
        assert 3 not in path
        assert path == viterbi_bio(em, labels, 0)


def test_viterbi_batch_edges():
    from pii_core.decoding import viterbi_bio_batch

    # empty batch, empty sequences, single non-shortcut sequence
    assert viterbi_bio_batch([], LABELS5, 0) == []
    ems = [np.zeros((0, 5), np.float32),
           np.zeros((3, 5), np.float32),  # all-ties, length 3
           np.zeros((1, 5), np.float32)]
    want = [viterbi_bio(e, LABELS5, 0) for e in ems]
    assert viterbi_bio_batch(ems, LABELS5, 0) == want
    with pytest.raises(ValueError):
        viterbi_bio_batch([np.zeros((3, 4), np.float32)], LABELS5, 0)
    with pytest.raises(ValueError):  # mask count mismatch
        viterbi_bio_batch([np.zeros((3, 5), np.float32)], LABELS5, 0, [])


def test_softmax_stable_and_normalized():
    x = np.array([[1000.0, 1000.0, 999.0], [-1000.0, 0.0, 1.0]], dtype=np.float32)
    p = softmax(x)
    assert np.all(np.isfinite(p))
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, rtol=1e-6)


def test_empty_and_shape_errors():
    assert viterbi_bio(np.zeros((0, 5), np.float32), LABELS5, 0) == []
    with pytest.raises(ValueError):
        viterbi_bio(np.zeros((3, 4), np.float32), LABELS5, 0)
    with pytest.raises(ValueError):
        viterbi_bio(np.zeros((3, 5), np.float32), LABELS5, 9)
