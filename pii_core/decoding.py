"""Softmax + BIO-constrained Viterbi decoding over token logits.

Re-expresses reference ``inference/decoding.py``: stable softmax (41-50), a
(C,C) BIO transition-score matrix — 0 for legal transitions, -1e4 otherwise
(79-121) — and Viterbi dynamic programming with an optional force-O mask for
special/pad positions and a start vector forbidding ``I-*`` (124-187).

Pure NumPy, fp32 throughout (the reference enforces fp32 at decoding.py:45,
infer_pii.py:227) so results are bit-stable across machines and partitionings.
Runs inside the Arrow UDF on executors; sequential in T, vectorized in C.
"""

from __future__ import annotations

from functools import lru_cache
from operator import add

import numpy as np

NEG = np.float32(-1e4)


def softmax(x: np.ndarray) -> np.ndarray:
    """Numerically stable softmax over the last axis, fp32."""
    x = np.asarray(x, dtype=np.float32)
    z = x - x.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def split_label(lab: str) -> tuple[str, str | None]:
    """``"B-NOME"`` -> ("B","NOME"); ``"O"`` / malformed -> ("O", None)."""
    if lab != "O" and "-" in lab:
        pre, typ = lab.split("-", 1)
        if pre in ("B", "I") and typ:
            return pre, typ
    return "O", None


def bio_transitions(labels: list[str]) -> np.ndarray:
    """(C,C) score matrix; ``trans[p, c]`` added moving from label p to c.

    Legal moves: anything -> O; anything -> B-X; {B-X, I-X} -> I-X.
    """
    c = len(labels)
    trans = np.full((c, c), NEG, dtype=np.float32)
    # (prefix, type, is_valid_bio) per label; malformed labels stay forbidden.
    info = [
        (pre, typ, lab == "O" or typ is not None)
        for lab, (pre, typ) in ((lab, split_label(lab)) for lab in labels)
    ]
    for pi, (ppre, ptyp, pok) in enumerate(info):
        if not pok:
            continue
        for ci, (cpre, ctyp, cok) in enumerate(info):
            if not cok:
                continue
            if cpre == "O" or cpre == "B":
                trans[pi, ci] = 0.0
            elif cpre == "I" and ptyp is not None and ptyp == ctyp:
                trans[pi, ci] = 0.0
    return trans


def viterbi_bio(
    emissions: np.ndarray,
    labels: list[str],
    o_id: int,
    force_o_mask: np.ndarray | None = None,
) -> list[int]:
    """Best BIO-legal label-id path for a (T,C) emission matrix."""
    em = np.asarray(emissions, dtype=np.float32)
    if em.ndim != 2:
        raise ValueError(f"emissions must be (T,C), got {em.shape}")
    t, c = em.shape
    if c != len(labels):
        raise ValueError(f"emissions C={c} != len(labels)={len(labels)}")
    if not 0 <= int(o_id) < c:
        raise ValueError(f"invalid o_id={o_id}")
    if t == 0:
        return []

    if force_o_mask is not None:
        m = np.asarray(force_o_mask, dtype=bool)
        if m.shape != (t,):
            raise ValueError(f"force_o_mask must be (T,), got {m.shape}")
        em = em.copy()  # only the masked path mutates; callers keep theirs
        em[m, :] = NEG
        em[m, int(o_id)] = 0.0

    start, free_cols, i_cols, i_prev = _bio_structure(tuple(labels))

    # Argmax shortcut: if every row's max is strictly unique and the argmax
    # path is BIO-legal (including the start constraint), that path attains
    # the unconstrained score bound and is therefore the UNIQUE Viterbi
    # optimum — provably identical to the DP below, at O(T·C) vectorized
    # cost. Falls through to the DP otherwise (ties or illegal transitions).
    am = em.argmax(axis=1)
    top2 = np.partition(em, c - 2, axis=1)[:, c - 2:] if c >= 2 else None
    if top2 is not None and bool((top2[:, 1] > top2[:, 0]).all()):
        legal, start_ok = _bio_legal(tuple(labels))
        if start_ok[am[0]] and bool(legal[am[:-1], am[1:]].all()):
            return am.tolist()

    # Fast DP exploiting the BIO transition structure instead of a dense
    # (C,C) matmul per step: columns reachable from ANY legal prev (O, B-*)
    # take the global best prev; each I-X column takes max(B-X, I-X) prevs;
    # malformed labels are unreachable. O(T·C) instead of O(T·C²).
    # The inner loop runs on Python floats — at C=27 that beats per-step
    # NumPy calls by ~4x (fixed ndarray-call overhead dominates) — while
    # emissions stay fp32: each score is a sum of fp32 values converted
    # exactly to float64, so comparisons are deterministic on any platform.
    # Equivalent to the dense matrix DP — tests pin this against brute-force
    # path enumeration.
    em_rows = em.tolist()
    free_l = free_cols.tolist()
    ipairs = [(int(ci), int(pb), int(pi))
              for ci, (pb, pi) in zip(i_cols.tolist(), i_prev.tolist())]
    # Malformed-label columns keep the default nxt below: dense-DP semantics
    # give them gbest + NEG each step (trans[:, ci] == NEG), NOT a constant
    # NEG — with a constant, once accumulated scores sink below -1e4 a
    # "forbidden" column would win max(score).
    score = [e + s for e, s in zip(em_rows[0], start.tolist())]
    back: list[list[int]] = [[0] * c]
    neg = float(NEG)
    for ti in range(1, t):
        gbest = max(score)
        g = score.index(gbest)
        nxt = [gbest + neg] * c
        bk = [g] * c
        for ci in free_l:
            nxt[ci] = gbest
        for ci, pb_i, pi_i in ipairs:
            pb, pi = score[pb_i], score[pi_i]
            if pi > pb:
                bk[ci] = pi_i
                nxt[ci] = pi
            else:
                bk[ci] = pb_i
                nxt[ci] = pb
        back.append(bk)
        # map(add, ...) iterates both lists in C — ~2x the indexed listcomp
        # on this hottest line (fp32→float64 addition semantics unchanged)
        score = list(map(add, em_rows[ti], nxt))

    path = [0] * t
    best = max(score)
    path[t - 1] = score.index(best)
    for ti in range(t - 1, 0, -1):
        path[ti - 1] = back[ti][path[ti]]
    return path


@lru_cache(maxsize=8)
def _bio_legal(labels: tuple[str, ...]) -> tuple[np.ndarray, np.ndarray]:
    """(C,C) bool legality matrix + (C,) bool start-legality vector."""
    trans = bio_transitions(list(labels))
    start_ok = np.array(
        [split_label(lab)[0] != "I"
         and (lab == "O" or split_label(lab)[1] is not None)
         for lab in labels])
    return trans == 0.0, start_ok


@lru_cache(maxsize=8)
def _bio_structure(labels: tuple[str, ...]):
    """Per-label-space constants for the structured DP: the start vector,
    column groups (reachable-from-anything vs I-X), and for each I-X column
    its two legal predecessors (B-X, I-X). Built once per label space."""
    info = [split_label(lab) for lab in labels]
    valid = [lab == "O" or typ is not None
             for lab, (_, typ) in zip(labels, info)]
    idx = {lab: i for i, lab in enumerate(labels)}

    start = np.array(
        [NEG if (pre == "I" or not ok) else np.float32(0.0)
         for (pre, _), ok in zip(info, valid)],
        dtype=np.float32,
    )
    free_cols, i_cols, i_prev = [], [], []
    for ci, ((pre, typ), ok) in enumerate(zip(info, valid)):
        if not ok:
            continue  # unreachable forever
        if pre in ("O", "B") or typ is None:
            free_cols.append(ci)
        else:  # I-X: legal prevs are B-X and I-X (ci itself)
            b = idx.get(f"B-{typ}")
            if b is None:
                # no matching B label: only I-X -> I-X remains legal
                b = ci
            i_cols.append(ci)
            i_prev.append((b, ci))
    return (
        start,
        np.asarray(free_cols, dtype=np.int64),
        np.asarray(i_cols, dtype=np.int64),
        np.asarray(i_prev, dtype=np.int64).reshape(-1, 2),
    )
