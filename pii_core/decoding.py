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

    em = em.copy()
    if force_o_mask is not None:
        m = np.asarray(force_o_mask, dtype=bool)
        if m.shape != (t,):
            raise ValueError(f"force_o_mask must be (T,), got {m.shape}")
        em[m, :] = NEG
        em[m, int(o_id)] = 0.0

    trans = bio_transitions(labels)
    start = np.where(
        np.array([split_label(lab)[0] == "I" for lab in labels]), NEG, np.float32(0.0)
    ).astype(np.float32)

    score = em[0] + start
    back = np.zeros((t, c), dtype=np.int32)
    for ti in range(1, t):
        cand = score[:, None] + trans  # (C_prev, C_cur)
        back[ti] = np.argmax(cand, axis=0)
        score = em[ti] + cand[back[ti], np.arange(c)]

    path = np.empty(t, dtype=np.int64)
    path[t - 1] = int(np.argmax(score))
    for ti in range(t - 1, 0, -1):
        path[ti - 1] = back[ti, path[ti]]
    return [int(p) for p in path]
