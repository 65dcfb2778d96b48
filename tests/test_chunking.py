"""Chunker invariants — the reference enforces these at runtime
(build_finetune_jsonl.py:238-291, chunking.py:225-231,264-285); here they are
property tests over generated texts."""

import random

import pytest
from hypothesis import given, settings, strategies as st

from pii_core.chunking import Chunk, build_chunks
from pii_core.tokenizer import WordTokenizer

TOK = WordTokenizer()

WORDS = [
    "processo", "solicito", "informação", "rua", "quadra", "João-Paulo",
    "O'Neil", "apartamento", "x", "supercalifragilistico", "1234567",
    "às", "não", ".", ",", "!", "?", "\n", "   ", " ",
]


def make_text(seed: int, n: int) -> str:
    rng = random.Random(seed)
    return " ".join(rng.choice(WORDS) for _ in range(n))


def assert_invariants(text: str, chunks: list[Chunk], max_length: int):
    assert chunks, "at least one chunk"
    # only separator chars may precede the first chunk (the window starts at
    # the first token's word start); the last chunk extends to the text end
    assert text[: chunks[0].char_start].strip() == ""
    assert chunks[-1].char_end == len(text)
    for i, ch in enumerate(chunks):
        assert ch.chunk_index == i
        assert ch.text == text[ch.char_start:ch.char_end]
        assert TOK.encoded_len_with_specials(ch.text) <= max_length
    # union covers with no char gaps: each next chunk starts at or before
    # the previous end
    for prev, nxt in zip(chunks, chunks[1:]):
        assert nxt.char_start <= prev.char_end, (prev, nxt)
        assert nxt.char_start >= prev.char_start  # monotone progress


def test_empty_text():
    assert build_chunks("", TOK) == [Chunk("", 0, 0, 0)]


def test_whitespace_only_text_single_chunk():
    text = "   \n  "
    chunks = build_chunks(text, TOK, max_length=16, stride=4)
    assert chunks == [Chunk(text, 0, len(text), 0)]


def test_short_text_single_chunk_no_heuristics():
    text = "Solicito acesso ao processo 12345."
    chunks = build_chunks(text, TOK, max_length=512, stride=64)
    assert chunks == [Chunk(text, 0, len(text), 0)]


def test_bad_args():
    with pytest.raises(ValueError):
        build_chunks("abc", TOK, max_length=8)
    with pytest.raises(ValueError):
        build_chunks("abc", TOK, max_length=32, stride=30)  # stride >= budget


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("max_length,stride", [(32, 8), (64, 16), (512, 64)])
def test_invariants_random_texts(seed, max_length, stride):
    text = make_text(seed, 600)
    chunks = build_chunks(text, TOK, max_length=max_length, stride=stride)
    assert_invariants(text, chunks, max_length)
    if max_length == 32:
        assert len(chunks) > 1  # actually exercises the sliding window


@settings(max_examples=60, deadline=None)
@given(st.text(min_size=0, max_size=2000))
def test_invariants_hypothesis(text):
    chunks = build_chunks(text, TOK, max_length=24, stride=6)
    if not text:
        assert chunks == [Chunk("", 0, 0, 0)]
        return
    assert_invariants(text, chunks, 24)


def test_long_words_split_mid_word():
    # 30-char words split into subword pieces: boundary backoff must realign
    # chunk ends to word boundaries while covering everything.
    text = " ".join("abcdefghijklmnopqrstuvwxyzabcd" for _ in range(100))
    chunks = build_chunks(text, TOK, max_length=32, stride=4)
    assert_invariants(text, chunks, 32)
    assert len(chunks) > 5


def test_single_giant_word_errors_like_reference():
    # a word longer than the whole window cannot fit once char_start backs up
    # to the word start — the reference raises at the hard minimum
    # (chunking.py:270-275); we preserve that fail-fast contract.
    with pytest.raises(RuntimeError):
        build_chunks("a" * 10_000, TOK, max_length=32, stride=4)


def test_sentence_boundary_preferred():
    # many short sentences: every chunk should end right after a terminator
    # (except possibly the last)
    text = ("Primeira frase curta aqui. " * 200).strip()
    chunks = build_chunks(text, TOK, max_length=40, stride=8)
    assert_invariants(text, chunks, 40)
    for ch in chunks[:-1]:
        tail = ch.text.rstrip()
        assert tail.endswith("."), repr(tail[-20:])
