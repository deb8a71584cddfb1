"""The wrapped-symbol replace chain (plans/pipeline.py BPE encode
section) must equal CANONICAL BPE — repeatedly merge the best-ranked
adjacent pair anywhere in the word — for any first-round (single-char
pair) merge table. The section comment argues this; this test checks it
on adversarial words (runs, interleavings, boundary-crossing bait) and
on randomized fuzz cases.
"""

from __future__ import annotations

import itertools
import random


def _canonical_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    rank = {m: i for i, m in enumerate(merges)}
    syms = list(word)
    while True:
        best, best_i = None, None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            return syms
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]


def _replace_chain(word: str, merges: list[tuple[str, str]]) -> int:
    s = "".join(f"|{c}|" for c in word)
    for c1, c2 in merges:
        s = s.replace(f"|{c1}||{c2}|", f"|{c1}{c2}|")
    return s.count("|") // 2


def test_adversarial_words():
    cases = [
        ("aaaa", [("a", "a")]),          # run: delimiter-sharing bait
        ("aaaaa", [("a", "a")]),
        ("abab", [("a", "b")]),
        ("abc", [("a", "b"), ("b", "c")]),   # boundary-crossing bait
        ("abc", [("b", "c"), ("a", "b")]),   # rank order flips the result
        ("aabbaab", [("a", "b"), ("a", "a"), ("b", "b")]),
        ("xyzzy", [("z", "z"), ("x", "y")]),
    ]
    for word, merges in cases:
        assert _replace_chain(word, merges) == len(_canonical_bpe(word, merges)), (
            word,
            merges,
        )


def test_fuzz_against_canonical():
    rng = random.Random(8)
    alphabet = "abc"
    pair_space = list(itertools.product(alphabet, repeat=2))
    for _ in range(300):
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        merges = rng.sample(pair_space, rng.randint(0, 5))
        assert _replace_chain(word, merges) == len(
            _canonical_bpe(word, merges)
        ), (word, merges)
