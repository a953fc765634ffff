"""C++ tokenizer: availability, parity fuzz vs the Python implementation."""

import random
import string

import pytest

from imagecaptioner_tpu.data.tokenizer import tokenize_py
from imagecaptioner_tpu.native import native_available, tokenize_native

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native tokenizer failed to build")

CASES = [
    "A dog runs .",
    "A dog runs.",
    "Two dogs, one ball!",
    "don't stop",
    "it's a man's hat",
    "blue-eyed child",
    '"hello" (world)',
    "I'm running",
    "they'll we've you're he'd",
    "",
    "   ",
    "a---b",
    "...",
    "$100 (50%)",
    "and/or this-or-that",
]


@pytest.mark.parametrize("text", CASES)
def test_native_matches_python(text):
    assert tokenize_native(text) == tokenize_py(text)


def test_native_fuzz_parity():
    rng = random.Random(0)
    alphabet = string.ascii_letters + " .,!?'\"-/()[]{}0123456789   "
    for _ in range(500):
        n = rng.randint(0, 60)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert tokenize_native(text) == tokenize_py(text), repr(text)


def test_native_caption_like_fuzz():
    rng = random.Random(1)
    words = ["A", "dog", "runs", "on", "the", "grass", "don't", "it's",
             "blue-eyed", "child's", "two", "dogs,", "ball!", '"quote"',
             "(paren)", "and/or"]
    for _ in range(300):
        text = " ".join(rng.choice(words)
                        for _ in range(rng.randint(1, 12))) + " ."
        assert tokenize_native(text) == tokenize_py(text), repr(text)


def test_native_throughput_sanity():
    """Native should not be slower than Python on a large batch."""
    import time

    sentences = ["A blue-eyed child doesn't run on the grass ."] * 2000
    t0 = time.perf_counter()
    for s in sentences:
        tokenize_native(s)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for s in sentences:
        tokenize_py(s)
    t_py = time.perf_counter() - t0
    assert t_native < t_py * 1.5  # generous; typically several times faster
