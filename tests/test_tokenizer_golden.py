"""Golden spaCy-behavior fixture for the tokenizer twins (VERDICT r1 item 6).

Expected token sequences are sourced from documented spaCy English tokenizer
behavior: the spaCy-101 canonical example, the English contraction suffix
rules, tokenizer_exceptions (cannot/gonna/...), the ELLIPSES punctuation
pattern, and prefix/suffix/infix punctuation rules — i.e. what
``[t.text.lower() for t in spacy.load('en_core_web_sm').tokenizer(s)]``
produces for caption-style text.  Known divergences (multi-letter
abbreviations like "etc.", dialect contractions, emoticons, unicode
ellipsis) are documented in PARITY.md §2.1.

Both implementations — pure Python and the C++ twin — must match the fixture
token-for-token, which pins vocab insertion order on real data.
"""

import pytest

from imagecaptioner_tpu.data.tokenizer import tokenize_py

GOLDEN = [
    # spaCy 101 canonical example (lowercased)
    ("Apple isn't looking at buying U.K. startup for $1 billion.",
     ["apple", "is", "n't", "looking", "at", "buying", "u.k.", "startup",
      "for", "$", "1", "billion", "."]),
    # contraction suffixes
    ("don't can't won't I'm you're we've they'll she'd it's",
     ["do", "n't", "ca", "n't", "wo", "n't", "i", "'m", "you", "'re",
      "we", "'ve", "they", "'ll", "she", "'d", "it", "'s"]),
    ("Let's go!", ["let", "'s", "go", "!"]),
    # whole-word tokenizer exceptions
    ("He cannot swim, gonna try, gotta go.",
     ["he", "can", "not", "swim", ",", "gon", "na", "try", ",", "got",
      "ta", "go", "."]),
    ("wanna lemme gimme", ["wan", "na", "lem", "me", "gim", "me"]),
    # hyphen infixes
    ("A well-known mother-in-law.",
     ["a", "well", "-", "known", "mother", "-", "in", "-", "law", "."]),
    # slash infixes
    ("black/white and either/or",
     ["black", "/", "white", "and", "either", "/", "or"]),
    # punctuation runs peel one token per char
    ("Wow!!! Really?!", ["wow", "!", "!", "!", "really", "?", "!"]),
    # quotes and possessives
    ('"The dog\'s ball," he said.',
     ['"', "the", "dog", "'s", "ball", ",", '"', "he", "said", "."]),
    ("the dogs' toys", ["the", "dogs", "'", "toys"]),
    # numerals: decimals/thousands stay whole, currency/percent peel
    ("It costs $1,500.50 at 3.5% on 10,000 units.",
     ["it", "costs", "$", "1,500.50", "at", "3.5", "%", "on", "10,000",
      "units", "."]),
    ("He arrived at 9.", ["he", "arrived", "at", "9", "."]),
    # ellipsis runs are ONE token (spaCy ELLIPSES \.\.+), suffix and infix
    ("Wait... what....", ["wait", "...", "what", "...."]),
    ("so close...but no", ["so", "close", "...", "but", "no"]),
    # dotted single-letter acronyms keep the final period
    ("a u.s.a. flag", ["a", "u.s.a.", "flag"]),
    # brackets/parens peel from both ends
    ("(a dog [big])", ["(", "a", "dog", "[", "big", "]", ")"]),
    # plain caption text is untouched
    ("Two dogs run across the grass .",
     ["two", "dogs", "run", "across", "the", "grass", "."]),
]


@pytest.mark.parametrize("text,expected", GOLDEN,
                         ids=[t[:24] for t, _ in GOLDEN])
def test_python_tokenizer_golden(text, expected):
    assert tokenize_py(text) == expected


@pytest.mark.parametrize("text,expected", GOLDEN,
                         ids=[t[:24] for t, _ in GOLDEN])
def test_native_tokenizer_golden(text, expected):
    from imagecaptioner_tpu import native

    if not native.native_available():
        pytest.skip("native tokenizer not built")
    assert native.tokenize_native(text) == expected
