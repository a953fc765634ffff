"""Vocabulary with exact reference ordering semantics (data_loader.py:20-46).

Fixed specials ``<PAD>=0, <START>=1, <END>=2, <UNK>=3``.  ``build`` adds a
word at the moment its running count *reaches* ``freq_threshold`` (default 5),
assigning ids in first-reached order starting at 4 — this insertion-order
sensitivity matters for token-for-token caption parity (SURVEY §7 hard parts),
so it is reproduced exactly.  Unlike the reference (which rebuilds the vocab
from the full CSV on every process start, including in the streamlit app),
the vocabulary serializes to JSON and is built once.
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, List

from imagecaptioner_tpu.data.tokenizer import tokenize

PAD, START, END, UNK = 0, 1, 2, 3
SPECIALS = {0: "<PAD>", 1: "<START>", 2: "<END>", 3: "<UNK>"}


class Vocabulary:
    def __init__(self, freq_threshold: int = 5):
        self.itos: Dict[int, str] = dict(SPECIALS)
        self.stoi: Dict[str, int] = {v: k for k, v in SPECIALS.items()}
        self.freq_threshold = freq_threshold

    def __len__(self) -> int:
        return len(self.itos)

    @staticmethod
    def tokenizer_eng(text: str) -> List[str]:
        return tokenize(text)

    def build_vocabulary(self, sentence_list: Iterable[str]) -> None:
        """First-reached-threshold insertion order (data_loader.py:33-42)."""
        frequencies: Dict[str, int] = {}
        idx = len(self.itos)
        for sentence in sentence_list:
            for word in tokenize(sentence):
                frequencies[word] = frequencies.get(word, 0) + 1
                if frequencies[word] == self.freq_threshold:
                    self.stoi[word] = idx
                    self.itos[idx] = word
                    idx += 1

    def numericalize(self, text: str) -> List[int]:
        return [self.stoi.get(tok, UNK) for tok in tokenize(text)]

    def encode_caption(self, text: str) -> List[int]:
        """<START> + tokens + <END> framing (data_loader.py:83-86)."""
        return [START] + self.numericalize(text) + [END]

    def decode(self, ids: Iterable[int], *, strip_specials: bool = True) -> List[str]:
        words = []
        for i in ids:
            i = int(i)
            if strip_specials and i in (PAD, START, END):
                continue
            words.append(self.itos.get(i, "<UNK>"))
        return words

    # -- serialization ------------------------------------------------------

    def to_json(self) -> str:
        return json.dumps({
            "freq_threshold": self.freq_threshold,
            "itos": {str(k): v for k, v in self.itos.items()},
        })

    @classmethod
    def from_json(cls, s: str) -> "Vocabulary":
        d = json.loads(s)
        v = cls(d["freq_threshold"])
        v.itos = {int(k): w for k, w in d["itos"].items()}
        v.stoi = {w: i for i, w in v.itos.items()}
        return v

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "Vocabulary":
        with open(path) as f:
            return cls.from_json(f.read())
