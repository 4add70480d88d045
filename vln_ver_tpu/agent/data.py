"""R2R episode data loading + tokenizer.

Reads the standard R2R release layout:
  R2R_{split}.json — [{scan, path: [viewpoint,...], heading,
                       instructions: [str x3]}, ...]
  connectivity/{scan}_connectivity.json
VER features per viewpoint come from the HDF5 written by tools/get_occ.py.

Instructions are tokenized with a whitespace vocab built from the training
split (id 0 = pad, 1 = unk) — the lightweight stand-in for the paper's
pretrained text front-end; swap in a converted BERT vocab later without
touching the policy.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from .env import NavGraph, load_connectivity

_TOKEN_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]")


def tokenize(text: str) -> List[str]:
    return _TOKEN_RE.findall(text.lower())


class Vocab:
    def __init__(self, words: List[str]):
        self.itos = ["<pad>", "<unk>"] + words
        self.stoi = {w: i for i, w in enumerate(self.itos)}

    @classmethod
    def build(cls, texts: List[str], min_count: int = 2,
              max_size: int = 4000) -> "Vocab":
        from collections import Counter
        counts = Counter()
        for t in texts:
            counts.update(tokenize(t))
        words = [w for w, c in counts.most_common(max_size - 2)
                 if c >= min_count]
        return cls(words)

    def encode(self, text: str, max_len: int) -> np.ndarray:
        ids = [self.stoi.get(w, 1) for w in tokenize(text)][:max_len]
        out = np.zeros((max_len,), np.int32)
        out[:len(ids)] = ids
        return out

    def __len__(self):
        return len(self.itos)


class WordPieceVocab:
    """BERT-compatible WordPiece tokenizer (greedy longest-match-first),
    for use with pretrained text weights from
    ``tools/convert_text_encoder.py``.  Reads a standard ``vocab.txt``
    (one token per line; ``##`` continuation prefix; [PAD]=0)."""

    def __init__(self, vocab_path: str, max_chars_per_word: int = 100):
        with open(vocab_path, encoding="utf-8") as f:
            # rstrip \r too: a CRLF-checkout vocab.txt would otherwise
            # leave '\r' on every token and degrade everything to [UNK]
            self.itos = [line.rstrip("\r\n") for line in f]
        self.stoi = {w: i for i, w in enumerate(self.itos)}
        self.unk = self.stoi.get("[UNK]", 1)
        self.cls = self.stoi.get("[CLS]")
        self.sep = self.stoi.get("[SEP]")
        self.max_chars = max_chars_per_word

    def _wordpiece(self, word: str) -> List[int]:
        if len(word) > self.max_chars:
            return [self.unk]
        ids, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.stoi:
                    cur = self.stoi[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk]
            ids.append(cur)
            start = end
        return ids

    def encode(self, text: str, max_len: int) -> np.ndarray:
        ids = []
        if self.cls is not None:
            ids.append(self.cls)
        for w in tokenize(text):
            ids.extend(self._wordpiece(w))
        if self.sep is not None:
            ids.append(self.sep)
        if len(ids) > max_len:
            # HF truncation semantics: [SEP] stays last
            ids = (ids[:max_len - 1] + [self.sep]
                   if self.sep is not None else ids[:max_len])
        out = np.zeros((max_len,), np.int32)
        out[:len(ids)] = ids
        return out

    def __len__(self):
        return len(self.itos)


def load_r2r_split(data_dir: str, split: str, vocab: Optional[Vocab],
                   max_text_len: int = 80, prefix: str = "R2R"
                   ) -> Tuple[List[Dict], Optional[Vocab]]:
    """Returns (episodes, vocab); one episode per (item, instruction).

    ``prefix`` selects the benchmark file family: R2R, R4R (same schema,
    concatenated paths), or REVERIE (same navigation schema; the object-
    grounding target is carried through in ``objId`` when present).
    """
    path = os.path.join(data_dir, f"{prefix}_{split}.json")
    with open(path) as f:
        items = json.load(f)
    if vocab is None:
        vocab = Vocab.build([ins for it in items
                             for ins in it["instructions"]])
    episodes = []
    for it in items:
        for ins in it["instructions"]:
            ep = dict(
                scan=it["scan"], path=it["path"],
                heading=it.get("heading", 0.0),
                instructions=[ins],
                instruction_tokens=vocab.encode(ins, max_text_len))
            if "objId" in it:   # REVERIE grounding target
                ep["objId"] = it["objId"]
            episodes.append(ep)
    return episodes, vocab


def load_graphs(connectivity_dir: str,
                scans: List[str]) -> Dict[str, NavGraph]:
    return {s: load_connectivity(
        os.path.join(connectivity_dir, f"{s}_connectivity.json"))
        for s in set(scans)}


def load_ver_features(hdf5_path: str) -> Dict[str, np.ndarray]:
    """Load all VER volumes (token -> (bev_num, C)); the dump layout is
    (C, Z, H, W) (tools/get_occ.py), flattened back to (Z*H*W, C)."""
    import h5py
    out = {}
    with h5py.File(hdf5_path, "r") as f:
        for k in f:
            v = f[k][:]
            c = v.shape[0]
            out[k] = v.reshape(c, -1).T.astype(np.float32)
    return out
