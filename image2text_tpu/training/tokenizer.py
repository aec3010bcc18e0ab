"""Tokenizer acquisition (host-side; reference trainer.py:118-127).

HF tokenizers stay on the host — tokenization is data-pipeline work, never
in the compiled path.  ``get_tokenizer`` reproduces the reference's
special-token bootstrapping (auto-added ``<EOS>/<BOS>/<MSK>``); the
:class:`SyntheticTokenizer` serves offline runs (``dataset: synthetic``)
with the same duck-typed surface.
"""
from __future__ import annotations

from typing import List, Optional


class SyntheticTokenizer:
    """Integer-token tokenizer for network-free smoke runs and benchmarks."""

    def __init__(self, vocab_size: int = 1024):
        self.vocab_size = vocab_size
        self.eos_token_id = 0
        self.bos_token_id = 1
        self.mask_token_id = 2
        self.eos_token = "<EOS>"
        self.bos_token = "<BOS>"
        self.mask_token = "<MSK>"
        self.pad_token = self.eos_token

    def __call__(self, text: str, max_length: Optional[int] = None,
                 truncation=None, padding=None, **kwargs):
        ids = [self._encode_tok(t) for t in text.split()]
        mask = [1] * len(ids)
        if max_length is not None and truncation:
            ids, mask = ids[:max_length], mask[:max_length]
        if padding == "max_length" and max_length is not None:
            pad = max_length - len(ids)
            ids = ids + [self.eos_token_id] * pad
            mask = mask + [0] * pad

        class Enc(dict):  # HF BatchEncoding duck-type: item + attr access
            pass

        enc = Enc(input_ids=ids, attention_mask=mask)
        enc.input_ids, enc.attention_mask = ids, mask
        return enc

    def _encode_tok(self, tok: str) -> int:
        import zlib

        specials = {self.eos_token: 0, self.bos_token: 1, self.mask_token: 2}
        if tok in specials:
            return specials[tok]
        try:
            return int(tok) % self.vocab_size
        except ValueError:
            # crc32, NOT hash(): the builtin is salted per process
            # (PYTHONHASHSEED), which would tokenize the same word
            # differently across runs and across hosts
            return (zlib.crc32(tok.encode()) % (self.vocab_size - 3)) + 3

    def decode(self, ids) -> str:
        names = {0: self.eos_token, 1: self.bos_token, 2: self.mask_token}
        return " ".join(names.get(int(i), str(int(i))) for i in ids)

    def batch_decode(self, batch) -> List[str]:
        return [self.decode(ids) for ids in batch]


def get_tokenizer(tokenizer_str: str, mask_fraction: float = 0.0,
                  synthetic_vocab: Optional[int] = None,
                  allow_fallback: bool = False):
    """AutoTokenizer with reference special-token logic; 'synthetic' asks
    for the SyntheticTokenizer explicitly.

    ``allow_fallback`` controls what happens when the HF tokenizer cannot
    be loaded (air-gapped machine without an HF cache): True substitutes a
    SyntheticTokenizer with a loud warning — correct for synthetic-dataset
    smoke runs and benchmarks, where token *identities* are arbitrary —
    while False (the default) re-raises, because a real-data run tokenized
    by the fallback would produce plausible-looking but meaningless
    checkpoints and metrics."""
    if tokenizer_str == "synthetic":
        return SyntheticTokenizer(synthetic_vocab or 1024)
    from transformers import AutoTokenizer

    try:
        tokenizer = AutoTokenizer.from_pretrained(tokenizer_str)
    except OSError as e:
        if not allow_fallback:
            raise RuntimeError(
                f"tokenizer {tokenizer_str!r} is unavailable (no HF cache / "
                "no network) and this run uses real data — refusing the "
                "SyntheticTokenizer substitute; set tokenizer_str: synthetic "
                "or use a synthetic dataset for offline smoke runs") from e
        import sys

        print(f"WARNING: tokenizer {tokenizer_str!r} unavailable "
              f"({type(e).__name__}); falling back to SyntheticTokenizer",
              file=sys.stderr)
        return SyntheticTokenizer(synthetic_vocab or 1024)
    kwargs = {}
    if tokenizer.eos_token_id is None:
        kwargs["eos_token"] = "<EOS>"
    if tokenizer.bos_token_id is None:
        kwargs["bos_token"] = "<BOS>"
    if tokenizer.mask_token_id is None and mask_fraction > 0:
        kwargs["mask_token"] = "<MSK>"
    if kwargs:
        tokenizer = AutoTokenizer.from_pretrained(tokenizer_str, **kwargs)
    return tokenizer
