"""SD1.x tokenizer: weighted prompts → padded 77-token chunks.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``SDTokenizer.tokenize_with_weights``  :4936  (weight parse, embedding
    directives, word-boundary-aware chunking into 77-token windows)
  - embedding resolution ``embedding:NAME``  :4954-4976
  - chunk assembly with start/end/pad tokens :4988-5026

A "chunk" is a (77,) id vector: [BOS, ≤75 payload ids, EOS, pad...], with a
parallel (77,) weight vector. Textual-inversion embeddings appear as rows to
be spliced at marked positions (negative sentinel ids), resolved later by the
text encoder (models/clip.py).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from .. import assets
from .bpe import ClipBPE
from .prompt_parser import parse_prompt_weights

MAX_LENGTH = 77
MAX_PAYLOAD = MAX_LENGTH - 2  # minus BOS/EOS


@dataclasses.dataclass
class TokenizedChunks:
    """(num_chunks, 77) int32 ids / float32 weights; embeddings[i] gives rows
    spliced in place of sentinel id -(i+1)."""

    ids: np.ndarray
    weights: np.ndarray
    embeddings: list[np.ndarray]


class SDTokenizer:
    def __init__(
        self,
        tokenizer_dir: str | Path | None = None,
        embedding_dir: str | Path | None = None,
        embedding_size: int = 768,
        pad_with_end: bool = True,
    ):
        d = Path(tokenizer_dir) if tokenizer_dir else assets.resolve_dir("sd1_tokenizer")
        self.bpe = ClipBPE(d / "vocab.json", d / "merges.txt")
        self.embedding_dir = embedding_dir
        self.embedding_size = embedding_size
        self.embedding_identifier = "embedding:"
        self.bos = self.bpe.bos_token_id
        self.eos = self.bpe.eos_token_id
        # SD1.x pads with EOS; SD2.x pads with token 0 (pad_with_end=False)
        self.pad = self.eos if pad_with_end else 0

    def _try_load_embedding(self, name: str):
        from ..loader.embeddings import load_textual_inversion

        d = (
            Path(self.embedding_dir)
            if self.embedding_dir
            else assets.resolve_dir("embeddings", must_exist=False)
        )
        try:
            return load_textual_inversion(d, name, self.embedding_size)
        except FileNotFoundError:
            return None

    def tokenize_with_weights(self, text: str) -> TokenizedChunks:
        """Parse weights + embedding directives, BPE-encode, chunk to 77."""
        parsed = parse_prompt_weights(text)

        # per-word token runs, so chunk breaks land on word boundaries
        runs: list[tuple[list[int], float]] = []  # (ids-or-sentinels, weight)
        embeddings: list[np.ndarray] = []
        for segment, weight in parsed:
            for word in segment.replace("\n", " ").split(" "):
                if not word:
                    continue
                if word.startswith(self.embedding_identifier):
                    name = word[len(self.embedding_identifier):].strip(",")
                    embed = self._try_load_embedding(name)
                    if embed is None:
                        continue  # silently skip missing embeds (ref :4963)
                    if embed.ndim == 1:
                        embed = embed[None]
                    sentinel = -(len(embeddings) + 1)
                    embeddings.append(np.asarray(embed, dtype=np.float32))
                    runs.append(([sentinel] * embed.shape[0], weight))
                    # trailing text glued to the directive (ref: leftover)
                    continue
                ids = self.bpe.encode(word)
                if ids:
                    runs.append((ids, weight))

        # chunk into windows of ≤75 payload, breaking on word boundaries when
        # the word fits in a fresh window; else hard-split the word
        chunks_ids: list[list[int]] = []
        chunks_w: list[list[float]] = []
        cur_ids: list[int] = []
        cur_w: list[float] = []

        def flush():
            nonlocal cur_ids, cur_w
            chunks_ids.append(cur_ids)
            chunks_w.append(cur_w)
            cur_ids, cur_w = [], []

        for ids, weight in runs:
            if len(cur_ids) + len(ids) > MAX_PAYLOAD:
                if len(ids) <= MAX_PAYLOAD:
                    flush()
                else:
                    # word longer than a whole window: fill and continue
                    space = MAX_PAYLOAD - len(cur_ids)
                    cur_ids += ids[:space]
                    cur_w += [weight] * space
                    ids = ids[space:]
                    flush()
                    while len(ids) > MAX_PAYLOAD:
                        chunks_ids.append(list(ids[:MAX_PAYLOAD]))
                        chunks_w.append([weight] * MAX_PAYLOAD)
                        ids = ids[MAX_PAYLOAD:]
            cur_ids += list(ids)
            cur_w += [weight] * len(ids)
        if cur_ids or not chunks_ids:
            flush()

        n = len(chunks_ids)
        out_ids = np.full((n, MAX_LENGTH), self.pad, dtype=np.int32)
        out_w = np.ones((n, MAX_LENGTH), dtype=np.float32)
        for i, (ids, ws) in enumerate(zip(chunks_ids, chunks_w)):
            out_ids[i, 0] = self.bos
            out_ids[i, 1 : 1 + len(ids)] = ids
            out_ids[i, 1 + len(ids)] = self.eos
            out_w[i, 1 : 1 + len(ws)] = ws
        return TokenizedChunks(ids=out_ids, weights=out_w, embeddings=embeddings)

    def untokenize(self, ids) -> str:
        return self.bpe.decode([i for i in np.asarray(ids).ravel() if i >= 0])
