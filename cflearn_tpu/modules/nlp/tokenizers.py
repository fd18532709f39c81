"""Tokenizers.

Parity: reference `cflearn/modules/nlp/tokenizers/` — `ITokenizer` registry
(`schema.py:16`), `CLIPTokenizer` (BPE, `clip.py:59`) and
`ChineseCLIPTokenizer` (HF-backed, `clip.py:65`).

The CLIP BPE is implemented in-repo (byte-pair merges over the standard CLIP
vocab). Vocab/merges load from a local file (`bpe_path`) or from an installed
HF `transformers` cache when available; otherwise a deterministic byte-level
fallback keeps the pipeline runnable in zero-egress environments (bench &
tests use random weights, where exact token ids are irrelevant).
"""

import gzip
import html
import os
from functools import lru_cache
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ...toolkit.registry import WithRegister


class ITokenizer(WithRegister):
    d: Dict[str, type] = {}

    def tokenize(self, texts: Any, **kwargs: Any) -> np.ndarray:
        raise NotImplementedError


@lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]) -> set:
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _basic_clean(text: str) -> str:
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    import re

    return re.sub(r"\s+", " ", text).strip()


@ITokenizer.register("clip")
class CLIPTokenizer(ITokenizer):
    """CLIP byte-pair encoding (context length 77, SOT/EOT tokens)."""

    context_length = 77

    def __init__(
        self,
        bpe_path: Optional[str] = None,
        *,
        pad_to_max: bool = True,
        truncate: bool = True,
    ) -> None:
        self.pad_to_max = pad_to_max
        self.truncate = truncate
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        merges = self._load_merges(bpe_path)
        # provenance is stamped into quality/bench artifacts so "generated
        # from real tokenized prompts" can never silently mean the fallback
        self.provenance = "byte-fallback" if merges is None else "bpe-merges"
        if merges is None:
            # deterministic fallback: byte-level vocab only, no merges
            merges = []
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.decoder = {i: v for v, i in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.sot_token = self.encoder["<|startoftext|>"]
        self.eot_token = self.encoder["<|endoftext|>"]
        # CLIP's pre-tokenization pattern: letter runs stay together, each
        # digit is its own token, everything else (non-space) groups. Using
        # `\w+` here would merge digits into one token ("2023" → one BPE word
        # instead of '2</w>','0</w>','2</w>','3</w>') and silently mismatch
        # pretrained CLIP/SD conditioning.
        try:
            import regex

            self.pat = regex.compile(
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
                r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
                regex.IGNORECASE,
            )
        except ImportError:  # stdlib approximation of the unicode classes
            import re

            self.pat = re.compile(
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
                r"|[^\W\d_]+|\d|[^\s\w]+|_+",
                re.IGNORECASE,
            )

    @staticmethod
    def _load_merges(bpe_path: Optional[str]) -> Optional[List[Tuple[str, str]]]:
        candidates = []
        if bpe_path:
            candidates.append(bpe_path)
        from ...parameters import OPT

        candidates.append(os.path.join(OPT.cache_dir, "bpe_simple_vocab_16e6.txt.gz"))
        for path in candidates:
            if path and os.path.isfile(path):
                opener = gzip.open if path.endswith(".gz") else open
                with opener(path, "rt", encoding="utf-8") as f:  # type: ignore[operator]
                    lines = f.read().split("\n")
                lines = lines[1 : 49152 - 256 - 2 + 1]
                return [tuple(line.split()) for line in lines if line]
        # try HF transformers cache
        try:
            from transformers.utils import cached_file  # type: ignore

            path = cached_file("openai/clip-vit-base-patch32", "merges.txt", local_files_only=True)
            with open(path, "r", encoding="utf-8") as f:
                lines = f.read().split("\n")[1:]
            return [tuple(line.split()) for line in lines if line][: 49152 - 256 - 2]
        except Exception:  # noqa: BLE001
            return None

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs or not self.bpe_ranks:
            # no merges loaded → character-level fallback: per-char symbols
            # ARE in the base vocab, while a whole-word symbol like
            # 'hello</w>' is not and would be silently dropped by encode()
            if not self.bpe_ranks and len(word) > 1:
                return " ".join(word)
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        tokens: List[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in self.pat.findall(text):
            token_bytes = token.encode("utf-8")
            token_trans = "".join(self.byte_encoder[b] for b in token_bytes)
            tokens.extend(self.encoder[t] for t in self.bpe(token_trans).split(" ") if t in self.encoder)
        return tokens

    def tokenize(self, texts: Any, **kwargs: Any) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        result = np.zeros((len(texts), self.context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            tokens = [self.sot_token] + self.encode(text) + [self.eot_token]
            if len(tokens) > self.context_length:
                if not self.truncate:
                    raise ValueError(f"text too long: {text}")
                tokens = tokens[: self.context_length]
                tokens[-1] = self.eot_token
            result[i, : len(tokens)] = tokens
        return result


@ITokenizer.register("chinese_clip")
class ChineseCLIPTokenizer(ITokenizer):
    """HF transformers-backed tokenizer (reference `clip.py:65`)."""

    context_length = 52

    def __init__(self, name: str = "OFA-Sys/chinese-clip-vit-base-patch16") -> None:
        self.name = name
        self._tok = None

    def tokenize(self, texts: Any, **kwargs: Any) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        if self._tok is None:
            try:
                from transformers import AutoTokenizer  # type: ignore

                self._tok = AutoTokenizer.from_pretrained(self.name, local_files_only=True)
            except Exception:  # noqa: BLE001 — offline / no cached vocab
                self._tok = "char"
        if self._tok == "char":
            return self._char_tokenize(texts)
        out = self._tok(
            texts,
            padding="max_length",
            truncation=True,
            max_length=self.context_length,
            return_tensors="np",
        )
        return out["input_ids"].astype(np.int32)

    def _char_tokenize(self, texts: List[str]) -> np.ndarray:
        """Deterministic zero-egress fallback when the HF vocab is not cached:
        BERT-style [CLS] chars [SEP] with per-char ids hashed into the
        wordpiece-id range. NOT compatible with pretrained ChineseCLIP text
        towers — it only keeps random-weight pipelines runnable offline."""
        cls_id, sep_id, vocab = 101, 102, 21128
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, text in enumerate(texts):
            ids = [cls_id]
            for ch in text[: self.context_length - 2]:
                ids.append(1000 + (ord(ch) % (vocab - 1106)))
            ids.append(sep_id)
            out[i, : len(ids)] = ids
        return out


# reference base name (`nlp/tokenizers.py` ICLIPTokenizer)
ICLIPTokenizer = ITokenizer
