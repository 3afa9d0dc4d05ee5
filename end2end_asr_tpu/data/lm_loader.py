"""LM dataset / loader.

The reference ships a vestigial char-level LMDataset/LMDataLoader
(utils/lm_data_loader.py:8-62, no consumer) and a broken LM factory
importing a nonexistent module (utils/lm_functions.py:6). This module is
the WORKING equivalent: it extracts transcripts from ASR manifests,
builds a word-level vocab (code-switched text re-segmented the same way
the rescorer does — Chinese chars become single words), and yields
contiguous (input, target) BPTT batches for the LSTM LM.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from end2end_asr_tpu.utils.helper import (get_word_segments_per_language,
                                          is_contain_chinese_word)

EOS_WORD = "<eos>"
OOV_WORD = "<oov>"


def words_from_text(text: str) -> List[str]:
    """Lowercase + re-segment code-switched text: each Chinese char is
    its own word (matching decoding/lm_rescoring.py)."""
    text = " ".join(text.strip().lower().split())
    words: List[str] = []
    for seg in get_word_segments_per_language(text):
        if is_contain_chinese_word(seg):
            words.extend(ch for ch in seg if ch != " ")
        else:
            words.extend(w for w in seg.split(" ") if w)
    return words


def corpus_from_manifests(manifest_paths: Sequence[str]) -> List[List[str]]:
    sents = []
    for mp in manifest_paths:
        with open(mp, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                parts = line.split(",")
                if len(parts) < 2:
                    raise ValueError(
                        f"malformed manifest line in {mp!r} (expected "
                        f"'wav,txt'): {line!r}")
                txt_path = parts[1]
                with open(txt_path, encoding="utf-8") as tf:
                    words = words_from_text(tf.read())
                if words:
                    sents.append(words + [EOS_WORD])
    return sents


def build_word_vocab(sents: Sequence[Sequence[str]],
                     min_count: int = 1) -> Dict[str, int]:
    from collections import Counter
    counts = Counter(w for s in sents for w in s)
    vocab = {EOS_WORD: 0, OOV_WORD: 1}
    for w, c in sorted(counts.items()):
        if c >= min_count and w not in vocab:
            vocab[w] = len(vocab)
    return vocab


def batchify(sents: Sequence[Sequence[str]], word2idx: Dict[str, int],
             batch_size: int) -> np.ndarray:
    """Concatenate into one stream, fold into (batch_size, N) columns —
    torch LM convention (lstm_utils.py:71-80)."""
    oov = word2idx[OOV_WORD]
    ids = np.array([word2idx.get(w, oov) for s in sents for w in s],
                   np.int32)
    n = len(ids) // batch_size
    return ids[:n * batch_size].reshape(batch_size, n)


def bptt_batches(stream: np.ndarray, bptt: int
                 ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yields (inputs (B, L), targets (B, L)) next-word pairs."""
    N = stream.shape[1]
    for i in range(0, N - 1, bptt):
        L = min(bptt, N - 1 - i)
        yield stream[:, i:i + L], stream[:, i + 1:i + 1 + L]
