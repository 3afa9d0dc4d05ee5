"""Tokenized code-switch segmentation parity vs the live reference
(data/helper.py:101-161) with duck-typed tokenizers standing in for
StanfordCoreNLP — covering the CoreNLP-dependent path VERDICT r2 flagged
as the remaining helper gap. The Java service itself is not required:
any object with word_tokenize(str)->list satisfies both sides."""

import sys
import types

import pytest

from end2end_asr_tpu.utils.helper import (
    get_word_segments_per_language,
    get_word_segments_per_language_with_tokenization)
from dataprep.text import preprocess_mixed_language_sentence


class FakeNLP:
    """Deterministic stand-in tokenizer: splits on spaces and breaks
    words longer than `n` into n-char pieces (so tokenization visibly
    changes the string and parity is meaningful)."""

    def __init__(self, n):
        self.n = n

    def word_tokenize(self, s):
        out = []
        for w in s.split(" "):
            while len(w) > self.n:
                out.append(w[:self.n])
                w = w[self.n:]
            if w:
                out.append(w)
        return out


@pytest.fixture(scope="module")
def ref_helper():
    for name in ("torchaudio",):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.path.insert(0, "/root/reference")
    try:
        import data.helper as ref
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference helper not importable: {e}")
    finally:
        sys.path.remove("/root/reference")
    return ref


CASES = [
    "hello world 你好 世界 okay 再见",
    "你好 hello 你好 hello 你好",
    "all english words only",
    "全部 中文 词 而已",
    "mixed 了 mid word runs 好的 end",
    "a",
    "你",
]


@pytest.mark.parametrize("tokenize_lang", [-1, 0, 1])
@pytest.mark.parametrize("seq", CASES)
def test_segments_with_tokenization_match_reference(ref_helper, seq,
                                                    tokenize_lang):
    en, zh = FakeNLP(3), FakeNLP(1)
    ours = get_word_segments_per_language_with_tokenization(
        seq, tokenize_lang=tokenize_lang, en_nlp=en, zh_nlp=zh)
    theirs = ref_helper.get_word_segments_per_language_with_tokenization(
        seq, tokenize_lang=tokenize_lang, en_nlp=en, zh_nlp=zh)
    assert ours == theirs, (seq, tokenize_lang)


def test_untokenized_variant_agrees_where_no_tokens_change():
    """tokenize_lang=-1 applies no tokenizer, so the runs must equal the
    plain segmentation."""
    for seq in CASES:
        a = get_word_segments_per_language_with_tokenization(seq)
        b = get_word_segments_per_language(seq)
        assert a == b, seq


def test_preprocess_tokenized_path():
    en = FakeNLP(3)
    out = preprocess_mixed_language_sentence(
        "Hello, WONDERFUL 世界!", tokenize=True, en_nlp=en,
        tokenize_lang=0)
    # cleaned + english run re-tokenized into 3-char pieces
    assert out == "hel lo won der ful 世界"
    # short cleaned strings are dropped on the tokenized path
    # (data/helper.py:374-377)
    assert preprocess_mixed_language_sentence(
        "a!", tokenize=True, en_nlp=en, tokenize_lang=0) == ""
