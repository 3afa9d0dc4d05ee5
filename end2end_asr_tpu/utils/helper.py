"""Text / code-switching helpers.

Behavioral contract with data/helper.py:33-99 of the reference:
`is_chinese_char` = Unicode category 'Lo', and
`get_word_segments_per_language` groups a space-split sentence into
maximal runs of same-language words (language of a word = contains any
'Lo' char).
"""

from __future__ import annotations

import unicodedata
from typing import List


def is_chinese_char(cc: str) -> bool:
    return unicodedata.category(cc) == "Lo"


def is_contain_chinese_word(seq: str) -> bool:
    return any(is_chinese_char(c) for c in seq)


def get_word_segments_per_language(seq: str) -> List[str]:
    """Split into runs of same-language words. A segment is the
    space-joined run; language switches start a new segment."""
    segments: List[str] = []
    cur_lang = -1  # -1 unset, 0 english, 1 chinese
    cur = ""
    for word in seq.split(" "):
        lang = 1 if is_contain_chinese_word(word) else 0
        if cur_lang == -1 or lang == cur_lang:
            # reference quirk: no separator while the accumulator is empty
            if cur != "" and cur_lang != -1:
                cur += " "
            cur += word
        else:
            segments.append(cur)
            cur = word
        cur_lang = lang
    segments.append(cur)
    return segments


def get_word_segments_per_language_with_tokenization(
        seq: str, tokenize_lang: int = -1, zh_nlp=None,
        en_nlp=None) -> List[str]:
    """Language-run segmentation with per-run tokenization of ONE
    selected language (data/helper.py:101-161).

    `en_nlp`/`zh_nlp` are duck-typed tokenizers exposing
    ``word_tokenize(str) -> list[str]`` — a ``stanfordcorenlp``
    StanfordCoreNLP instance satisfies this if the user runs the Java
    service, and any callable-free stub works (tests inject one); no
    external dependency is required here.

    Reference quirks preserved exactly: only a COMPLETED run is
    tokenized at a language switch (english runs when tokenize_lang==0,
    chinese runs — with spaces stripped first — when tokenize_lang==1);
    the final run is tokenized only if its language matches, and the
    final chinese run is NOT space-stripped (:153-158, unlike the
    mid-sentence case :143)."""
    cur_lang = -1
    temp_words = ""
    word_segments: List[str] = []
    for word in seq.split(" "):
        if is_contain_chinese_word(word):
            if cur_lang == -1:
                cur_lang = 1
                temp_words = word
            elif cur_lang == 0:  # english run just ended
                cur_lang = 1
                if tokenize_lang == 0:
                    temp_words = " ".join(en_nlp.word_tokenize(temp_words))
                word_segments.append(temp_words)
                temp_words = word
            else:
                if temp_words != "":
                    temp_words += " "
                temp_words += word
        else:
            if cur_lang == -1:
                cur_lang = 0
                temp_words = word
            elif cur_lang == 1:  # chinese run just ended
                cur_lang = 0
                if tokenize_lang == 1:
                    temp_words = " ".join(
                        zh_nlp.word_tokenize(temp_words.replace(" ", "")))
                word_segments.append(temp_words)
                temp_words = word
            else:
                if temp_words != "":
                    temp_words += " "
                temp_words += word
    if tokenize_lang == 0 and cur_lang == 0:
        temp_words = " ".join(en_nlp.word_tokenize(temp_words))
    elif tokenize_lang == 1 and cur_lang == 1:
        temp_words = " ".join(zh_nlp.word_tokenize(temp_words))
    word_segments.append(temp_words)
    return word_segments


def corenlp_tokenizer(path_or_url: str, lang: str = "en"):
    """Optional StanfordCoreNLP handle for the tokenized preprocessing
    path (data/helper.py:314 tokenize=True). Returns None when the
    ``stanfordcorenlp`` package (and its Java service) is unavailable —
    callers fall back to the non-tokenized path."""
    try:
        from stanfordcorenlp import StanfordCoreNLP
    except ImportError:
        return None
    return StanfordCoreNLP(path_or_url, lang=lang)
