"""Transcript cleaning + code-switch tagging for dataset prep.

Behavioral contract with data/aishell.py:26-172 and data/helper.py of the
reference: lowercase; strip bracketed hesitations; remove punctuation
(zh + latin) and special symbols; collapse runs of spaces; contraction
fix-ups; †/‡ language tags at language switches; Chinese words split to
single chars.
"""

from __future__ import annotations

import re

CHINESE_TAG = "†"
ENGLISH_TAG = "‡"

_PUNCT_RE = re.compile(
    "[\\s+\\\\!\\/_,$%=^*?:@&^~`(+\"]+"
    "|[+！，。？、~@#￥%……&*（）:;：；《）《》“”()»〔〕]+")
_SPECIAL_RE = re.compile(
    "[【】·．％°℃×→①ぃγ￣σς＝～•＋δ≤∶／⊥＿ñãíå∈△β［］±]+")
_BRACKETS = [re.compile(p) for p in
             (r"[\(\[].*?[\)\]]", r"[\{\[].*?[\}\]]",
              r"[\<\[].*?[\>\]]", r"[【\[].*?[】\]]")]

_CONTRACTION_FIXES = [
    ("doens't", "doesn't"), ("o' clock", "o'clock"),
    ("因为it's", "因为 it's"), ("it' s", "it's"), ("it ' s", "it's"),
    ("y'", "y"), ("y ' ", "y"), ("看different", "看 different"),
    ("it'self", "itself"), ("it'ss", "it's"), ("don'r", "don't"),
    ("has't", "hasn't"), ("don'know", "don't know"),
    ("i'll", "i will"), ("you're", "you are"),
    ("'re ", " are "), ("'ll ", " will "), ("'ve ", " have "),
    ("'re\n", " are\n"), ("'ll\n", " will\n"), ("'ve\n", " have\n"),
]


def collapse_spaces(seq: str) -> str:
    return re.sub(" {2,}", " ", seq).strip()


def remove_special_char(seq: str) -> str:
    return _SPECIAL_RE.sub(" ", seq)


def remove_punctuation(seq: str) -> str:
    seq = _PUNCT_RE.sub(" ", seq)
    for quote in ("'", "’", "＇", "`"):
        seq = seq.replace(f" {quote} ", " ")
    for quote in ("'", "’", "＇"):
        seq = seq.replace(f" {quote}", quote)
    for quote in ("’", "＇", "`"):
        seq = seq.replace(f"{quote} ", " ")
    seq = seq.replace(".", "").replace("`", "")
    for ch in "-?:;][}{|_()=":
        seq = seq.replace(ch, " ")
    for a, b in _CONTRACTION_FIXES:
        seq = seq.replace(a, b)
    return collapse_spaces(seq)


def preprocess(seq: str) -> str:
    """Full cleaning pipeline (data/aishell.py:95-125)."""
    seq = seq.lower()
    for br in _BRACKETS:
        seq = br.sub("", seq)
    for ch in ("\x7f", "\x80", "\xa0", "#", ",", "*", "\n", "\r",
               "\t", "~", "—"):
        seq = seq.replace(ch, "")
    seq = seq.replace("　", " ")
    seq = re.sub(r"\<.*?\>", "", seq)
    seq = re.sub(r"【.*?】", "", seq)
    seq = remove_special_char(seq)
    seq = collapse_spaces(seq)
    seq = remove_punctuation(seq)
    return collapse_spaces(seq)


# one owner for the language-detection rule — prep and runtime
# segmentation must never diverge
from end2end_asr_tpu.utils.helper import (is_chinese_char,  # noqa: E402,F401
                                          is_contain_chinese_word)


def add_lang(seq: str) -> str:
    """Insert †/‡ tags at language switches (data/aishell.py:139-157)."""
    out = ""
    lang = 0
    for word in seq.split(" "):
        new_lang = 1 if is_contain_chinese_word(word) else 2
        if lang != new_lang:
            lang = new_lang
            out += CHINESE_TAG if new_lang == 1 else ENGLISH_TAG
        if out != "":
            out += " "
        out += word
    return out


_EMOJI_RE = re.compile(
    "[" "\U0001F600-\U0001F64F"   # emoticons
        "\U0001F300-\U0001F5FF"   # symbols & pictographs
        "\U0001F680-\U0001F6FF"   # transport & map symbols
        "\U0001F1E0-\U0001F1FF"   # flags
    "]+", flags=re.UNICODE)


def remove_emojis(seq: str) -> str:
    """data/helper.py:171-187."""
    return _EMOJI_RE.sub("", seq).strip()


def merge_abbreviation(seq: str) -> str:
    """Join consecutive dot-terminated tokens ("u. s. a." → "u.s.a.")
    (data/helper.py:188-214)."""
    words = [w for w in collapse_spaces(seq).split(" ") if w]
    out, pending = [], ""
    for w in words:
        if w.endswith("."):
            pending += w
        else:
            if pending:
                out.append(pending)
                pending = ""
            out.append(w)
    if pending:
        out.append(pending)
    return " ".join(out)


def preprocess_mixed_language_sentence(seq: str, tokenize: bool = False,
                                       en_nlp=None, zh_nlp=None,
                                       tokenize_lang: int = -1) -> str:
    """Clean a code-switched sentence: emoji/punct/special-char removal,
    lowercase, abbreviation merge, space collapse
    (data/helper.py:314-383).

    tokenize=True runs the per-language-run tokenization variant
    (:356-358): segments of the selected language (0=english,
    1=chinese) are re-tokenized by a duck-typed ``word_tokenize``
    provider — a StanfordCoreNLP handle from
    utils/helper.corenlp_tokenizer if the user runs the Java service,
    or any stand-in. Non-Chinese segments get their non-ASCII chars
    spaced out either way (:361-363). The reference drops cleaned
    sentences of length <= 1 (:374-377)."""
    seq = remove_emojis(seq)
    seq = preprocess(seq)
    seq = merge_abbreviation(seq)
    seq = collapse_spaces(seq)
    if tokenize:
        from end2end_asr_tpu.utils.helper import \
            get_word_segments_per_language_with_tokenization
        segments = get_word_segments_per_language_with_tokenization(
            seq, tokenize_lang=tokenize_lang, en_nlp=en_nlp,
            zh_nlp=zh_nlp)
        out = []
        for seg in segments:
            if not is_contain_chinese_word(seg):
                seg = re.sub(r"[^\x00-\x7f]", r" ", seg)
            out.append(seg.replace("\n", ""))
        seq = collapse_spaces(" ".join(out))
        if len(seq) <= 1:
            return ""
    return seq


def separate_chinese_chars(seq: str) -> str:
    """Split Chinese words into single space-separated characters
    (data/aishell.py:159-172)."""
    parts = []
    for word in seq.split(" "):
        if is_contain_chinese_word(word):
            parts.extend(word)
        else:
            parts.append(word)
    return " ".join(parts)
