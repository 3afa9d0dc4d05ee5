"""Direct oracle tests for utils/metrics.py (VERDICT r3 weak #5).

calculate_cer / calculate_wer / calculate_cer_en_zh pinned against the
LIVE reference implementation (utils/metrics.py:9-76, python-Levenshtein
C extension + the real data/helper.py segmentation) on adversarial
cases: code-switched strings, empty en/zh halves, repeated words,
unicode beyond the BMP, multi-space runs. The C++ edit_distance_u32 and
the NumPy DP fallback are also cross-checked on the same suite plus
random strings.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from end2end_asr_tpu.utils.metrics import (_edit_distance_py,
                                           calculate_cer,
                                           calculate_cer_en_zh,
                                           calculate_wer, edit_distance)

REF = "/root/reference"

CASES = [
    ("", ""),
    ("", "abc"),
    ("abc", ""),
    ("hello world", "hello world"),
    ("hello world", "helo wrld"),
    ("a b c d", "d c b a"),
    # repeated words: WER's word2char map must collapse duplicates
    ("the the the cat", "the cat the the"),
    ("aa aa bb", "aa bb aa bb"),
    # pure chinese (separated chars, AiShell style)
    ("你 好 世 界", "你 好 世 界"),
    ("你 好 世 界", "你 号 世 界 啊"),
    # code-switched
    ("我 要 去 starbucks 喝 coffee", "我 想 去 starbucks 喝 tea"),
    ("play 周 杰 伦 的 歌", "播 放 周 杰 伦 的 歌 曲"),
    # en half empty / zh half empty
    ("你 好", "hello there"),
    ("hello there", "你 好"),
    ("只 有 中 文", "只 有 中 文 吗"),
    ("only english here", "only english there"),
    # unicode beyond the BMP (surrogate-pair territory)
    ("😀 emoji test", "😀 emoji text"),
    ("𠀀 𠀁", "𠀀 𠀂"),
    # multiple spaces / leading+trailing whitespace
    ("a  double  space", "a double space"),
    (" leading space", "leading space "),
    # long-ish realistic pair
    ("i am testing the speech recognition output today",
     "i am testing speech recognition outputs todays"),
]


@pytest.fixture(scope="module")
def oracle():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "ref_metrics_dump.py")],
        input=json.dumps(CASES), capture_output=True, text=True, env=env,
        timeout=300)
    if r.returncode != 0:
        pytest.skip(f"reference metrics not importable: {r.stderr[-500:]}")
    return json.loads(r.stdout)


def test_cer_matches_reference(oracle):
    for (s1, s2), ref in zip(CASES, oracle):
        assert calculate_cer(s1, s2) == ref["cer"], (s1, s2)


def test_wer_matches_reference(oracle):
    for (s1, s2), ref in zip(CASES, oracle):
        assert calculate_wer(s1, s2) == ref["wer"], (s1, s2)


def test_cer_en_zh_matches_reference(oracle):
    for (s1, s2), ref in zip(CASES, oracle):
        assert list(calculate_cer_en_zh(s1, s2)) == ref["en_zh"], (s1, s2)


def test_cpp_vs_numpy_edit_distance():
    rs = np.random.RandomState(0)
    alphabet = list("abc 你好世界😀𠀀")
    pairs = list(CASES)
    for _ in range(50):
        a = "".join(rs.choice(alphabet, size=rs.randint(0, 30)))
        b = "".join(rs.choice(alphabet, size=rs.randint(0, 30)))
        pairs.append((a, b))
    for a, b in pairs:
        assert edit_distance(a, b) == _edit_distance_py(a, b), (a, b)


def test_wer_differs_from_cer_on_word_swaps():
    # sanity: the word remap really is word-level (1 word sub, 4 char ops)
    assert calculate_wer("abcd efgh", "wxyz efgh") == 1
    assert calculate_cer("abcd efgh", "wxyz efgh") == 4
