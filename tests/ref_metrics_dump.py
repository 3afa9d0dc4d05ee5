"""Subprocess helper: run the REFERENCE error-rate metrics
(utils/metrics.py:9-76 — calculate_cer / calculate_wer /
calculate_cer_en_zh, backed by the real python-Levenshtein C extension
and the real data/helper.py segmentation) on a case list read from
stdin as JSON, and print the results as JSON.

Imported AS AN ORACLE — no reference code is copied.

Usage: python ref_metrics_dump.py < cases.json > results.json
"""

import json
import sys
import types


def main():
    # utils/constant.py parses argv at import
    sys.argv = ["ref"]
    # data/helper.py imports torchaudio/scipy for its wav utilities; the
    # segmentation functions the metrics use don't touch them — stub if
    # absent so the oracle stays importable.
    for mod in ("torchaudio",):
        try:
            __import__(mod)
        except ImportError:
            sys.modules[mod] = types.ModuleType(mod)
    sys.path.insert(0, "/root/reference")

    from utils.metrics import (calculate_cer, calculate_cer_en_zh,
                               calculate_wer)

    cases = json.load(sys.stdin)
    out = []
    for s1, s2 in cases:
        out.append({
            "cer": calculate_cer(s1, s2),
            "wer": calculate_wer(s1, s2),
            "en_zh": list(calculate_cer_en_zh(s1, s2)),
        })
    json.dump(out, sys.stdout)


if __name__ == "__main__":
    main()
