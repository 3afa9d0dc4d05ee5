#!/usr/bin/env python3
"""Joint multi-dataset training CLI.

The reference advertises `multi_train.py` (README.md:95) whose source was
deleted — only trainer/asr/__pycache__/multi_trainer.cpython-35.pyc
remains ("Multi Dataset Trainer class for Joint-Training", per-TASK valid
logging). This restores the capability: joint training over several
train manifests (the dataset's random-manifest sampling,
utils/data_loader.py:126-133) with one validation loader — and one
logged VALID SET line — per task.

Flags are identical to train.py; pass multiple --train-manifest-list and
--valid-manifest-list entries (task i's valid set is entry i).
"""

from train import main

if __name__ == "__main__":
    main()
