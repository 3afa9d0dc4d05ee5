#!/usr/bin/env python3
"""Joint multi-dataset training CLI.

The reference advertises `multi_train.py` (README.md:95) whose source was
deleted — only trainer/asr/__pycache__/multi_trainer.cpython-35.pyc
remains ("Multi Dataset Trainer class for Joint-Training"; its bytecode
strings show per-TASK valid lines `(Epoch N) TASK:i VALID LOSS:…` and a
`valid_losses` metrics list). This restores the capability: joint
training over several train manifests (the dataset's random-manifest
sampling, utils/data_loader.py:126-133) with one validation loader — and
one TASK line — per task, via training.trainer.MultiTrainer.

Flags are identical to train.py; pass multiple --train-manifest-list and
--valid-manifest-list entries (task i's valid set is entry i).
"""

from end2end_asr_tpu.training.trainer import MultiTrainer
from train import main


def multi_main(argv=None):
    main(argv, trainer_cls=MultiTrainer)


if __name__ == "__main__":
    multi_main()
