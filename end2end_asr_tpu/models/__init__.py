from end2end_asr_tpu.models import layers  # noqa: F401
