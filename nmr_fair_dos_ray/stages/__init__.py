"""Reusable map_batches stage callables (multimodal decode/feature stubs)."""

from nmr_fair_dos_ray.stages.multimodal import (  # noqa: F401
    AudioFrameSampleStage,
    ImageDecodeStage,
    ImageResizeStage,
    attach_binary_payload,
)
