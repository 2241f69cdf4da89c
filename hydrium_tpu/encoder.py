"""Streaming JPEG XL encoder orchestration (placeholder — built up in
subsequent commits).  Will mirror hydrium's streaming API contract
(libhydrium.h:165-314): set metadata, send tiles in any order, drain
output incrementally."""

from __future__ import annotations

from .config import ImageMetadata, SampleFormat


class Encoder:
    def __init__(self, metadata: ImageMetadata) -> None:
        metadata.validate()
        self.metadata = metadata


def encode_image(image, **kwargs) -> bytes:
    raise NotImplementedError
