"""hydrium-tpu: a TPU-native JPEG XL (VarDCT, streaming) encoder.

A from-scratch reimplementation of the capabilities of Traneptora/hydrium
(reference: /root/reference) designed TPU-first:

- Device plane (JAX / Pallas): batched per-group kernels -- RGB->XYB color
  transform, 8x8 forward DCT on the MXU, LF/HF quantization, context
  modeling and hybrid-uint tokenization, per-cluster histograms.
- Host serialization plane (C++ / Python): bit-exact JPEG XL codestream
  assembly -- bit writer, prefix coding, rANS with alias tables, section/TOC
  layout.  Serial per stream, parallel across groups.
- Orchestration plane (Python): `Encoder` preserving hydrium's streaming
  API contract (send_tile / provide_output_buffer / flush), CLI, sharding.

Reference parity documented per-module with hydrium file:line citations.
"""

from .version import __version__
from .config import ImageMetadata, SampleFormat, HYD_UINT8, HYD_UINT16, HYD_FLOAT32
from .encoder import (BufferedEncoder, Encoder, NEED_MORE_OUTPUT, OK,
                      encode_image)

__all__ = [
    "__version__",
    "ImageMetadata",
    "SampleFormat",
    "HYD_UINT8",
    "HYD_UINT16",
    "HYD_FLOAT32",
    "Encoder",
    "BufferedEncoder",
    "OK",
    "NEED_MORE_OUTPUT",
    "encode_image",
]
