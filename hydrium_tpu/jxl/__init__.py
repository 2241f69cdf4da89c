"""Host-side JPEG XL codestream serialization plane.

Pure-Python reference implementations (bit-exact, heavily unit-tested)
with C++ fast paths for the hot serial loops (rANS emission).  Everything
in this package operates on host arrays; the TPU device plane lives in
`hydrium_tpu.ops`.
"""
