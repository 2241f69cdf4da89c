"""Process-wide JAX configuration for the encoder.

Persistent compilation cache: the fixed-buffer pipeline executables
(2048x2048 LFG etc.) take tens of seconds to build over the remote-TPU
tunnel; caching them on disk makes every later process start hot."""

import os

_done = False


def ensure() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import jax

        cache_dir = os.environ.get("HYDRIUM_JAX_CACHE",
                                   os.path.expanduser("~/.cache/jax_comp"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # persist EVERYTHING: the default 1.0s floor silently skips the
        # ~0.5s fetch-slicer/concat executables, so every new process
        # paid ~0.5s per (buffer, bucket) pair on its first encode
        # (measured: a smooth 4K encode spent 2 of its 2.3s in such
        # compiles; warm iterations of the same encode take 0.37s)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
