"""Persistent XLA compilation cache.

The fused frame step is one large XLA program (unrolled marching
cascade + ICP iterations — see CLAUDE.md perf laws for why they
unroll); a cold compile through the remote-compile tunnel takes
minutes. The reference has no equivalent cost (C++ is compiled once,
ahead of time); this restores that property for the TPU build: the
first run of any entry point compiles and persists executables under
``<repo>/.jax_cache``, subsequent runs load in milliseconds.

Call :func:`enable` before the first jit dispatch. Set
``SE_TPU_NO_COMPILE_CACHE=1`` to opt out.
"""

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(cache_dir: str | None = None) -> None:
    if os.environ.get("SE_TPU_NO_COMPILE_CACHE") == "1":
        return
    import jax
    d = cache_dir or os.environ.get("SE_TPU_COMPILE_CACHE", _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
