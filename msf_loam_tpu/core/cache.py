"""Persistent XLA compilation cache setup.

First-ever compiles of the fused frame programs take minutes over the
remote-TPU link; with the cache they load in seconds. Every CLI/bench entry
point calls ``enable_compilation_cache()`` — set ``MSF_JAX_CACHE=0`` to
disable, ``MSF_JAX_CACHE_DIR`` to relocate (default: <repo>/.jax_cache).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("msf_loam_tpu")


def enable_compilation_cache() -> bool:
    if os.environ.get("MSF_JAX_CACHE", "1") != "1":
        return False
    import jax

    default_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    cache_dir = os.environ.get("MSF_JAX_CACHE_DIR", default_dir)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        return True
    except Exception as e:  # older jax without the option
        logger.debug("compilation cache unavailable: %s", e)
        return False
