"""Persistent XLA compilation cache.

Full-resolution inference compiles one executable per distinct image shape
(XLA static shapes; RoadScene's test split alone has 10 shapes) and a TPU
compile is tens of seconds. The persistent cache makes every shape a
one-time cost across processes — the reference has no equivalent because
cuDNN is shape-polymorphic (SURVEY.md §7 'Dynamic image sizes').
"""

import os

import jax

_DONE = False


def enable_compilation_cache(path=None):
    global _DONE
    if _DONE:
        return
    path = path or os.environ.get(
        "MMIF_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mmif_xla_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _DONE = True
