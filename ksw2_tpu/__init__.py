"""ksw2_tpu — TPU-native pairwise sequence alignment."""
from .utils.ccache import ensure_compile_cache as _ensure_compile_cache

# the kalloc analogue: every process reuses previously compiled kernels
# from the persistent cache (see utils/ccache.py; env overrides there)
_ensure_compile_cache()

from .api import Aligner  # noqa: E402  (needs the cache configured first)

__all__ = ["Aligner"]
