"""ksw2_tpu — TPU-native pairwise sequence alignment."""
from .utils.ccache import ensure_compile_cache as _ensure_compile_cache

# the kalloc analogue: every process reuses previously compiled kernels
# from the persistent cache (see utils/ccache.py; env overrides there)
_ensure_compile_cache()
