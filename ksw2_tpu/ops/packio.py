"""Packed host->device sequence transfer (4-bit bases, 2 per byte).

The encoded alphabet (nt4: 0..4, generic matrices m <= 16) fits a
nibble, so sequences cross the host->device link at half the bytes and
are unpacked on device with two shifts and an interleave.  On this
environment's device tunnel the link runs at ~30-40 MB/s, making
transfer volume a first-order term of batch dispatch (kalloc's
zero-copy spirit, SURVEY.md L0); on production hosts it halves PCIe/NIC
traffic instead.

The reference streams raw bytes to its kernels (ksw2_extz2_sse.c:84-98
copies target/query into the arena); packing is a transport-layer
change only — kernels still see int8 symbols.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_bases(a: np.ndarray) -> np.ndarray:
    """(B, L) small-int array -> (B, ceil(L/2)) uint8, 2 bases/byte."""
    a = np.asarray(a, np.uint8)
    B, L = a.shape
    if L % 2:
        a = np.concatenate([a, np.zeros((B, 1), np.uint8)], axis=1)
    return (a[:, ::2] | (a[:, 1::2] << 4)).astype(np.uint8)


def unpack_bases(p: jnp.ndarray, L: int) -> jnp.ndarray:
    """Device-side inverse of :func:`pack_bases` -> (B, L) int8."""
    p = p.astype(jnp.uint8)
    lo = (p & 15).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    out = jnp.stack([lo, hi], axis=2).reshape(p.shape[0], -1)
    return out[:, :L]


__all__ = ["pack_bases", "unpack_bases"]
