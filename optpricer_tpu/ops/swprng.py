"""Software counter-based PRNG (Threefry-2x32-20) for Pallas kernels.

JAX 0.9's Mosaic interpreter stubs ``pltpu.prng_random_bits`` to ZEROS
(``jax/_src/pallas/mosaic/interpret/interpret_pallas_call.py`` — literally
``# TODO(jburnim): Implement this properly?`` → ``jnp.zeros(...)``), which
silently collapses every Box-Muller normal in an interpret-mode kernel to
one constant ≈ 5.88. Prices computed that way are deterministic garbage —
a hole the CPU harness could not see because its kernel tests only compared
interpret runs against other interpret runs.

The MC kernels therefore accept a static ``sw_prng`` flag (defaulting to
the ``interpret`` flag) that swaps the hardware PRNG for this stateless
counter-based generator: plain uint32 adds/xors/shifts that lower through
Mosaic and trace in the interpreter alike, so the SAME draws are produced
bit-for-bit on TPU hardware and under the interpreter. That both makes
CPU-harness kernel statistics real and provides a cross-platform
reproducibility oracle (run the kernel with ``sw_prng=True`` on the chip
and in interpret mode: the stats must match exactly —
``tests/test_pallas_tpu.py``).

Threefry-2x32, 20 rounds (Salmon, Moraes, Dror & Shaw, "Parallel random
numbers: as easy as 1, 2, 3", SC'11) — the same PRF JAX's host-side PRNG
is built on; Crush-resistant, stateless, ~45 vector ops per 2×32-bit
block. The hardware PRNG stays the production path: it is effectively free,
while threefry costs ~20 VPU ops per 32-bit word.

Reference anchor: the reference seeds one ``np.random.default_rng(seed)``
per pricing call (``/root/reference/src/optpricer/monte_carlo.py:35``);
here the (key, counter) pair is (seed, global program id) × (lane element,
draw index), which is what makes the stream layout device-count-invariant.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["threefry2x32"]

# Rotation schedule R_{2x32} from the Threefish/Threefry specification:
# rounds 4i..4i+3 use the first/second half alternately.
_ROTATIONS = (13, 15, 26, 6, 17, 29, 16, 24)

# Threefry key-schedule parity constant (SKEIN_KS_PARITY32).
_PARITY = 0x1BD11BDA


def _rotl(x, r: int):
    """32-bit left rotation by a static amount."""
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def threefry2x32(key0, key1, ctr0, ctr1):
    """One Threefry-2x32-20 block: two uint32 outputs per (key, counter).

    ``key0``/``key1`` are scalars (any integer dtype); ``ctr0``/``ctr1``
    are scalars or tiles and broadcast against each other. Returns
    ``(x0, x1)`` uint32 arrays of the broadcast counter shape — i.e. two
    independent random bit-tiles per call, which is exactly the Box-Muller
    appetite of the MC kernels.
    """
    k0 = jnp.asarray(key0).astype(jnp.uint32)
    k1 = jnp.asarray(key1).astype(jnp.uint32)
    k2 = k0 ^ k1 ^ jnp.uint32(_PARITY)
    ks = (k0, k1, k2)
    x0 = jnp.asarray(ctr0).astype(jnp.uint32) + k0
    x1 = jnp.asarray(ctr1).astype(jnp.uint32) + k1
    for block in range(5):
        for j in range(4):
            x0 = x0 + x1
            x1 = _rotl(x1, _ROTATIONS[(block % 2) * 4 + j]) ^ x0
        # key injection after every 4 rounds; the round-number tweak on x1
        # breaks the shift symmetry of the schedule
        x0 = x0 + ks[(block + 1) % 3]
        x1 = x1 + ks[(block + 2) % 3] + jnp.uint32(block + 1)
    return x0, x1
