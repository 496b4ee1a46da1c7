"""Multi-dimensional Sobol points + Brownian-bridge path construction.

Quasi-Monte Carlo for PATH-DEPENDENT payoffs needs one low-discrepancy
coordinate per time step.  Three pieces:

* **Direction numbers** — recovered from ``torch.quasirandom.SobolEngine``
  (Joe-Kuo table, baked into the image) once per (d, m_bits) on the host:
  in Gray-code order consecutive points differ by exactly one direction
  number, so ``x_{2^k} ⊕ x_{2^k−1} = V[k]`` and 2·m_bits tiny host draws
  recover the whole table.  Cached; no data files shipped.
* **Device generation** — Gray-code Sobol as pure uint32 XOR arithmetic:
  ``x_i = ⊕_{k: bit k of i^(i>>1)} V[k]``, vectorised over points, one
  ``fori`` over bits.  Randomisation is a per-dimension digital shift
  (XOR with threefry-derived uint32s), giving unbiased replicates whose
  spread is a true error bar — same design as the terminal QMC kernel
  (``ops/pallas_mc.mc_sumstats_qmc``).
* **Brownian bridge** — dimension 0 fixes W_T, later dimensions fill
  midpoints recursively, so the best-distributed Sobol coordinates carry
  the most variance: the classic decomposition that keeps
  high-dimensional QMC effective (effective dimension ~ a handful even
  at d = 252 steps).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["direction_numbers", "sobol_uniforms", "brownian_bridge_order",
           "bridge_paths"]

_DIR_CACHE: dict = {}
_MAXBIT = 30  # torch's SobolEngine internal precision


def direction_numbers(d: int, m_bits: int = 21) -> np.ndarray:
    """(m_bits, d) uint32 Sobol direction numbers, scaled to 2^-32.

    ``m_bits`` bounds the usable sequence length at 2^m_bits points.
    """
    key = (int(d), int(m_bits))
    if key in _DIR_CACHE:
        return _DIR_CACHE[key]
    import torch

    V = np.zeros((m_bits, d), np.uint64)
    for k in range(m_bits):
        eng = torch.quasirandom.SobolEngine(d, scramble=False)
        if 2 ** k - 1 > 0:
            eng.fast_forward(2 ** k - 1)
        pts = eng.draw(2, dtype=torch.float64).numpy()  # i = 2^k−1, 2^k
        a = np.round(pts[0] * (1 << _MAXBIT)).astype(np.uint64)
        b = np.round(pts[1] * (1 << _MAXBIT)).astype(np.uint64)
        V[k] = a ^ b
    out = (V << np.uint64(32 - _MAXBIT)).astype(np.uint32)
    _DIR_CACHE[key] = out
    return out


@partial(jax.jit, static_argnames=("n", "m_bits"))
def _sobol_bits(V, shift, *, n: int, m_bits: int):
    idx = jnp.arange(n, dtype=jnp.uint32)
    gray = idx ^ (idx >> 1)

    def body(k, x):
        bit = ((gray >> k) & jnp.uint32(1)).astype(jnp.uint32)
        return x ^ (bit[:, None] * V[k][None, :])

    x = jnp.zeros((n, V.shape[1]), jnp.uint32)
    x = jax.lax.fori_loop(0, m_bits, body, x)
    return x ^ shift[None, :]


def sobol_uniforms(n: int, d: int, key, *, m_bits: int = 21,
                   dtype=jnp.float32):
    """(n, d) digitally-shifted Sobol uniforms in (0, 1).

    ``key`` drives the per-dimension digital shift — a different key is an
    independent randomisation of the same point set (use R keys and the
    spread of the R estimates as the error bar).
    """
    if n > (1 << m_bits):
        raise ValueError(f"n={n} exceeds 2^m_bits={1 << m_bits} points")
    V = jnp.asarray(direction_numbers(d, m_bits))
    shift = jax.random.bits(key, (d,), jnp.uint32)
    bits = _sobol_bits(V, shift, n=int(n), m_bits=int(m_bits))
    if dtype == jnp.float64:
        return (bits.astype(jnp.float64) + 0.5) * (2.0 ** -32)
    # f32: keep the top 24 bits exactly representable, centre the cell
    return ((bits >> 8).astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -24)


def brownian_bridge_order(d: int):
    """Construction schedule for a d-step Brownian bridge.

    Returns ``(m, l, r)`` int arrays of length d−1: dimension j+1 of the
    point set fills step index ``m[j]`` (1-based time grid, 1..d) given
    already-built neighbours ``l[j]`` (may be 0 = origin) and ``r[j]``.
    Dimension 0 always maps to the terminal step d.
    """
    import collections

    ms, ls, rs = [], [], []
    todo = collections.deque([(0, d)])
    while todo:
        lo, hi = todo.popleft()
        if hi - lo < 2:
            continue
        mid = (lo + hi) // 2
        ms.append(mid)
        ls.append(lo)
        rs.append(hi)
        todo.append((lo, mid))
        todo.append((mid, hi))
    return (np.array(ms, np.int32), np.array(ls, np.int32),
            np.array(rs, np.int32))


def bridge_paths(z, T):
    """Brownian paths (n, d) at times (1..d)·T/d from quasi-normals z (n, d).

    z[:, 0] builds W_T; z[:, j] fills the j-th bridge midpoint.  The
    construction is an unrolled sequence of d−1 conditional-Gaussian
    fills — O(d) vector ops on (n,) slices.
    """
    n, d = z.shape
    dt = T / d
    ms, ls, rs = brownian_bridge_order(d)
    W = [None] * (d + 1)
    W[0] = jnp.zeros((n,), z.dtype)
    W[d] = jnp.sqrt(jnp.asarray(T, z.dtype)) * z[:, 0]
    for j, (m, l, r) in enumerate(zip(ms, ls, rs)):
        wl, wr = W[l], W[r]
        frac = (m - l) / (r - l)
        var = (m - l) * (r - m) / (r - l) * dt
        W[int(m)] = wl + frac * (wr - wl) \
            + jnp.sqrt(jnp.asarray(var, z.dtype)) * z[:, j + 1]
    return jnp.stack(W[1:], axis=1)  # (n, d), excludes the t=0 origin
