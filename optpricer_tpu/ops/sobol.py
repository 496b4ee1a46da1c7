"""Multi-dimensional Sobol points + Brownian-bridge path construction.

Quasi-Monte Carlo for PATH-DEPENDENT payoffs needs one low-discrepancy
coordinate per time step.  Three pieces:

* **Direction numbers** — scipy's 64-bit Joe-Kuo table
  (``scipy.stats._sobol._initialize_v``, the same data behind
  ``scipy.stats.qmc.Sobol(bits=64)``), truncated to 32 bits: one
  O(d·32) host call per (d, m_bits), cached.  The usable budget is
  2^32 points per replicate — the binding cap is now the uint32
  Gray-code word the kernels XOR in, not table precision.  Two
  independent oracles pin the data: torch's ``SobolEngine.sobolstate``
  (identical on the shared first 30 bits, tested) and the Gray-code
  draw-recovery ``_direction_numbers_xor``.  No data files shipped.
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
_MAXBIT = 32  # uint32 Gray-code word: 2^32 points per replicate
_TORCH_MAXBIT = 30  # torch SobolEngine table precision (fallback/oracle)


def direction_numbers(d: int, m_bits: int = 21) -> np.ndarray:
    """(m_bits, d) uint32 Sobol direction numbers, scaled to 2^-32.

    ``m_bits`` bounds the usable sequence length at 2^m_bits points;
    ``m_bits ≤ 32`` (the kernels' uint32 Gray-code word).  Primary
    source: scipy's 64-bit Joe-Kuo table (O(d·32) per call, cached);
    falls back to torch's 30-bit ``sobolstate`` if scipy's internal
    initialiser is unavailable.
    """
    key = (int(d), int(m_bits))
    if key in _DIR_CACHE:
        return _DIR_CACHE[key]
    if m_bits > _MAXBIT:
        raise ValueError(f"m_bits={m_bits} exceeds the generators' uint32 "
                         f"precision ({_MAXBIT} bits => 2^{_MAXBIT} points)")
    out = _direction_numbers_scipy(d, m_bits)
    if out is None:
        out = _direction_numbers_torch(d, m_bits)
    _DIR_CACHE[key] = out
    return out


def _direction_numbers_scipy(d: int, m_bits: int):
    """Read the (m_bits, d) table from scipy's 64-bit Joe-Kuo data.

    ``_initialize_v`` fills V_k already scaled to 2^-bits for
    ``bits=32`` — verified bit-exact against torch's independent
    ``sobolstate`` on the shared first 30 rows (tested).  Returns None
    when the private initialiser is missing (scipy refactor guard).
    """
    try:
        from scipy.stats._sobol import _initialize_v
    except ImportError:                                   # pragma: no cover
        return None
    v = np.zeros((d, _MAXBIT), dtype=np.uint64)
    _initialize_v(v, d, _MAXBIT)
    return v.T[:m_bits].astype(np.uint32)


def _direction_numbers_torch(d: int, m_bits: int) -> np.ndarray:
    """Fallback 30-bit table from torch's initialised ``sobolstate``."""
    if m_bits > _TORCH_MAXBIT:
        raise ValueError(f"m_bits={m_bits} exceeds the Joe-Kuo table "
                         f"precision ({_TORCH_MAXBIT} bits) of the torch "
                         "fallback")
    import torch

    eng = torch.quasirandom.SobolEngine(d, scramble=False)
    st = eng.sobolstate.numpy().astype(np.uint64)       # (d, 30)
    return (st.T[:m_bits] << np.uint64(32 - _TORCH_MAXBIT)).astype(np.uint32)


def _direction_numbers_xor(d: int, m_bits: int) -> np.ndarray:
    """Independent recovery of the same table from SobolEngine DRAWS via
    the Gray-code identity ``x_{2^k} ⊕ x_{2^k−1} = V[k]`` — O(2^m_bits)
    host work, kept as the test oracle for :func:`direction_numbers`."""
    import torch

    V = np.zeros((m_bits, d), np.uint64)
    for k in range(m_bits):
        eng = torch.quasirandom.SobolEngine(d, scramble=False)
        if 2 ** k - 1 > 0:
            eng.fast_forward(2 ** k - 1)
        pts = eng.draw(2, dtype=torch.float64).numpy()  # i = 2^k−1, 2^k
        a = np.round(pts[0] * (1 << _TORCH_MAXBIT)).astype(np.uint64)
        b = np.round(pts[1] * (1 << _TORCH_MAXBIT)).astype(np.uint64)
        V[k] = a ^ b
    return (V << np.uint64(32 - _TORCH_MAXBIT)).astype(np.uint32)


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


def sobol_uniforms(n: int, d: int, key, *, m_bits: int | None = None,
                   dtype=jnp.float32):
    """(n, d) digitally-shifted Sobol uniforms in (0, 1).

    ``key`` drives the per-dimension digital shift — a different key is an
    independent randomisation of the same point set (use R keys and the
    spread of the R estimates as the error bar). ``m_bits`` defaults to
    the requested budget (≥ 2^11 so small-n point sets stay nested in the
    big ones); pass it explicitly to pin a particular truncation.
    """
    if m_bits is None:
        m_bits = min(max(int(np.ceil(np.log2(max(n, 2)))), 11), _MAXBIT)
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

    Returns ``(m, l, r, depth)`` int arrays of length d−1: dimension j+1
    of the point set fills step index ``m[j]`` (1-based time grid, 1..d)
    given already-built neighbours ``l[j]`` (may be 0 = origin) and
    ``r[j]``; ``depth[j]`` is the BFS generation — every node at one
    depth only depends on strictly earlier depths, so a whole depth fills
    as ONE gather/scatter (the unrolled node-at-a-time form compiled in
    minutes on TPU; this compiles in seconds).  Dimension 0 always maps
    to the terminal step d.
    """
    import collections

    ms, ls, rs, ds = [], [], [], []
    todo = collections.deque([(0, d, 0)])
    while todo:
        lo, hi, lev = todo.popleft()
        if hi - lo < 2:
            continue
        mid = (lo + hi) // 2
        ms.append(mid)
        ls.append(lo)
        rs.append(hi)
        ds.append(lev)
        todo.append((lo, mid, lev + 1))
        todo.append((mid, hi, lev + 1))
    return (np.array(ms, np.int32), np.array(ls, np.int32),
            np.array(rs, np.int32), np.array(ds, np.int32))


def bridge_paths(z, T):
    """Brownian paths (n, d) at times (1..d)·T/d from quasi-normals z (n, d).

    z[:, 0] builds W_T; z[:, j] fills the j-th bridge midpoint.  Nodes of
    one bridge depth are mutually independent, so each of the ~log2(d)
    depths is one batched gather → conditional-Gaussian fill → scatter.
    """
    n, d = z.shape
    dt = T / d
    ms, ls, rs, depth = brownian_bridge_order(d)
    W = jnp.zeros((n, d + 1), z.dtype)
    W = W.at[:, d].set(jnp.sqrt(jnp.asarray(T, z.dtype)) * z[:, 0])
    for lev in range(int(depth.max()) + 1 if len(depth) else 0):
        sel = np.nonzero(depth == lev)[0]
        m, l, r = ms[sel], ls[sel], rs[sel]
        wl = W[:, l]
        wr = W[:, r]
        frac = jnp.asarray(((m - l) / (r - l)), z.dtype)
        sd = jnp.sqrt(jnp.asarray(
            (m - l) * (r - m) / (r - l), z.dtype) * dt)
        vals = wl + frac[None, :] * (wr - wl) \
            + sd[None, :] * z[:, 1 + sel]
        W = W.at[:, m].set(vals)
    return W[:, 1:]  # (n, d), excludes the t=0 origin
