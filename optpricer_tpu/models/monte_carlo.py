"""Terminal-only GBM European Monte-Carlo pricer, TPU-native.

Re-architecture of reference ``monte_carlo.py:11-163``:

* The chunked streaming design and the exact sufficient-statistics reduction
  (n, ΣX, ΣX², ΣY, ΣY², ΣXY) are preserved — they are what make the reduction
  associative and layout-independent (reference ``monte_carlo.py:57-74``).
* ``SeedSequence.spawn`` per-chunk independence (reference
  ``monte_carlo.py:106,120,131``) becomes counter-based
  ``jax.random.fold_in(root_key, chunk_index)`` — the chunk index alone
  determines the stream, so results are reproducible regardless of which
  device executes the chunk.
* The ``ProcessPoolExecutor`` fan-out (reference ``monte_carlo.py:128-139``)
  becomes a ``jax.sharding.Mesh`` data-parallel axis: each device scans its
  chunk ids and the six statistics are ``psum``-ed over ICI
  (see :mod:`optpricer_tpu.parallel.mesh`).
* All chunks are a fixed static shape; the ragged tail is handled by a 0/1
  weight mask so the whole pricer is one compiled XLA program.
* On TPU a fused Pallas kernel (``ops/pallas_mc.py``) generates the normals,
  payoff and partial reductions in-registers without materialising draws.

Returns ``(price, stderr)`` like the reference.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import CALL, OptionSpec
from ..dtypes import canonical
from ..ops import stats as stats_ops
from ..ops.black_scholes import is_call_mask

__all__ = ["euro_price_mc", "euro_greeks_mc", "mc_sumstats", "resolve_seed"]


def resolve_seed(seed: Optional[int]) -> int:
    """None → fresh OS entropy (reference semantics of SeedSequence(None))."""
    if seed is None:
        return int(np.random.SeedSequence().entropy % (2**63))
    return int(seed)


def _chunk_stats(key, chunk_idx, n_paths, S0, K, T, r, q, sigma, is_call,
                 *, chunk_size: int, antithetic: bool, dtype):
    """Sufficient statistics of one fixed-size chunk of terminal GBM draws.

    Exact log-Euler terminal scheme (reference ``monte_carlo.py:30-55``):
    S_T = S0·exp((r−q−σ²/2)T + σ√T·Z), X = e^{−rT}·payoff, Y1 = e^{−rT}·S_T.
    Emits the extended 10-stat layout (adds digital moments Y2 = e^{−rT}·
    1{ITM}) shared with the Pallas kernels; the price estimator uses the
    first six (reference parity), the extras feed pathwise Greeks.
    """
    mu = (r - q - 0.5 * sigma * sigma) * T
    sig = sigma * jnp.sqrt(T)
    df = jnp.exp(-r * T)

    ck = jax.random.fold_in(key, chunk_idx)
    Z = jax.random.normal(ck, (chunk_size,), dtype)
    # NOTE: moments(-Z) evaluates every z-weighted moment at (X(−z))·(−z) —
    # the antithetic branch contributes its own draw, so the pooled
    # estimator of each Greek expectation stays unbiased.

    base = chunk_idx * chunk_size + jnp.arange(chunk_size)
    w = (base < n_paths).astype(dtype)

    def moments(z):
        ST = S0 * jnp.exp(mu + sig * z)
        itm = jnp.where(is_call, ST > K, ST < K)
        payoff = jnp.where(is_call, jnp.maximum(ST - K, 0.0),
                           jnp.maximum(K - ST, 0.0))
        X = df * payoff
        Y1 = df * ST
        Y2 = df * itm.astype(dtype)
        WX = X * w
        WY1 = Y1 * w
        WY2 = Y2 * w
        return jnp.stack([
            jnp.sum(w),
            jnp.sum(WX), jnp.sum(WX * X),
            jnp.sum(WY1), jnp.sum(WY1 * Y1), jnp.sum(WX * Y1),
            jnp.sum(WY2), jnp.sum(WY2 * Y2), jnp.sum(WX * Y2),
            jnp.sum(WY1 * Y2),
            jnp.sum(WX * z), jnp.sum(WX * z * z), jnp.sum(WY2 * z),
        ])

    s = moments(Z)
    if antithetic:
        s = s + moments(-Z)
    return s


@partial(jax.jit, static_argnames=("chunk_size", "antithetic", "dtype"))
def mc_sumstats(key, chunk_ids, n_paths, S0, K, T, r, q, sigma, is_call,
                *, chunk_size: int, antithetic: bool, dtype):
    """Scan the given chunk ids, Kahan-accumulating the 6 sufficient stats.

    ``chunk_ids`` is an explicit array so the same compiled function serves
    the single-device path (arange) and each shard of a mesh-parallel run
    (its local slice of the padded chunk grid); out-of-range ids contribute
    zero weight, so padding is harmless.
    """
    dtype = jnp.dtype(dtype)

    def step(carry, idx):
        acc, comp = carry
        s = _chunk_stats(
            key, idx, n_paths, S0, K, T, r, q, sigma, is_call,
            chunk_size=chunk_size, antithetic=antithetic, dtype=dtype,
        )
        acc, comp = stats_ops.kahan_add(acc, comp, s)
        return (acc, comp), None

    # Derive the zero carry from chunk_ids so its varying-axis type matches
    # inside shard_map (scan requires carry in/out manual-axes agreement).
    zero = jnp.zeros((stats_ops.STATSG_DIM,), dtype) \
        + jnp.zeros((), dtype) * chunk_ids[0].astype(dtype)
    (acc, _), _ = jax.lax.scan(step, (zero, zero), chunk_ids)
    return acc


def _estimate(stats_vec, S0, q, T, control_variate: bool):
    """Turn the stats vector into (price, stderr) on the host.

    Only the first six components feed the price — exactly the reference's
    single-CV estimator (``monte_carlo.py:150-163``)."""
    stats_vec = np.asarray(jax.device_get(stats_vec), dtype=np.float64)
    n = stats_vec[stats_ops.N]
    if n == 0:
        return float("nan"), float("nan")
    sv = stats_vec[:stats_ops.STATS_DIM]
    if control_variate:
        EY = S0 * np.exp(-q * T)  # known E[e^{-rT}S_T] under Q
        mean, se = stats_ops.cv_mean_se_np(sv, EY)
    else:
        mean = sv[stats_ops.SX] / n
        var = max(0.0, sv[stats_ops.SX2] / n - mean * mean)
        se = float(np.sqrt(var / n))
    return float(mean), float(se)


def euro_price_mc(
    opt: OptionSpec,
    kind: str = CALL,
    *,
    n_paths: int = 100_000,
    seed: Optional[int] = None,
    chunk_size: int = 100_000,
    antithetic: bool = True,
    control_variate: bool = True,
    n_workers: int = 1,
    dtype=None,
    return_stderr: bool = True,
    mesh=None,
    backend: str = "auto",
):
    """European option Monte-Carlo pricer (terminal-only GBM).

    API parity with reference ``euro_price_mc`` (``monte_carlo.py:77-163``).
    ``n_workers`` is accepted for compatibility; device-level parallelism is
    controlled by ``mesh`` (a ``jax.sharding.Mesh`` with a ``"paths"`` axis)
    instead of a process pool. ``backend``: "auto" | "xla" | "pallas" |
    "qmc" — "pallas" selects the fused TPU kernel for large path counts;
    "qmc" prices on randomised quasi-Monte Carlo points (scrambled van der
    Corput through the inverse CDF, ~O(n⁻¹) error on this payoff, error
    bar from the spread of 16 independent randomisations).

    **Seed semantics.** Each backend is bit-reproducible given
    ``(seed, n_paths, chunk_size/antithetic flags)``, and each is invariant
    to device placement (XLA streams are fixed by ``fold_in(key, chunk_id)``;
    Pallas streams by the *global* program id), so ``mesh=`` never changes an
    estimate beyond float-reduction order. The two backends draw from
    DIFFERENT generators, however — XLA uses counter-based threefry, the
    Pallas kernel the TPU core PRNG — so the same seed gives a different
    (equally valid) sample on each. Under ``backend="auto"`` on TPU the
    engine switches to Pallas at ``n_paths >= 1_000_000``; pin ``backend=``
    explicitly when bit-stable prices across path counts or platforms
    matter. Reference parity: one ``seed`` fully determines the run
    (``monte_carlo.py:106-139``); the reference's process-pool layout
    independence maps to our device-placement independence.

    Returns ``(price, stderr)`` (or just price when ``return_stderr=False``).
    """
    del n_workers  # process pools replaced by the device mesh
    dt = canonical(dtype)
    S0, K, T, r, sigma = opt.S0, opt.K, opt.T, opt.r, opt.sigma
    q = getattr(opt, "q", 0.0)
    is_call = bool(is_call_mask(kind))
    seed = resolve_seed(seed)
    key = jax.random.key(seed)

    n_chunks = -(-int(n_paths) // int(chunk_size))

    if backend == "qmc":
        # Randomised quasi-Monte Carlo: scrambled van der Corput points
        # through the inverse CDF, error bar from replicate spread.
        # Deterministic given (seed, n_paths) per backend, and every
        # backend evaluates the SAME sample set (the scramble is
        # arithmetic, no hardware PRNG; values agree to f32 round-off).
        # O(n⁻¹)-ish error vs O(n⁻½) for plain MC. ``antithetic`` is
        # ignored (the point set already stratifies).
        from ..ops.pallas_mc import mc_sumstats_qmc, qmc_estimate

        rep_stats = mc_sumstats_qmc(
            seed, n_paths, S0, K, T, r, q, sigma, is_call,
            interpret=jax.default_backend() != "tpu")
        price, se = qmc_estimate(rep_stats, S0, K, T, r, q, sigma, is_call,
                                 control_variate)
        return (price, se) if return_stderr else price

    use_pallas = backend == "pallas" or (
        backend == "auto"
        and jax.default_backend() == "tpu"
        and n_paths >= 1_000_000
    )
    if use_pallas:
        from ..ops.pallas_mc import (mc_sumstats_pallas,
                                     mc_sumstats_pallas_sharded,
                                     pallas_estimate)

        if mesh is not None:
            stats_vec = mc_sumstats_pallas_sharded(
                mesh, seed, n_paths, S0, K, T, r, q, sigma, is_call,
                antithetic=antithetic, dtype=dt,
            )
        else:
            stats_vec = mc_sumstats_pallas(
                seed, n_paths, S0, K, T, r, q, sigma, is_call,
                antithetic=antithetic, dtype=dt,
            )
        price, se = pallas_estimate(stats_vec, S0, K, T, r, q, sigma,
                                    is_call, control_variate)
        return (price, se) if return_stderr else price
    if mesh is not None:
        from ..parallel.mesh import mc_sumstats_sharded

        stats_vec = mc_sumstats_sharded(
            mesh, key, n_chunks, n_paths, S0, K, T, r, q, sigma, is_call,
            chunk_size=int(chunk_size), antithetic=antithetic, dtype=dt,
        )
    else:
        args = [jnp.asarray(v, dt) for v in (S0, K, T, r, q, sigma)]
        stats_vec = mc_sumstats(
            key, jnp.arange(n_chunks), jnp.asarray(n_paths),
            *args, jnp.asarray(is_call),
            chunk_size=int(chunk_size), antithetic=antithetic, dtype=dt,
        )

    price, se = _estimate(stats_vec, S0, q, T, control_variate)
    return (price, se) if return_stderr else price


def euro_greeks_mc(opt: OptionSpec, kind: str = CALL, *,
                   n_paths: int = 1_000_000, seed: Optional[int] = None,
                   chunk_size: int = 100_000, antithetic: bool = True,
                   dtype=None, backend: str = "auto", mesh=None) -> dict:
    """All five Greeks + digital price from ONE kernel run.

    Under GBM every pathwise/likelihood-ratio Greek is a linear combination
    of the 13 moments the sufficient-statistics kernels accumulate (see
    ``ops.pallas_mc.pallas_greeks`` for the estimators), so the full risk
    ladder costs nothing beyond the pricing run — versus 5 bump re-pricings
    in the reference (``risk.py``). With ``mesh=`` the 13-moment vector
    rides one psum over the path-sharded mesh, so Greek runs scale out
    exactly like pricing runs. Returns ``{"price", "delta", "gamma",
    "vega", "theta", "rho", "digital"}``.
    """
    from ..ops.pallas_mc import (mc_sumstats_pallas,
                                 mc_sumstats_pallas_sharded, pallas_greeks)

    dt = canonical(dtype)
    S0, K, T, r, sigma = opt.S0, opt.K, opt.T, opt.r, opt.sigma
    q = getattr(opt, "q", 0.0)
    is_call = bool(is_call_mask(kind))
    seed = resolve_seed(seed)

    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu")
    if mesh is not None:
        stats_vec = mc_sumstats_pallas_sharded(
            mesh, seed, n_paths, S0, K, T, r, q, sigma, is_call,
            antithetic=antithetic)
    elif use_pallas:
        stats_vec = mc_sumstats_pallas(
            seed, n_paths, S0, K, T, r, q, sigma, is_call,
            antithetic=antithetic, dtype=dt)
    else:
        n_chunks = -(-int(n_paths) // int(chunk_size))
        args = [jnp.asarray(v, dt) for v in (S0, K, T, r, q, sigma)]
        stats_vec = mc_sumstats(
            jax.random.key(seed), jnp.arange(n_chunks), jnp.asarray(n_paths),
            *args, jnp.asarray(is_call),
            chunk_size=int(chunk_size), antithetic=antithetic, dtype=dt)
    return pallas_greeks(stats_vec, S0, K, T, r, q, sigma, is_call)
