"""The seed contract (documented in euro_price_mc):

1. per-backend bit-reproducibility given (seed, n_paths, flags);
2. device-placement invariance (mesh never changes the estimate beyond
   float-reduction order);
3. the XLA and Pallas backends draw from DIFFERENT generators, so the same
   seed gives different — statistically consistent — samples;
4. different seeds give different samples on every backend.

Here the Pallas engines run in the Mosaic interpreter (degenerate PRNG), so
(3) is asserted on the TPU-gated suite; everything else is CPU-checkable.
"""
import numpy as np
import pytest

from optpricer_tpu import CALL, OptionSpec, euro_price_mc, exotic_price_mc
from optpricer_tpu.parallel import get_mesh

OPT = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)


class TestReproducibility:
    def test_xla_terminal_bitwise(self):
        runs = [euro_price_mc(OPT, CALL, n_paths=100_000, seed=42,
                              backend="xla") for _ in range(2)]
        assert runs[0] == runs[1]

    def test_xla_exotic_bitwise(self):
        runs = [exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.03, sigma=0.2,
                                n_steps=16, n_paths=20_000, seed=42,
                                backend="xla") for _ in range(2)]
        assert runs[0] == runs[1]

    def test_distinct_seeds_distinct_samples(self):
        a = euro_price_mc(OPT, CALL, n_paths=50_000, seed=1, backend="xla")
        b = euro_price_mc(OPT, CALL, n_paths=50_000, seed=2, backend="xla")
        assert a != b

    def test_none_seed_draws_fresh_entropy(self):
        a = euro_price_mc(OPT, CALL, n_paths=50_000, seed=None,
                          backend="xla")
        b = euro_price_mc(OPT, CALL, n_paths=50_000, seed=None,
                          backend="xla")
        assert a != b


class TestPlacementInvariance:
    def test_mesh_matches_single_device_xla(self):
        # same chunk grid, fold_in streams → identical up to reduction order
        mesh = get_mesh(8)
        single = euro_price_mc(OPT, CALL, n_paths=64_000, chunk_size=1_000,
                               seed=7, backend="xla")
        sharded = euro_price_mc(OPT, CALL, n_paths=64_000, chunk_size=1_000,
                                seed=7, backend="xla", mesh=mesh)
        np.testing.assert_allclose(sharded, single, rtol=1e-10)

    def test_chunk_size_changes_stream_is_documented(self):
        # chunk layout participates in stream derivation (fold_in by chunk
        # id) — same seed + different chunk_size is a DIFFERENT sample.
        a = euro_price_mc(OPT, CALL, n_paths=60_000, chunk_size=10_000,
                          seed=3, backend="xla")
        b = euro_price_mc(OPT, CALL, n_paths=60_000, chunk_size=20_000,
                          seed=3, backend="xla")
        assert a != b
        # ...but both estimates agree statistically
        assert abs(a[0] - b[0]) < 5 * np.hypot(a[1], b[1])
