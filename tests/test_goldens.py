"""Golden-number regression gate.

Compares every registry case (tests/golden_cases.py) against the committed
values in tests/goldens.json at tight relative tolerance. A failure here
means the NUMBERS changed — either an intentional numeric change (rerun
``python -m tests.golden_cases --update`` and explain in the commit) or a
silent regression the oracle/tolerance tests would absorb.
"""
import json
import os

import pytest

from tests.golden_cases import _CASES, GOLDEN_PATH

pytestmark = pytest.mark.skipif(
    os.environ.get("OPTPRICER_TEST_TPU") == "1",
    reason="goldens are pinned on the CPU/x64 harness")

# f64 deterministic engines: tight. The LM fit iterates to a tolerance, so
# its parameters get a slightly wider band than closed forms/solvers.
RTOL = {"svi_fit": 1e-6, "dupire_probe": 1e-6}
DEFAULT_RTOL = 1e-9

GOLDENS = json.loads(GOLDEN_PATH.read_text())


def test_registry_and_file_in_sync():
    assert set(GOLDENS) == set(_CASES), (
        "case registry and goldens.json diverge — rerun "
        "python -m tests.golden_cases --update")


@pytest.mark.parametrize("name", sorted(_CASES))
def test_golden(name):
    got = _CASES[name]()
    want = GOLDENS[name]
    rtol = RTOL.get(name, DEFAULT_RTOL)
    if isinstance(want, dict):
        assert set(got) == set(want), (name, got, want)
        for key in want:
            assert got[key] == pytest.approx(want[key], rel=rtol,
                                             abs=1e-12), (name, key)
    else:
        assert float(got) == pytest.approx(want, rel=rtol, abs=1e-12), name
