"""Fixed-seed golden regression: the full GR1T1 step pipeline (physics, DR,
rewards, observations) must reproduce stored values bit-for-bit-ish on CPU.

Catches unintended numerics changes across refactors (SURVEY.md §4:
"reward/obs-layout regression tests with fixed seeds"). After an *intended*
change, regenerate with `python tools/make_golden.py` and review the diff.
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden" / "gr1t1_step.npz"


@pytest.mark.skipif(not GOLDEN.exists(), reason="golden fixture not generated")
def test_gr1t1_step_matches_golden():
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import make_golden

    got = make_golden.build()
    want = np.load(GOLDEN)
    for key in ("obs", "pri_obs", "rew", "q", "base_pos"):
        np.testing.assert_allclose(
            got[key], want[key], rtol=1e-4, atol=1e-5,
            err_msg=f"golden mismatch in {key!r} — if the change is intended, "
            "regenerate with tools/make_golden.py",
        )
