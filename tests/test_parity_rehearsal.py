"""Pytest wrapper for the one-command parity dress rehearsal (VERDICT
round-2 #5): fabricated TF ckpt -> convert -> synthetic mini-REFER build ->
builders -d unc -> evaluate -> CRF -> report, as ONE flow."""

import sys

import pytest

tf = pytest.importorskip("tensorflow")


@pytest.mark.slow
def test_full_runbook_rehearsal(tmp_path):
    import os
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    import parity_rehearsal

    results = parity_rehearsal.run(str(tmp_path))
    assert "overall IoU" in results
    assert 0.0 <= results["overall IoU"] <= 1.0
