"""tools/quietbench.py — the host-state-aware evidence harness
(r10). Pure-logic pins only: the acceptance gates and CLI wiring are
what future rounds depend on; the Spark paths reuse bench.py pieces
already covered by the bench contract tests."""
import importlib.util
import json
import os
import subprocess
import sys

import pytest

_TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "quietbench.py")


def _load():
    spec = importlib.util.spec_from_file_location("quietbench", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_acceptance_gates():
    qb = _load()
    # exonerate: accepted iff the in-band window verdict is true
    assert qb._accepted("exonerate", {"window_valid": True}, None)
    assert not qb._accepted("exonerate", {"window_valid": False}, None)
    # ricemicro: decode AND both peff readings must clear the bench
    # gates (HOST_GATE_DECODE_MBPS / HOST_GATE_PEFF)
    from bench import HOST_GATE_DECODE_MBPS, HOST_GATE_PEFF

    good = {"decode_mb_per_s_per_task": HOST_GATE_DECODE_MBPS + 1,
            "peff_pre": HOST_GATE_PEFF + 0.01,
            "peff_post": HOST_GATE_PEFF + 0.01}
    assert qb._accepted("ricemicro", good, None)
    for k, v in (("decode_mb_per_s_per_task", HOST_GATE_DECODE_MBPS - 1),
                 ("peff_pre", HOST_GATE_PEFF - 0.01),
                 ("peff_post", HOST_GATE_PEFF - 0.01)):
        bad = dict(good)
        bad[k] = v
        assert not qb._accepted("ricemicro", bad, None), k
    assert not qb._accepted(
        "ricemicro", {"decode_mb_per_s_per_task": None,
                      "peff_pre": 1.0, "peff_post": 1.0}, None)


def test_probe_cli_emits_json():
    out = subprocess.run(
        [sys.executable, _TOOL, "probe"], capture_output=True,
        text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    d = json.loads(out.stdout)
    assert 0.0 < d["peff"] <= 1.5


def test_exonerate_rejects_unanchored_queries():
    out = subprocess.run(
        [sys.executable, _TOOL, "exonerate",
         "--targets", "not_a_query", "--controls", "q01_pricing_summary"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode != 0
    assert "not_a_query" in (out.stderr + out.stdout)


@pytest.mark.parametrize("drift,residue,valid,exon", [
    (1.10, 1.25, True, True),    # clean window, inside the bar
    (1.10, 1.35, True, False),   # clean window, residue too big
    (1.30, 1.05, False, False),  # throttled window never exonerates
])
def test_exonerate_verdict_matrix(drift, residue, valid, exon):
    # replicate the verdict arithmetic the tool applies
    window_valid = drift <= 1.15
    exonerated = window_valid and residue <= 1.3
    assert window_valid == valid
    assert exonerated == exon
