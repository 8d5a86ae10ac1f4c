"""N-set drift gate (tools/benchdrift.py, VERDICT r07 #5): the
documented thresholds must be executable and noise-tolerant — a
sub-second 1.5× swing is host noise and must NOT fail (the r7 lesson:
a gate that flips on noise trains rounds to ignore it), while a real
family regression or a naive-bar breach must exit non-zero."""

from __future__ import annotations

import json

import pytest

from tools import benchdrift


def _write(tmp_path, name, queries, wrap=None):
    p = tmp_path / name
    if wrap == "parsed":
        p.write_text(json.dumps({"n": 1, "parsed": {"queries": queries}}))
    elif wrap == "tail":
        p.write_text(
            json.dumps(
                {
                    "n": 1,
                    "tail": "noise\r[Stage 1:>]\r"
                    + json.dumps({"metric": "x", "queries": queries}),
                }
            )
        )
    else:
        p.write_text(json.dumps({"queries": queries}))
    return p


BASE = {
    "q_dedup_minhash": 75.0,
    "q_sim_hamming": 0.6,
    "q_text_tfidf": 0.5,
    "q_dedup_near": 1.5,
}


def test_green_when_stable(tmp_path, capsys):
    old = _write(tmp_path, "old.json", BASE)
    new = _write(tmp_path, "new.json", dict(BASE))
    assert benchdrift.main([str(old), str(new)]) == 0


@pytest.mark.parametrize("wrap", ["parsed", "tail"])
def test_loads_driver_wrappers(tmp_path, wrap):
    old = _write(tmp_path, "old.json", BASE, wrap=wrap)
    new = _write(tmp_path, "new.json", dict(BASE))
    assert benchdrift.main([str(old), str(new)]) == 0


def test_subsecond_ratio_swing_is_tolerated(tmp_path):
    """1.5x on a 0.6 s query moves 0.3 s — inside host noise (r7
    recorded spread 0.645 on this very query); the absolute floor
    must absorb it."""
    new = dict(BASE, q_sim_hamming=0.95)
    old = _write(tmp_path, "old.json", BASE)
    newp = _write(tmp_path, "new.json", new)
    assert benchdrift.main([str(old), str(newp)]) == 0


def test_real_drift_fails(tmp_path, capsys):
    new = dict(BASE, q_dedup_minhash=140.0)
    old = _write(tmp_path, "old.json", BASE)
    newp = _write(tmp_path, "new.json", new)
    assert benchdrift.main([str(old), str(newp)]) == 2
    assert "q_dedup_minhash" in capsys.readouterr().err


def test_naive_bar_breach_fails_even_without_drift(tmp_path, capsys):
    """tfidf at 2.0 s is 2.5x the measured naive warm bar — fails the
    absolute check regardless of the prior round."""
    new = dict(BASE, q_text_tfidf=2.0)
    old = _write(tmp_path, "old.json", dict(BASE, q_text_tfidf=1.9))
    newp = _write(tmp_path, "new.json", new)
    assert benchdrift.main([str(old), str(newp)]) == 2
    assert "naive" in capsys.readouterr().err


def test_missing_nset_query_fails(tmp_path):
    new = {k: v for k, v in BASE.items() if k != "q_dedup_near"}
    old = _write(tmp_path, "old.json", BASE)
    newp = _write(tmp_path, "new.json", new)
    assert benchdrift.main([str(old), str(newp)]) == 2


def test_tail_with_trailing_output_is_tolerated(tmp_path):
    """ADVICE r08: log text AFTER the bench JSON line in the captured
    tail (Spark progress bars, trailing notes) must not error the gate."""
    p = tmp_path / "new.json"
    p.write_text(
        json.dumps(
            {
                "n": 1,
                "tail": "noise\r"
                + json.dumps({"metric": "x", "queries": BASE})
                + "\n[Stage 9:>] trailing log line",
            }
        )
    )
    old = _write(tmp_path, "old.json", BASE)
    assert benchdrift.main([str(old), str(p)]) == 0


def test_naive_bar_parsed_from_baseline_md():
    """Single source of truth (VERDICT r08 #3): the naive-warm bar
    comes from BASELINE.md's §N-set table, N1 excluded by its note."""
    bar = benchdrift.naive_warm_s()
    assert set(bar) == {"q_sim_hamming", "q_text_tfidf", "q_dedup_near"}
    # the r11-re-measured values (same-host re-measure, BASELINE.md
    # §N-set rationale); a nbaseline.py re-run edits BASELINE.md and
    # this gate follows automatically (the test below pins that)
    assert bar["q_text_tfidf"] == 0.750
    assert bar["q_dedup_near"] == 2.366


def _write_sset(tmp_path, name, sset):
    p = tmp_path / name
    p.write_text(json.dumps({"queries": dict(BASE), "sset": sset}))
    return p


SSET = {"landing_rows_s": 9000.0, "fanout_rows_s": 12000.0, "rows": 100000}


def test_sset_stable_green_and_pre_sset_old_is_vacuous(tmp_path):
    old_plain = _write(tmp_path, "old.json", BASE)  # r8-era: no sset
    new = _write_sset(tmp_path, "new.json", SSET)
    assert benchdrift.main([str(old_plain), str(new)]) == 0
    old = _write_sset(tmp_path, "old2.json", SSET)
    assert benchdrift.main([str(old), str(new)]) == 0


def test_sset_throughput_drop_fails(tmp_path, capsys):
    old = _write_sset(tmp_path, "old.json", SSET)
    new = _write_sset(
        tmp_path, "new.json", dict(SSET, fanout_rows_s=5000.0)
    )
    assert benchdrift.main([str(old), str(new)]) == 2
    assert "fanout_rows_s" in capsys.readouterr().err


def test_sset_error_fails(tmp_path, capsys):
    old = _write_sset(tmp_path, "old.json", SSET)
    new = _write_sset(tmp_path, "new.json", {"error": "Boom: broke"})
    assert benchdrift.main([str(old), str(new)]) == 2
    assert "Boom" in capsys.readouterr().err


def test_doctored_baseline_number_moves_the_verdict():
    """Editing the BASELINE.md table cell must move the enforced bar —
    no second copy of the numbers survives in code."""
    text = benchdrift.BASELINE_MD.read_text()
    doctored = text.replace("| 750 ms |", "| 100 ms |")
    assert doctored != text
    assert benchdrift.naive_warm_s(doctored)["q_text_tfidf"] == 0.1
