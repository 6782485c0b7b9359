"""bench.py noise gate (VERDICT r11 #6): the concurrent headline is
gated on the artifact's own calibration probes — a drain that ran on a
loaded host re-runs once and/or stamps the JSON ``contaminated`` so the
driver record is self-describing. The decision function is pure; the
synthetic-load cases here are the r11 artifacts themselves."""

from __future__ import annotations

import json


def _bench():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


IDLE_SPIN, IDLE_PAR32 = 0.11, 0.176


def test_gate_passes_clean_runs():
    b = _bench()
    # the r11 idle re-run's actual probes: pre at the pin, post in the
    # documented warm-JVM band — must NOT trip (no rerun churn)
    assert not b.drain_contaminated(
        {"spin_s": 0.110, "par32_s": 0.177},
        {"spin_s": 0.130, "par32_s": 0.300},
        IDLE_SPIN, IDLE_PAR32)


def test_gate_trips_on_synthetic_load():
    b = _bench()
    # the r11 DRIVER run's actual probes (the 64.9s contaminated
    # headline): pre par32 1.41x, post par32 2.58x the pin — trips on
    # the post probe
    assert b.drain_contaminated(
        {"spin_s": 0.112, "par32_s": 0.249},
        {"spin_s": 0.140, "par32_s": 0.455},
        IDLE_SPIN, IDLE_PAR32)
    # a run that STARTS loaded (pre probe 2x) trips immediately
    assert b.drain_contaminated(
        {"spin_s": 0.25, "par32_s": 0.40},
        {"spin_s": 0.12, "par32_s": 0.30},
        IDLE_SPIN, IDLE_PAR32)
    # CPU steal visible on the pure-python spin alone also trips
    assert b.drain_contaminated(
        {"spin_s": 0.40, "par32_s": 0.18},
        {"spin_s": 0.12, "par32_s": 0.30},
        IDLE_SPIN, IDLE_PAR32)


def test_load_idle_pins_host_keyed_and_legacy(tmp_path):
    b = _bench()
    p = tmp_path / "pins.json"
    # missing file -> fallback
    assert b.load_idle_pins(str(p), "h1") == (0.11, 0.26)
    p.write_text(json.dumps({"h1": {"spin_s": 0.1, "par32_s": 0.2},
                             "h2": {"spin_s": 0.3, "par32_s": 0.4}}))
    assert b.load_idle_pins(str(p), "h1") == (0.1, 0.2)
    assert b.load_idle_pins(str(p), "h2") == (0.3, 0.4)
    # unknown host -> fallback; legacy flat form -> adopted
    assert b.load_idle_pins(str(p), "h3") == (0.11, 0.26)
    p.write_text(json.dumps({"spin_s": 0.15, "par32_s": 0.25}))
    assert b.load_idle_pins(str(p), "any") == (0.15, 0.25)


def test_fold_pin_obs_needs_corroboration():
    """The pin is the SECOND-smallest pre-probe ever seen: one lucky
    burst-clocked sample (observed: a par32 probe 27% below five
    rounds of idle history, which then made the 2.5x post gate trip on
    every clean run) must not tighten the gate until a second
    independent sample corroborates it; a contended sample must never
    loosen it."""
    b = _bench()
    # legacy corroborated pin 0.14: one lucky 0.10 does NOT move it
    obs, pin = b.fold_pin_obs([0.14, 0.14], 0.1016)
    assert pin == 0.14 and obs == [0.1016, 0.14]
    # a second corroborating sample tightens to the 2nd-smallest
    obs, pin = b.fold_pin_obs(obs, 0.11)
    assert pin == 0.11 and obs == [0.1016, 0.11]
    # a contended sample never loosens
    obs2, pin2 = b.fold_pin_obs(obs, 0.50)
    assert pin2 == 0.11 and obs2 == obs
    # first-ever observation IS the pin (nothing better to gate on)
    obs, pin = b.fold_pin_obs([], 0.2)
    assert pin == 0.2 and obs == [0.2]
    # second observation larger: pin moves to it (2nd-smallest)
    obs, pin = b.fold_pin_obs(obs, 0.3)
    assert pin == 0.3 and obs == [0.2, 0.3]


def test_keep_faster_drain_prefers_speed_over_clean_probes():
    """Probe-clean-but-slower must not replace a faster attempt: ambient
    steal only inflates, and sparse probes can miss a mid-drain burst
    (observed: a 0.5 s query at 24 s inside a probe-clean drain)."""
    from bench import keep_faster_drain

    # second drain slower but probe-clean: keep the first, keep its
    # contaminated stamp (the number may still be inflated — honest)
    use2, cont = keep_faster_drain(43.9, True, 67.7, False)
    assert use2 is False and cont is True
    # second drain faster: keep it with its own verdict
    use2, cont = keep_faster_drain(67.7, True, 43.9, False)
    assert use2 is True and cont is False
    use2, cont = keep_faster_drain(50.0, True, 45.0, True)
    assert use2 is True and cont is True
