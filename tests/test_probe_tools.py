"""Lightweight pins for the scale-probe harness plumbing (no Spark).

The r10 hub probe's guarded measurements run in subprocesses with a
hard kill after an in-session cancelJobGroup watchdog proved unreliable
(BASELINE.md round-10 hub probe note).  These tests pin the subprocess
contract itself — timeout → "timeout", nonzero exit → "error: ...",
clean JSON → parsed — using a stub interpreter target, so a refactor of
the harness cannot silently turn a timeout into a hang or a crash into
a bogus number.
"""

from __future__ import annotations

import importlib.util
import os
import sys


def _load_probe():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "scale_probe_r10_hub",
        os.path.join(repo, "tools", "scale_probe_r10_hub.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_timed_subprocess_contract(monkeypatch, tmp_path):
    probe = _load_probe()

    # clean JSON on stdout parses (last line wins — Spark noise above it)
    fake = tmp_path / "fake_single.py"
    fake.write_text(
        "import sys\n"
        "print('noise line')\n"
        'print(\'{"sec": 1.25, "rows": 42}\')\n'
    )
    real_run = probe.subprocess.run

    def run_fake(argv, **kw):
        return real_run([sys.executable, str(fake)], **kw)

    monkeypatch.setattr(probe.subprocess, "run", run_fake)
    assert probe.timed_subprocess("adamic_adar_groupcap_only", "d") == (1.25, 42)

    # nonzero exit → "error: <stderr tail>", rows -1
    fake.write_text("import sys; print('boom', file=sys.stderr); sys.exit(3)\n")
    sec, rows = probe.timed_subprocess("adamic_adar_groupcap_only", "d")
    assert rows == -1 and isinstance(sec, str) and sec.startswith("error:")
    assert "boom" in sec

    # exceeding TIMEOUT_S → ("timeout", -1), process reaped
    fake.write_text("import time; time.sleep(60)\n")
    monkeypatch.setattr(probe, "TIMEOUT_S", 2)
    assert probe.timed_subprocess("adamic_adar_groupcap_only", "d") == (
        "timeout",
        -1,
    )


def test_uncapped_probe_registry_names_resolve():
    """The subprocess mode dispatches by name — both guarded probes must
    resolve to callables over the PRIVATE pre-r10 bodies (group cap
    only), not the registered node-capped forms."""
    probe = _load_probe()
    fns = probe._uncapped_probes()
    assert set(fns) == {"adamic_adar_groupcap_only", "recs_groupcap_only"}
    for fn in fns.values():
        assert callable(fn)
