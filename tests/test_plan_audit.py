"""Blanket plan guard: scripts/plan_audit.py must report ZERO violations
over every registered query — no cartesian/nested-loop join outside the
documented scalar-broadcast set, and no single-partition exchange outside
the documented value-domain-bounded frames."""

from __future__ import annotations

import importlib
import sys


def test_plan_audit_has_no_violations(spark, tmp_path, monkeypatch):
    sys.path.insert(0, "scripts")
    audit = importlib.import_module("plan_audit")
    out = str(tmp_path / "PLAN_AUDIT.md")
    monkeypatch.setattr(
        sys, "argv", ["plan_audit", "--sf", "/root/testdata/sf0.001", "--out", out]
    )
    assert audit.main() == 0
    text = open(out).read()
    assert "None — no cartesian products" in text, text[text.index("## Violations"):]
