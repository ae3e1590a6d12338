"""Every package submodule must import cleanly when it is the FIRST
module imported (fresh interpreter) — the latent-circular-import class
that bit twice (r14: workload_text -> _STOP_SQL; r15: workload_pipeline's
shingle constants and workload_graph's dedup constants, both hit when
workload_dedup or a streaming module was imported before the registry
root).

Each candidate runs in a subprocess so sys.modules starts empty; the
whole sweep is one interpreter per module (~1s each), covering exactly
the import orders a library consumer can produce.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
PKG = "robi_biometric_qdrant_vector_db_service_spark"

MODULES = sorted(
    ".".join(p.relative_to(REPO).with_suffix("").parts)
    for p in (REPO / PKG).rglob("*.py")
    if p.name != "__init__.py"
)


@pytest.mark.parametrize("module", MODULES)
def test_module_imports_first(module):
    proc = subprocess.run(
        [sys.executable, "-c", f"import {module}"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, f"import {module} failed:\n{proc.stderr[-2000:]}"
