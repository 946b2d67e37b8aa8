"""Multi-process (jax.distributed) end-to-end test.

Runs scripts/multiprocess_smoke.py — 2 coordinated processes x 4 virtual
CPU devices each: cross-process collectives, sharded-map insert/query over
the global 8-device mesh, and the FULL ShardedSlamPipeline processing
frames with both ranks agreeing on the pose bit-for-bit, plus a
per-rank sharded checkpoint snapshot restored into a fresh pipeline on
the same global mesh (resume == uninterrupted; VERDICT r3 #8). This is the
multi-host simulation of BASELINE.md's config-5 deployment (the reference
is strictly single-process; SURVEY.md §2.9).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multiprocess_smoke():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "multiprocess_smoke.py")],
        capture_output=True, timeout=720, text=True,
        env={**os.environ, "JAX_PLATFORMS": "", "XLA_FLAGS": ""})
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "PASS" in out.stdout, out.stdout[-3000:]
    assert out.stdout.count("MULTIPROCESS_OK") == 2, out.stdout[-3000:]
