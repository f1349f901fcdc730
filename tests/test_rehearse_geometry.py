"""CI gate for the checkpoint-conversion rehearsal harness.

`scripts/rehearse_real_geometry.py --small` runs every load/convert/save
surface (sharded safetensors -> flax, torch round-trip, LoRA peft
export/reload, RGB->RGBA widening, quant-conv variant, record_goldens)
on reduced widths; the FULL 11.9 B geometry run passed 2026-08-19
(PARITY.md "Real-geometry rehearsal"). Keeping the small mode green
keeps weight-drop day a one-command event.
"""
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_small_geometry_rehearsal(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "rehearse_real_geometry.py"),
            "--small",
            "--workdir",
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "ALL REHEARSALS PASSED" in out.stdout
    assert "record_goldens.py (vae) ran clean" in out.stdout
