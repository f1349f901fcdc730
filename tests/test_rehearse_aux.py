"""CI gate for the aux-asset rehearsal (VERDICT round-4 item 4).

`scripts/rehearse_aux_assets.py --small` drives the two weight-drop
surfaces the geometry rehearsal does not: the LPIPS importer on the real
`lpips.LPIPS(net="vgg")` key inventory (safetensors + pt + torchvision
alias format), and `scripts/export_empty_prompt.py`'s literal
`from_pretrained` path against mock HF directory layouts (the part
tests/test_empty_prompt.py's monkeypatching skips). The FULL-geometry
pass (CLIP-L + T5-XXL configs) is logged in benchmarks/results.md.
"""
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_small_aux_asset_rehearsal(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "rehearse_aux_assets.py"),
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
    assert "ALL AUX-ASSET REHEARSALS PASSED" in out.stdout
    assert "identical distances" in out.stdout
    assert "empty-prompt npz: shapes/branch/cache all OK" in out.stdout
