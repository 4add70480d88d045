"""Synthetic dry run of the day-one fire drill (tools/fire_drill.py).

The drill is the one-command path for the moment licensed MP3D/R2R data
shows up: contract -> capacity -> (convert) -> eval -> VER dump -> agent
smoke.  This test proves the wiring end-to-end on synthetic data so the
real-data day needs zero thought.  Each stage is a subprocess (the tools
own their platform setup), so this is the slowest test in the suite by
design — it IS the product path.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fire_drill_synthetic(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "fire_drill.py"),
         "configs/verformer/vocc_tiny.py", "--synthetic",
         "--limit", "2", "--vln-steps", "8",
         "--work-dir", str(tmp_path / "drill")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-4000:]
    assert "all stages green" in out, out[-4000:]
    for stage in ("contract", "capacity", "convert", "eval", "dump",
                  "images", "mesh_dump", "vln"):
        assert f"{stage}: PASS" in out, (stage, out[-4000:])
    # the dump stages left real artifacts
    assert (tmp_path / "drill" / "ver.hdf5").exists()
    assert (tmp_path / "drill" / "ver_from_images.hdf5").exists()
    assert (tmp_path / "drill" / "ver_mesh.hdf5").exists()
