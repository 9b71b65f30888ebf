"""predict_ntokens helper: latent -> length regression over real-format
metadata logs."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_predict_ntokens(tmp_path):
    rng = np.random.default_rng(0)
    n = 60
    ids = [f"id{i}" for i in range(n)]
    n_tokens = rng.integers(3, 16, size=n)
    # content latent dim 3; dim 0 encodes length exactly -> R^2 ~ 1
    content = rng.normal(size=(n, 3))
    content[:, 0] = n_tokens.astype(float)
    polarity = rng.normal(size=(n, 1))

    meta = tmp_path / "metadata"
    (meta / "z").mkdir(parents=True)
    (meta / "ordered_ids").mkdir()
    np.savetxt(meta / "z" / "dev_content_4.log", content, fmt="%.4f",
               delimiter=",")
    np.savetxt(meta / "z" / "dev_polarity_4.log", polarity, fmt="%.4f",
               delimiter=",")
    with open(meta / "ordered_ids" / "dev_4.log", "w") as f:
        f.write("\n".join(ids) + "\n")
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "dev.jsonl", "w") as f:
        for i in range(n):
            f.write(json.dumps({"id": ids[i], "sentence": "x",
                                "n_tokens": int(n_tokens[i])}) + "\n")

    r = subprocess.run(
        [sys.executable, os.path.join(REPO,
                                      "scripts/helpers/predict_ntokens.py"),
         str(meta), str(data_dir), "--dataset", "dev"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr
    # content combo should show near-perfect R^2; per-dim output present
    assert "content" in r.stdout and "R^2" in r.stdout
    content_line = [l for l in r.stdout.splitlines()
                    if l.strip().startswith("content ")][0]
    assert float(content_line.split("=")[-1]) > 0.99
    assert "dim 0" in r.stdout
